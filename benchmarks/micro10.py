"""Packed-space pool: BN+relu+3x3s2-maxpool applied to the PACKED stem
conv output, then a 4x-smaller unpack — vs the current
unpack -> BN+relu -> pool.

Packed layout (gt,gh,gw)=(4,2,2): x_p (B, 8, 56, 56, 128), channel
((dt*2+dh)*2+dw)*8+c <-> unpacked (t=4t'+dt, r=2h'+dh, col=2w'+dw, c).
Pool out[i,j] = max over rows 2i-1..2i+1, cols 2j-1..2j+1 of relu(bn(x)).
Decompose per dt into: max of the own 2x2 block, the row above's dh=1
slabs shifted, the left block's dw=1 slabs shifted, and the diag.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = 120
rng = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=10):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(xs[0] + carry, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(*args, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


xp = jax.random.normal(rng, (B, 8, 56, 56, 128), jnp.bfloat16)
scale = jax.random.normal(rng, (8,), jnp.float32) * 0.1 + 1
shift = jax.random.normal(rng, (8,), jnp.float32) * 0.1
gt, gh, gw, F = 4, 2, 2, 8


def unpack(y, f=F):
    n, tp, hp, wp, _ = y.shape
    y = y.reshape(n, tp, hp, wp, gt, gh, gw, f)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, tp * gt, hp * gh, wp * gw, f)


def current(xp):
    x = unpack(xp)
    x = (x * jnp.tile(scale, 1).astype(x.dtype)
         + shift.astype(x.dtype))
    x = jnp.maximum(x, 0)
    from flax import linen as nn
    return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                       padding=((0, 0), (1, 1), (1, 1)))


def packed_pool(xp):
    x = (xp * jnp.tile(scale, gt * gh * gw).astype(xp.dtype)
         + jnp.tile(shift, gt * gh * gw).astype(xp.dtype))
    x = jnp.maximum(x, 0)
    n, tp, hp, wp, _ = x.shape
    # a[dt][dh][dw]: (n, tp, hp, wp, F)
    def slab(dt, dh, dw):
        c = ((dt * gh + dh) * gw + dw) * F
        return x[..., c:c + F]

    neg = jnp.zeros((), x.dtype) - jnp.inf

    def shift_h(a):  # value from block h'-1 (unpacked row 2i-1)
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)),
                       constant_values=neg)[:, :, :hp]

    def shift_w(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (1, 0), (0, 0)),
                       constant_values=neg)[:, :, :, :wp]

    outs = []
    for dt in range(gt):
        own = jnp.maximum(
            jnp.maximum(slab(dt, 0, 0), slab(dt, 0, 1)),
            jnp.maximum(slab(dt, 1, 0), slab(dt, 1, 1)),
        )
        up = shift_h(jnp.maximum(slab(dt, 1, 0), slab(dt, 1, 1)))
        left = shift_w(jnp.maximum(slab(dt, 0, 1), slab(dt, 1, 1)))
        diag = shift_h(shift_w(slab(dt, 1, 1)))
        outs.append(jnp.maximum(jnp.maximum(own, up),
                                jnp.maximum(left, diag)))
    y = jnp.stack(outs, axis=2)  # (n, tp, gt, hp, wp, F)
    n2, tp2, _, hp2, wp2, f2 = y.shape
    return y.reshape(n2, tp2 * gt, hp2, wp2, f2)


# correctness on small input
xs = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 8, 8, 128), jnp.bfloat16)
a = np.asarray(current(xs), np.float32)
b = np.asarray(packed_pool(xs), np.float32)
np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
print("correctness OK", a.shape, b.shape)

ms = timeit(current, xp)
print(f"current: unpack -> bn relu pool   {ms:7.2f} ms")
ms = timeit(packed_pool, xp)
print(f"packed-space pool + small unpack  {ms:7.2f} ms")
