"""Fast-stem pool probes (BENCH.md: fast pool 5.0 ms vs ~1.4 ms traffic
floor at 120 clips on (120,32,112,112,8) bf16).

  E0: relu (pure elementwise)         — achieved BW on a C=8 tensor
  P0: nn.max_pool (1,3,3) s(1,2,2)    — production
  P2: separable two-pass max_pool     — H pass then W pass
  P3: transpose to (B,T,H,C,W) (W minor), pool, transpose back
  P4: W-pairwise max via reshape (...,W/2,2,C) + slab max, then
      3-tap H pool, then boundary fix — NOT equal (W window is 3,
      not 2); kept only as a lower-bound traffic probe
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timeit(fn, x, iters=10):
    @partial(jax.jit, static_argnums=1)
    def run(a, n):
        def body(_, carry):
            out = fn(a + carry)
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(x, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


B, T, H, W, C = 120, 32, 112, 112, 8
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, H, W, C), jnp.bfloat16)
gb = x.size * 2 / 1e9


def e0(a):
    return jax.nn.relu(a)


def p0(a):
    return nn.max_pool(
        a, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
    )


def p2(a):
    h1 = nn.max_pool(a, (1, 3, 1), strides=(1, 2, 1),
                     padding=((0, 0), (1, 1), (0, 0)))
    return nn.max_pool(h1, (1, 1, 3), strides=(1, 1, 2),
                       padding=((0, 0), (0, 0), (1, 1)))


def p3(a):
    t = a.transpose(0, 1, 2, 4, 3)  # (B,T,H,C,W): W minor
    neg = jnp.asarray(-jnp.inf, a.dtype)
    out = jax.lax.reduce_window(
        t, neg, jax.lax.max,
        window_dimensions=(1, 1, 3, 1, 3),
        window_strides=(1, 1, 2, 1, 2),
        padding=((0, 0), (0, 0), (1, 1), (0, 0), (1, 1)),
    )
    return out.transpose(0, 1, 2, 4, 3)


# correctness
r0 = np.asarray(jax.jit(p0)(x))
for name, f in (("p2", p2), ("p3", p3)):
    r = np.asarray(jax.jit(f)(x))
    print(f"{name} == p0:", r.shape == r0.shape and np.array_equal(r0, r))

ms = timeit(e0, x)
print(f"E0 relu                 : {ms:7.2f} ms  ({2 * gb / ms * 1e3:5.0f} GB/s)")
print(f"P0 nn.max_pool          : {timeit(p0, x):7.2f} ms")
print(f"P2 separable two-pass   : {timeit(p2, x):7.2f} ms")
print(f"P3 W-minor transpose    : {timeit(p3, x):7.2f} ms")

xs = jax.random.normal(rng, (120, 8, 112, 112, 64), jnp.bfloat16)
print(f"P0 slow-stem (C=64)     : {timeit(p0, xs):7.2f} ms")
