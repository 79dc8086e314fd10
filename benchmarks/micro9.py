"""Slow-s4 block op-level timing: find the MXU-efficiency sink."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp


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


rng = jax.random.PRNGKey(0)
B = 120
PEAK = 197e12  # v5e bf16


def conv(x, w, strides=(1, 1, 1), pads=None):
    kt, kh, kw = w.shape[:3]
    if pads is None:
        pads = ((kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


# slow s4 block2 geometry: x (120, 8, 14, 14, 1024), inner 256
x = jax.random.normal(rng, (B, 8, 14, 14, 1024), jnp.bfloat16)
wa = jax.random.normal(rng, (3, 1, 1, 1024, 256), jnp.bfloat16) * 0.02
wb = jax.random.normal(rng, (1, 3, 3, 256, 256), jnp.bfloat16) * 0.02
wc = jax.random.normal(rng, (1, 1, 1, 256, 1024), jnp.bfloat16) * 0.02

h1 = jax.random.normal(rng, (B, 8, 14, 14, 256), jnp.bfloat16)

for name, f, arg, flops in [
    ("a (3,1,1) 1024->256", lambda v: conv(v, wa), x,
     2 * B * 8 * 196 * 256 * 3 * 1024),
    ("b (1,3,3) 256->256", lambda v: conv(v, wb), h1,
     2 * B * 8 * 196 * 256 * 9 * 256),
    ("c (1,1,1) 256->1024", lambda v: conv(v, wc), h1,
     2 * B * 8 * 196 * 1024 * 256),
    ("c as dot_general", lambda v: jax.lax.dot_general(
        v, wc[0, 0, 0], (((4,), (0,)), ((), ()))), h1,
     2 * B * 8 * 196 * 1024 * 256),
    ("a as dot (T-im2col by hand: 3 shifted dots)",
     lambda v: sum(
         jax.lax.dot_general(
             jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))[:, d:d + 8],
             wa[d, 0, 0], (((4,), (0,)), ((), ())))
         for d in range(3)), x,
     2 * B * 8 * 196 * 256 * 3 * 1024),
]:
    ms = timeit(f, arg)
    eff = flops / (ms / 1000) / PEAK * 100
    print(f"{name:44s} {ms:7.2f} ms  {eff:5.1f}% MXU")

# whole-batch flattened matmul reference at the same FLOPs as 'c'
m = jax.random.normal(rng, (B * 8 * 196, 256), jnp.bfloat16)
wcc = jax.random.normal(rng, (256, 1024), jnp.bfloat16) * 0.02
flops = 2 * m.shape[0] * 256 * 1024
ms = timeit(lambda v: jax.lax.dot_general(v, wcc, (((1,), (0,)), ((), ()))), m)
print(f"{'pure (188160,256)@(256,1024) matmul':44s} {ms:7.2f} ms  {flops/(ms/1000)/PEAK*100:5.1f}% MXU")
