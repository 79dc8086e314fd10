"""Microbench: layout/HBM behavior of fast-pathway (tiny-C) tensors.

Forces full materialization with optimization_barrier; the trailing mean
is fused with nothing (barrier) so each iter = 1 read + 1 write + 1 read.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            out = fn(*[x + carry if x.dtype == jnp.bfloat16 else x for x in xs])
            out = jax.lax.optimization_barrier(out)
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(*args, iters))  # compile
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args, iters))
    dt = (time.perf_counter() - t0) - rtt
    return dt / iters * 1000  # ms


rng = jax.random.PRNGKey(0)

B = 120
for shape, tag in [
    ((B, 32, 56, 56, 8), "fast-s2 C=8"),
    ((B, 32, 56, 448), "same bytes, flat last=448"),
    ((B, 32, 14, 14, 128), "packed s2d C=128 (1/16 area)"),
    ((B, 8, 56, 56, 80), "slow-s2 in C=80"),
    ((B, 8, 56, 56, 128), "slow-s2 C=128"),
    ((B, 8, 56, 56, 256), "slow-s2 out C=256"),
]:
    x = jax.random.normal(rng, shape, jnp.bfloat16)
    ms = timeit(lambda a: a * 1.0001 + 0.5, x)
    gb = x.size * 2 / 1e9
    # traffic: read + write + read(mean) = 3x bytes
    print(f"{tag:34s} {str(shape):26s} {ms:7.2f} ms  {3*gb/ms*1000:7.1f} GB/s eff")
