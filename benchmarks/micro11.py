"""int8 feasibility: do XLA int8 convs beat bf16 on the hot shapes?"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

B = 120
rng = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=10):
    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            x0 = xs[0]
            if x0.dtype == jnp.int8:
                x0 = (x0 + carry.astype(jnp.int8)).astype(jnp.int8)
            else:
                x0 = x0 + carry
            out = fn(x0, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            return (out.astype(jnp.float32).mean() * 1e-9).astype(jnp.bfloat16)

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


def conv(x, w, strides=(1, 1, 1), pads=None, pet=None):
    kt, kh, kw = w.shape[:3]
    if pads is None:
        pads = ((kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pet)


cases = [
    # (name, x shape, w shape, strides)
    ("fast stem packed (8,9,9)s444", (B, 32, 224, 224, 3),
     (8, 9, 9, 3, 128), (4, 4, 4)),
    ("slow s2 b-conv (1,3,3) C64", (960, 1, 56, 56, 64),
     (1, 3, 3, 64, 64), (1, 1, 1)),
    ("slow s2 c-conv 1x1 64->256", (960, 1, 56, 56, 64),
     (1, 1, 1, 64, 256), (1, 1, 1)),
    ("s4 a-conv (3,1,1) 1024->256", (B, 8, 14, 14, 1024),
     (3, 1, 1, 1024, 256), (1, 1, 1)),
]
for name, xs, ws, st in cases:
    xb = jax.random.normal(rng, xs, jnp.bfloat16)
    wb = jax.random.normal(rng, ws, jnp.bfloat16) * 0.02
    ms_b = timeit(lambda v, w=wb, st=st: conv(v, w, st), xb)
    xi = jax.random.randint(rng, xs, -127, 127, jnp.int8)
    wi = jax.random.randint(rng, ws, -127, 127, jnp.int8)
    try:
        ms_i = timeit(
            lambda v, w=wi, st=st: conv(v, w, st, pet=jnp.int32), xi)
        print(f"{name:34s} bf16 {ms_b:7.2f} ms   int8 {ms_i:7.2f} ms")
    except Exception as e:
        print(f"{name:34s} bf16 {ms_b:7.2f} ms   int8 FAIL {str(e)[:80]}")
