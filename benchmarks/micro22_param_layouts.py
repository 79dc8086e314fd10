"""Isolate the vars-as-args vs closure 10ms delta (micro20 V4 vs V2):
per-call (entry relayout/cast of params — amortizable) or per-iteration
(fusion regression)? Then test pinning params to the executable's
preferred input formats via device_put.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from vidsitu_tpu.models.video_backbone import (
    SlowFastBackbone, VideoCfg, trimmed_head,
)

rng = jax.random.PRNGKey(0)
B = 120
slow = jax.random.normal(rng, (B, 8, 224, 224, 3), jnp.bfloat16)
fast = jax.random.normal(rng, (B, 32, 224, 224, 3), jnp.bfloat16)
cfg = VideoCfg(dtype=jnp.bfloat16, param_dtype=jnp.float32)
bb = SlowFastBackbone(cfg)
vbb = jax.jit(bb.init)(jax.random.PRNGKey(1), slow, fast)


@partial(jax.jit, static_argnums=3)
def run_args(v, x, y, n):
    def body(_, carry):
        ys, yf = bb.apply(v, x + carry, y + carry, train=False)
        p = trimmed_head([ys, yf])
        return (p.mean() * 1e-9).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))


def measure(fn, *args, iters=10):
    float(fn(*args, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


ms10 = measure(run_args, vbb, slow, fast, iters=10)
print(f"args iters=10 : {ms10:7.2f} ms/iter")
ms40 = measure(run_args, vbb, slow, fast, iters=40)
print(f"args iters=40 : {ms40:7.2f} ms/iter")
percall = (ms10 - ms40) * 10 * 40 / 30
print(f"-> per-call overhead ~{percall:.1f} ms, steady-state {ms40:.1f}")

# pin params to the executable's preferred input formats, if exposed
try:
    compiled = run_args.lower(vbb, slow, fast, 10).compile()
    fmts = compiled.input_formats[0] if hasattr(
        compiled, "input_formats") else compiled.input_layouts[0]
    vpin = jax.device_put(vbb, fmts[0])
    ms_pin = measure(run_args, vpin, slow, fast, iters=10)
    print(f"pinned iters=10: {ms_pin:7.2f} ms/iter")
except Exception as e:
    print("layout pinning unavailable:", type(e).__name__, e)
