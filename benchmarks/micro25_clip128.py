"""Clip-count sweep at the 128-lane boundary: is N=128 the true featext
operating point?

micro24 established the whole inference program is batch-minor, so the
clip dim pads to multiples of 128 lanes; the landed default N=120 pays
1.07x padding waste. The sweep in BENCH.md covered 120/125/140/160/200/
255 but never the one point with BOTH zero padding waste AND power-of-2
divisibility: N=128. The 5-event fold is host-side (a free view), and
the (B,5,D) regroup after the head is a free reshape, so nothing in the
production extractor requires multiples of 5 per device batch — a flat
clip stream re-grouped host-side is legitimate (extract.py).

Measures backbone + trimmed_head with closure-constant weights (the
bench.py/extract.py production configuration) at N in {120, 128}.
Usage: python benchmarks/micro25_clip128.py [N ...]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp

from vidsitu_tpu.models.video_backbone import (
    SlowFastBackbone, VideoCfg, trimmed_head,
)


def measure(n_clips: int, iters: int = 10) -> float:
    rng = jax.random.PRNGKey(0)
    slow = jax.random.normal(rng, (n_clips, 8, 224, 224, 3), jnp.bfloat16)
    fast = jax.random.normal(rng, (n_clips, 32, 224, 224, 3), jnp.bfloat16)
    cfg = VideoCfg(dtype=jnp.bfloat16, param_dtype=jnp.float32)
    bb = SlowFastBackbone(cfg)
    vbb = jax.jit(bb.init)(jax.random.PRNGKey(1), slow, fast)
    vbb = jax.tree.map(lambda x: x, vbb)  # device-resident closure consts

    @partial(jax.jit, static_argnums=2)
    def run(s, f, n):
        def body(_, carry):
            ys, yf = bb.apply(vbb, s + carry, f + carry, train=False)
            out = trimmed_head([ys, yf])
            return (out.mean() * 1e-9).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(run(slow, fast, iters))  # compile
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(slow, fast, iters))
    dt = (time.perf_counter() - t0) - rtt
    ms = dt / iters * 1000
    cps = n_clips * iters / dt
    print(f"N={n_clips:4d}: {ms:7.2f} ms/iter  {cps:7.2f} clips/s")
    return cps


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [120, 128]
    for n in ns:
        measure(n)
