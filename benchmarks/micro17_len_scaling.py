"""micro17: decode cost vs cache length (is decode cache-read-bound?).

If per-step attention reads the full max_len cache, total cost scales
~quadratically with the token budget; if bookkeeping dominates, it
scales ~linearly. This decides whether segmented cache growth
(read only a prefix-sized cache in early steps) is worth building.

Run on an idle host: python benchmarks/micro17_len_scaling.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def measure(max_len_b, beam, bs=8, iters=5):
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.models.selector import build_srl_generate_fn

    cfg, model, variables, batch = _setup(bs=bs)
    cfg.gen.beam_size = beam
    cfg.gen.max_len_b = max_len_b
    comm = build_comm(cfg)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trivial = jax.jit(lambda: jnp.zeros((1,), jnp.int32))()
    np.asarray(gen_fn(variables, dev_batch))
    np.asarray(trivial)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(trivial)
    rtt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(gen_fn(variables, dev_batch))
    dt = (time.perf_counter() - t0) / iters - rtt
    ms = dt / bs * 1000
    print(f"beam{beam} max_len={max_len_b:4d}  {ms:7.2f} ms/video  "
          f"({ms / max_len_b * 1000:6.1f} us/step/video)")
    return ms


if __name__ == "__main__":
    print("devices:", jax.devices())
    for beam in (1, 5):
        for L in (50, 100, 200):
            measure(L, beam)
