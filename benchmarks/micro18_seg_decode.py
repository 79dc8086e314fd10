"""micro18: segmented-decode A/B on the real chip.

Same bench geometry as bench.py decode/decode5 (tiny graft model,
gen.max_len_b=200 budget); compares the landed segmented default
(seg_decode_min=64: cache 65 -> 129 -> 201 across while_loop segments)
against the single-loop decode (seg_decode_min=0). The quota early-exit
means a random-init model finishes well under 64 steps, so the
segmented run should cost close to a 64-budget decode.

Run on an idle host: python benchmarks/micro18_seg_decode.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


# the reference's production decoder dims — single source of truth in
# bench.py so `bench.py decode_real` and this A/B measure the same
# geometry
from bench import _REAL_TX as REAL_TX  # noqa: E402


def measure(tag, seg_min, beam, bs=8, iters=5, real_dims=False,
            dtype=None):
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.models.selector import (
        build_model,
        build_srl_generate_fn,
        init_model_variables,
    )

    cfg, model, variables, batch = _setup(
        bs=bs, extra=REAL_TX if real_dims else None
    )
    if dtype is not None:  # e.g. the production bfloat16 config
        cfg.train.dtype = dtype
        comm0 = build_comm(cfg)
        model = build_model(cfg, comm0)
        variables = init_model_variables(model, batch)
    cfg.gen.beam_size = beam
    cfg.tpu.seg_decode_min = seg_min
    comm = build_comm(cfg)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trivial = jax.jit(lambda: jnp.zeros((1,), jnp.int32))()
    out = np.asarray(gen_fn(variables, dev_batch))
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
    print(f"{tag:22s} beam{beam} {ms:7.2f} ms/video")
    return ms, out


if __name__ == "__main__":
    print("devices:", jax.devices())
    real = len(sys.argv) > 1 and sys.argv[1].startswith("real")
    dtype = "bfloat16" if (len(sys.argv) > 1 and
                           sys.argv[1] == "real_bf16") else None
    tag = "real-dims d=1024" if real else "bench-dims d=128"
    if dtype:
        tag += f" {dtype} (production config)"
    print(f"== {tag} ==")
    for beam in (1, 5):
        s_ms, s_out = measure("single-loop (seg=0)", 0, beam,
                              real_dims=real, dtype=dtype)
        g_ms, g_out = measure("segmented (seg=64)", 64, beam,
                              real_dims=real, dtype=dtype)
        exact = bool(np.array_equal(s_out, g_out))
        print(f"  -> {s_ms / g_ms:.2f}x, token-exact on-chip: {exact}")
