"""Batch-nonmonotonicity mechanism probe (VERDICT r3 #2).

Hypothesis (from the round-4 vbtrain OOM dumps): XLA lays some featext
tensors out BATCH-MINOR, and the batch dim then pads to the 128-lane
tile — so clip counts just past a multiple of 128 waste up to ~2x on
those buffers (140 clips -> 256 lanes = 83% waste), matching the
measured cliff (120 -> 790, 140 -> 587, 160 -> 547, 200 -> 694 clips/s).

Compile-only (AOT, no chip time): for each clip count, compile the
weight-frozen featext forward and report
  - HLO temp bytes (memory_analysis)
  - the number and total size of batch-minor ({0,...}-layout) copies
"""
import sys; sys.path.insert(0, "/root/repo")
import re

import jax
import jax.numpy as jnp

from vidsitu_tpu.models.vb_models import build_feat_extractor
from vidsitu_tpu.utils.config import get_cfg_with_overrides


def main():
    cfg = get_cfg_with_overrides(
        "bench",
        **{"mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
           "train.dtype": "bfloat16"},
    )
    model = build_feat_extractor(cfg)
    rng = jax.random.PRNGKey(0)

    clip_counts = [int(a) for a in sys.argv[1:]] or [120, 140, 160, 200]
    for clips in clip_counts:
        clips = (clips // 5) * 5  # the event fold needs clips % 5 == 0
        fast = jax.random.normal(rng, (clips, 32, 224, 224, 3), jnp.bfloat16)
        slow = jax.random.normal(rng, (clips, 8, 224, 224, 3), jnp.bfloat16)
        batch = {"frms_ev_fast_tensor": fast, "frms_ev_slow_tensor": slow}
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(1), batch)
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables
        )

        def fwd(b):
            return model.apply(variables, b)["feats"]

        compiled = jax.jit(fwd).lower(batch).compile()
        mem = compiled.memory_analysis()
        txt = compiled.as_text()
        # batch-minor buffers: layout whose MINOR dim is dim 0 of a 5-D
        # tensor whose dim0 == batch (clips)
        pat = re.compile(
            r"bf16\[(\d+)[^\]]*\]\{0,(?:\d+,)*\d+:T\(\d+,128\)[^}]*\}"
        )
        hits = [m for m in pat.finditer(txt) if int(m.group(1)) == clips]
        lanes = -(-clips // 128) * 128
        print(
            f"clips={clips:4d}  temps={mem.temp_size_in_bytes / 1e9:6.2f} GB  "
            f"batch-minor bufs={len(hits)}  lane pad {clips}->{lanes} "
            f"({lanes / clips:.2f}x)"
        )
        if "--dump" in sys.argv:
            for m in {m.group(0) for m in hits}:
                print(f"    {m}")


if __name__ == "__main__":
    main()
