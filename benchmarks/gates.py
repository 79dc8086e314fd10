"""Per-round stack gates (VERDICT r3 #6): one command that re-measures the
stack-dependent go/no-go decisions that were previously manual lore in
BENCH.md, and prints explicit flip/no-flip lines.

Gates:
  1. pallas pipeline DMA floor vs XLA elementwise bandwidth (micro3
     essence). The fused bottleneck kernel (probe_fused_bottleneck.py)
     moves ~2.5x fewer HBM bytes than XLA's unfused chain but runs on
     the pallas DMA pipeline; it flips profitable when the floor
     crosses ~550 GB/s (~80% of XLA's). Decision output: FLIP -> the
     fused kernel (evicted from the package in round 5; now a
     gate-only probe, benchmarks/probe_fused_bottleneck.py) is worth
     re-measuring in-model before any re-land.
  2. pallas row-DMA beam gather correctness (micro14 full A/B). The
     kernel corrupted decode tokens under specific whole-program XLA
     buffer assignments on the round-3 axon stacks (BENCH.md "layout
     hazard"). Decision output: PASS -> the opt-in
     kernel (evicted from the package in round 5; now a gate-only
     probe, benchmarks/probe_beam_gather.py) could be deliberately
     re-landed; FAIL -> stays evicted.
  3. featext lane-padding layout check (micro24 essence, compile-only):
     the inference program is batch-minor on current stacks, so the
     clip count pads to 128-lane multiples; the default operating
     point sits just under the boundary. Decision output: FLIP ->
     the layout policy changed (or the default crossed a padding
     cliff); re-sweep the batch with --batch.
  4. (optional, --batch) featext batch optimum re-check around b=24.

Usage: python bench.py gates [--batch]   (real TPU)
"""

from __future__ import annotations

import time
from functools import partial


def _timeit(fn, *args, iters=10):
    """Per-iteration ms of a shape-preserving fn over a large tensor.

    The FULL tensor is the loop carry (out_k = fn(out_{k-1})), so every
    iteration must materialize its output — a scalar-mean carry would
    let XLA factor the reduction through linear ops and hoist the whole
    tensor traffic out of the loop (the BENCH.md harness lesson; an
    earlier scalar-carry version of this gate printed a physically
    impossible 16 TB/s for the XLA elementwise arm)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=len(args))
    def run(*a):
        n = a[-1]
        xs = a[:-1]

        def body(_, carry):
            return jax.lax.optimization_barrier(fn(carry, *xs[1:]))

        out = jax.lax.fori_loop(0, n, body, xs[0])
        return (out[0, 0] * 1e-9).astype(jnp.bfloat16)

    float(run(*args, iters))
    trivial = jax.jit(lambda: jnp.zeros((), jnp.bfloat16))
    float(trivial())
    t0 = time.perf_counter()
    float(trivial())
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args, iters))
    return ((time.perf_counter() - t0) - rtt) / iters * 1000


def gate_dma_floor(flip_gbps: float = 550.0) -> dict:
    """Pallas pipelined-copy bandwidth vs XLA elementwise bandwidth."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (6144, 65536), jnp.bfloat16)  # 768 MB
    gb = x.size * 2 / 1e9

    def copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    def pallas_copy(x):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0] // 512, x.shape[1] // 2048),
            in_specs=[pl.BlockSpec((512, 2048), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, 2048), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(x)

    # copy reads+writes: traffic = 2*gb per call
    ms_pallas = _timeit(pallas_copy, x)
    ms_xla = _timeit(lambda a: a * 1.0000001 + 1e-9, x)
    pallas_bw = 2 * gb / (ms_pallas / 1e3)
    xla_bw = 2 * gb / (ms_xla / 1e3)
    flip = pallas_bw >= flip_gbps
    print(f"[gate 1] pallas pipeline DMA: {pallas_bw:6.0f} GB/s | "
          f"XLA elementwise: {xla_bw:6.0f} GB/s | threshold {flip_gbps:.0f}")
    print("[gate 1] " + (
        "FLIP: DMA floor crossed — consider re-landing the fused "
        "bottleneck in-model (probe_fused_bottleneck.py) and A/B with "
        "bench.py featext" if flip else
        "no-flip: fused bottleneck stays evicted (gate-only probe)"))
    return {"pallas_gbps": round(pallas_bw, 1), "xla_gbps": round(xla_bw, 1),
            "flip": flip}


def gate_beam_gather() -> dict:
    """micro14 full six-program A/B; PASS == zero mismatches."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "micro14_beam_gather_ab",
        Path(__file__).resolve().parent / "micro14_beam_gather_ab.py",
    )
    m14 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m14)
    worst = m14.main()
    flip = worst == 0
    print("[gate 2] " + (
        "FLIP candidate: beam-gather A/B PASS on this stack — re-landing "
        "the probe kernel in-package may be reconsidered (ancestry decode "
        "has made it obsolete on the default path anyway)" if flip else
        f"no-flip: beam gather corrupts ({worst} token mismatches) — "
        "the kernel stays evicted (gate-only probe)"))
    return {"worst_mismatches": worst, "flip": flip}


def gate_batch_optimum() -> dict:
    """Quick featext clip-count re-check around the landed 128-clip
    operating point (flat clip stream, zero 128-lane padding waste)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    best, best_clips = None, None
    out = {}
    for clips in (120, 128, 140):
        p = subprocess.run(
            [sys.executable, "bench.py", "featext", str(clips)],
            cwd=repo, env=dict(os.environ), capture_output=True,
            text=True, timeout=1200,
        )
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        val = json.loads(lines[-1])["value"] if lines else 0.0
        out[clips] = val
        print(f"[gate 4] featext clips={clips}: {val:.1f} clips/s")
        if best is None or val > best:
            best, best_clips = val, clips
    print(f"[gate 4] optimum: {best_clips} clips ({best:.1f}); landed "
          "default is 128 — " + (
              "no-flip" if best_clips == 128 else "FLIP: retune bench.py"))
    return {"rates": out, "best_clips": best_clips}


def gate_lane_padding(clips: int = 120) -> dict:
    """Compile-only (micro24 essence, no chip time): the featext program
    is batch-minor almost everywhere on current stacks, so the batch
    pads to 128-lane multiples — the production operating point is a
    flat 128-clip stream at exactly zero waste (extract.py clip_batch;
    the 10x landing). The gate probes at N=120 on purpose: counting
    batch-minor buffers needs the batch dim to be distinguishable in
    the HLO text, and 128 collides with common channel counts; the
    layout-policy signal is identical. A stack that changes the policy
    (batch-minor buffers vanish, or the probe's padding waste grows)
    shows up here and should trigger a real batch re-sweep (--batch)."""
    import re

    import jax
    import jax.numpy as jnp

    from vidsitu_tpu.models.vb_models import build_feat_extractor
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    cfg = get_cfg_with_overrides(
        "gates", **{"mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
                    "train.dtype": "bfloat16"})
    model = build_feat_extractor(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "frms_ev_fast_tensor": jax.random.normal(
            rng, (clips, 32, 224, 224, 3), jnp.bfloat16),
        "frms_ev_slow_tensor": jax.random.normal(
            rng, (clips, 8, 224, 224, 3), jnp.bfloat16),
    }
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(1), batch)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    txt = jax.jit(
        lambda b: model.apply(variables, b)["feats"]
    ).lower(batch).compile().as_text()
    pat = re.compile(
        r"bf16\[(\d+)[^\]]*\]\{0,(?:\d+,)*\d+:T\(\d+,128\)[^}]*\}")
    n_minor = sum(1 for m in pat.finditer(txt) if int(m.group(1)) == clips)
    waste = (-(-clips // 128) * 128) / clips
    flip = n_minor == 0 or waste > 1.15
    print(f"[gate 3] lane padding at default {clips} clips: "
          f"{n_minor} batch-minor buffers, pad waste {waste:.2f}x — " + (
              "FLIP: layout policy changed or default past a cliff; "
              "re-sweep with `bench.py gates --batch`" if flip else
              "no-flip: default sits just under the 128-lane boundary"))
    return {"batch_minor_bufs": n_minor, "pad_waste": round(waste, 3),
            "flip": flip}


def main(batch: bool = False) -> dict:
    res = {
        "dma": gate_dma_floor(),
        "beam_gather": gate_beam_gather(),
        "lane_padding": gate_lane_padding(),
    }
    if batch:
        res["batch"] = gate_batch_optimum()
    return res


if __name__ == "__main__":
    import sys

    main(batch="--batch" in sys.argv)
