"""micro14: in-model A/B verification of the pallas beam-cache gather.

The row-DMA kernel (benchmarks/probe_beam_gather.py — EVICTED from the
package in round 5) is bit-exact standalone, yet on the round-3 axon
stack ONE in-model compilation (the production generate fn, token-only
output) returned corrupted decode tokens while five
graph-near-identical programs were exact (BENCH.md round 3, "pallas beam
gather layout hazard"). Correctness therefore depends on whole-program
XLA buffer assignment around the Mosaic custom call — this gate
re-verifies per stack; only a PASS would justify deliberately
re-landing an in-package path.

Runs the REAL production generate fn (build_srl_generate_fn) and a
hand-inlined core replica, each with the package's one-hot-dot gather
(reference) and with the probe's pallas routing monkeypatched over
``vidsitu_tpu.gen.beam._gather_beams`` (the gate seam), and reports
pairwise token mismatches. ancestry_beam is forced OFF so the gen arm
rebuilds the historical hazard-sensitive program (ancestry mode never
calls the cache gather). PASS requires zero mismatches on every pair.

Usage: python benchmarks/micro14_beam_gather_ab.py  (real TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main(bs: int = 8, beam: int = 5):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.gen.beam import GenConfig, beam_search, tile_for_beams
    from vidsitu_tpu.models.selector import build_srl_generate_fn
    from vidsitu_tpu.models.srl_models import SRLModel

    cfg, model, variables, batch = _setup(bs=bs)
    cfg.gen.beam_size = beam
    # unsegmented decode: the hazard receipts were measured on the
    # single-loop program, and segmentation shrinks early-segment cache
    # lengths below the kernel's 128-multiple eligibility — keep the
    # gate's sensitivity identical across stacks
    cfg.tpu.seg_decode_min = 0
    # ancestry mode bypasses the cache gather entirely; the historical
    # corrupting compilation was the full-cache-gather production fn
    cfg.tpu.ancestry_beam = False
    comm = build_comm(cfg)
    tok = comm.gpt2_hf_tok
    gen_cfg = GenConfig.from_cfg(cfg.gen)
    inp = {k: jnp.asarray(v) for k, v in batch.items()}

    def core(variables, inp):
        toks = inp["seq_out_by_ev"][:, :, 0, :]
        b = toks.shape[0]
        rows = b * 5
        k = gen_cfg.beam_size
        prefix = toks.reshape(rows, -1)[:, :1].astype(jnp.int32)
        enc_out, enc_mask = model.apply(
            variables, inp, method=SRLModel.gen_encode
        )
        if enc_out is not None:
            enc_out = tile_for_beams(enc_out, k)
        enc_mask_t = (
            tile_for_beams(enc_mask, k) if enc_mask is not None else None
        )
        max_len = min(gen_cfg.max_len_b, 1023)
        cache = model.apply(
            variables, rows * k, max_len + 1, enc_out,
            method=SRLModel.gen_build_cache,
        )

        def step_fn(last_tok, pos, cache_):
            from vidsitu_tpu.models.common import make_padding_mask

            m = (
                make_padding_mask(enc_mask_t)
                if enc_mask_t is not None
                else None
            )
            return model.apply(
                variables, last_tok, pos, cache_, m,
                method=SRLModel.gen_decode_step,
            )

        seqs, scores, lens = beam_search(
            step_fn, cache, rows, max_len, tok.eos_token_id,
            tok.eos_token_id, tok.pad_token_id, len(tok), gen_cfg,
            prefix_tokens=prefix, unk_id=tok.unk_token_id,
        )
        return seqs[:, 0].reshape(b, 5, 1, seqs.shape[-1])

    import importlib.util

    import vidsitu_tpu.gen.beam as beam_mod

    spec = importlib.util.spec_from_file_location(
        "probe_beam_gather",
        Path(__file__).resolve().parent / "probe_beam_gather.py",
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    dot_gather = beam_mod._gather_beams

    res = {}
    try:
        for tag in ("dot", "pallas"):
            beam_mod._gather_beams = (
                dot_gather if tag == "dot"
                else lambda t, i, b, k: probe.pallas_gather_beams(
                    t, i, b, k, fallback=dot_gather
                )
            )
            res["gen_" + tag] = np.asarray(
                build_srl_generate_fn(cfg, comm, model)(variables, inp)
            )
            res["core_" + tag] = np.asarray(jax.jit(core)(variables, inp))
    finally:
        beam_mod._gather_beams = dot_gather

    keys = list(res)
    worst = 0
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            m = int((res[keys[i]] != res[keys[j]]).sum())
            worst = max(worst, m)
            print(f"{keys[i]} vs {keys[j]}: {m} token mismatches")
    print("PASS" if worst == 0 else
          "FAIL: kernel corrupts on this stack — keep default OFF")
    return worst


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
