"""Segmented decode: the KV cache starts small and doubles between
while_loop segments (gen/beam.beam_search seg_bounds +
generate.make_srl_generator seg_min), so a generous gen.max_len_b
budget costs like the generated length. Must be token-exact vs the
single-loop decode for every beam size, model family, and reorder mode
(fairseq reference semantics: seq_gen.py:430-464 batch shrinking is
the dynamic-shape analog of this).
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _decode(cfg, comm, model, variables, dev_batch, seg_min, ancestry):
    from vidsitu_tpu.data import build_comm  # noqa: F401 (env warm)
    from vidsitu_tpu.models.selector import build_srl_generate_fn

    cfg.tpu.seg_decode_min = seg_min
    cfg.tpu.ancestry_beam = ancestry
    return np.asarray(
        build_srl_generate_fn(cfg, comm, model)(variables, dev_batch)
    )


@pytest.mark.parametrize("mdl_name,beam,ancestry", [
    ("sfpret_txe_txd_vbarg", 1, True),   # greedy, cross-attention
    ("sfpret_txe_txd_vbarg", 3, True),   # ancestry reorder across segments
    ("sfpret_txe_txd_vbarg", 3, False),  # full-cache gather across segments
    ("tx_only", 4, True),                # decoder-only
    ("new_gpt2_only", 3, True),          # GPT-2 flavor (gelu, learned pos)
])
def test_segmented_equals_single_loop(mdl_name, beam, ancestry):
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm

    cfg, model, variables, batch = _setup(bs=2, mdl_name=mdl_name)
    cfg.gen.beam_size = beam
    # 3 segments at seg_min=8: bounds 8, 16, 32 within n_steps=31
    cfg.gen.max_len_b = 30
    comm = build_comm(cfg)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    single = _decode(cfg, comm, model, variables, dev_batch, 0, ancestry)
    seg = _decode(cfg, comm, model, variables, dev_batch, 8, ancestry)
    np.testing.assert_array_equal(seg, single)


def test_segmented_beam_search_fuzz():
    """beam_search-level fuzz: segmented == single-loop exactly (tokens,
    scores, lengths) across random history-dependent models, beam sizes,
    budgets, and segment schedules — targets segment-boundary state
    handoff (cache grow, t carry, quota early-exit mid-segment)."""
    import jax

    from tests.test_beam_fairseq_parity import (
        BOS, EOS, PAD, V, make_hash_model,
    )
    from vidsitu_tpu.gen.beam import GenConfig, beam_search

    def run(tbl, mults, bsz, beam, max_len, gen_cfg, seg):
        tbl_j = jnp.asarray(tbl)
        mults_j = jnp.asarray(mults[: max_len + 2], jnp.int32)
        rows = bsz * beam
        L0 = (seg[0] + 2) if seg else (max_len + 2)
        cache = {"hist": jnp.zeros((rows, L0), jnp.int32)}

        def step_fn(last_tok, t, cache):
            hist = cache["hist"]
            hist = jax.lax.dynamic_update_slice(
                hist, last_tok.astype(jnp.int32), (0, t)
            )
            m = mults_j[: hist.shape[1]]
            hashed = (hist * m[None, :]).sum(axis=1) % tbl_j.shape[0]
            return tbl_j[hashed], {"hist": hist}

        def grow(cache, new_len):
            h = cache["hist"]
            # +1 headroom like the production grow (cache len bound+1)
            pad = jnp.zeros((h.shape[0], new_len + 1 - h.shape[1]),
                            h.dtype)
            return {"hist": jnp.concatenate([h, pad], axis=1)}

        out = jax.jit(
            lambda c: beam_search(
                step_fn, c, batch_size=bsz, max_len=max_len,
                bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
                gen_cfg=gen_cfg,
                seg_bounds=seg if seg else None,
                grow_cache_fn=grow if seg else None,
            )
        )(cache)
        return [np.asarray(x) for x in out]

    rng = np.random.default_rng(11)
    for trial in range(8):
        bsz = int(rng.integers(1, 4))
        beam = int(rng.integers(1, 5))
        max_len = int(rng.integers(6, 16))
        eos_boost = float(rng.choice([0.0, 2.0]))
        tbl, mults, _ = make_hash_model(1000 + trial, eos_boost=eos_boost)
        gen_cfg = GenConfig(beam_size=beam, max_len_b=max_len)
        # a random ascending segment schedule inside (0, n_steps-1)
        n_steps = max_len + 1
        cand = sorted(rng.choice(
            np.arange(2, max(n_steps - 1, 3)),
            size=min(2, n_steps - 3) or 1, replace=False,
        ).tolist())
        single = run(tbl, mults, bsz, beam, max_len, gen_cfg, ())
        seg = run(tbl, mults, bsz, beam, max_len, gen_cfg, tuple(cand))
        for a, b in zip(single, seg):
            np.testing.assert_array_equal(
                a, b, err_msg=f"trial={trial} bounds={cand}"
            )


def test_seg_min_larger_than_budget_is_single_loop():
    """seg_min >= n_steps degenerates to the unsegmented decode (same
    compiled shape), so the training-geometry fast path is unchanged."""
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm

    cfg, model, variables, batch = _setup(bs=2)
    cfg.gen.beam_size = 2
    cfg.gen.max_len_b = 20
    comm = build_comm(cfg)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    single = _decode(cfg, comm, model, variables, dev_batch, 0, True)
    default = _decode(cfg, comm, model, variables, dev_batch, 64, True)
    np.testing.assert_array_equal(default, single)
