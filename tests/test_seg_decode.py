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
