"""Ancestry-mode beam decode: slot-major KV cache + one-hot ancestor
selection inside attention (transformer.attend_ancestry +
gen/beam.ancestry_reorder) must reproduce the default gather-based
decode exactly at the token level.

The default path physically reorders the whole KV cache every step
(fairseq reorder_incremental_state semantics, seq_gen.py:902-913);
ancestry mode only permutes a (B, K, L) int32 table, removing the
measured 96% of beam-5 decode cost (BENCH.md round 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.gen.beam import ancestry_reorder
from vidsitu_tpu.models.transformer import MultiHeadAttention


def test_attend_ancestry_matches_gathered_attend():
    """attend_ancestry over a slot-major cache == attend over the cache
    with ancestor rows physically gathered."""
    b, k, t_len, heads, dh = 3, 4, 7, 2, 8
    d_model = heads * dh
    rng = np.random.default_rng(0)
    mha = MultiHeadAttention(d_model, heads)
    q_in = jnp.asarray(rng.normal(size=(b * k, 1, d_model)), jnp.float32)
    ck = jnp.asarray(
        rng.normal(size=(b * k, t_len, heads, dh)), jnp.float32
    )
    cv = jnp.asarray(
        rng.normal(size=(b * k, t_len, heads, dh)), jnp.float32
    )
    variables = mha.init(jax.random.PRNGKey(0), q_in, q_in)
    anc = jnp.asarray(rng.integers(0, k, size=(b, k, t_len)), jnp.int32)
    cur = 5  # attend over positions <= cur
    mask = jnp.where(jnp.arange(t_len)[None, None, None, :] <= cur,
                     0.0, -1e9)

    got = mha.apply(
        variables, q_in, ck, cv, anc, mask, True,
        method=MultiHeadAttention.attend_ancestry,
    )

    # physically gather ancestor rows, then plain cached attention
    ck_b = np.asarray(ck).reshape(b, k, t_len, heads, dh)
    cv_b = np.asarray(cv).reshape(b, k, t_len, heads, dh)
    anc_np = np.asarray(anc)
    ck_al = np.empty_like(ck_b)
    cv_al = np.empty_like(cv_b)
    for bi in range(b):
        for ki in range(k):
            for ti in range(t_len):
                ck_al[bi, ki, ti] = ck_b[bi, anc_np[bi, ki, ti], ti]
                cv_al[bi, ki, ti] = cv_b[bi, anc_np[bi, ki, ti], ti]
    want = mha.apply(
        variables, q_in,
        jnp.asarray(ck_al.reshape(b * k, t_len, heads, dh)),
        jnp.asarray(cv_al.reshape(b * k, t_len, heads, dh)),
        mask, True,
        method=MultiHeadAttention.attend,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_ancestry_reorder_tracks_physical_gather():
    """Reading the slot-major cache through the ancestry table must
    reproduce a cache whose rows are PHYSICALLY gathered every step (the
    default `_gather_beams` semantics). Independent simulation: each
    step stamps a unique value per (batch, slot, position), the physical
    cache permutes whole rows, the slot-major cache never moves."""
    rng = np.random.default_rng(3)
    batch, beam, length, steps = 2, 4, 8, 6
    slot_major = np.zeros((batch, beam, length), np.int64)
    physical = np.zeros((batch, beam, length), np.int64)
    cache = {
        "anc": jnp.tile(
            jnp.arange(beam, dtype=jnp.int32)[None, :, None],
            (batch, 1, length),
        )
    }
    uid = 1
    for t in range(steps):
        # "decode step": slot j writes its row at position t (both paths)
        for b in range(batch):
            for j in range(beam):
                slot_major[b, j, t] = uid
                physical[b, j, t] = uid
                uid += 1
        perm = rng.integers(0, beam, size=(batch, beam))
        # physical path: gather whole rows (all positions) by parent
        physical = np.stack(
            [physical[b][perm[b]] for b in range(batch)], axis=0
        )
        cache = ancestry_reorder(
            cache, jnp.asarray(perm, jnp.int32), batch, beam,
            jnp.asarray(t),
        )
        anc = np.asarray(cache["anc"])
        got = np.take_along_axis(slot_major, anc.astype(np.int64), axis=1)
        # positions written so far must match the physically-gathered rows
        np.testing.assert_array_equal(
            got[:, :, : t + 1], physical[:, :, : t + 1], err_msg=f"t={t}"
        )


@pytest.mark.parametrize("mdl_name,beam", [
    ("sfpret_txe_txd_vbarg", 3),  # cross-attention decoder
    ("sfpret_txe_txd_vbarg", 5),
    ("tx_only", 4),               # decoder-only
])
def test_generate_ancestry_matches_gather(mdl_name, beam):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __graft_entry__ import _setup
    from vidsitu_tpu.data import build_comm
    from vidsitu_tpu.models.selector import build_srl_generate_fn

    cfg, model, variables, batch = _setup(bs=2, mdl_name=mdl_name)
    cfg.gen.beam_size = beam
    cfg.gen.max_len_b = 24
    comm = build_comm(cfg)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    cfg.tpu.ancestry_beam = False
    toks_gather = np.asarray(
        build_srl_generate_fn(cfg, comm, model)(variables, dev_batch)
    )
    cfg.tpu.ancestry_beam = True
    toks_anc = np.asarray(
        build_srl_generate_fn(cfg, comm, model)(variables, dev_batch)
    )
    np.testing.assert_array_equal(toks_anc, toks_gather)
