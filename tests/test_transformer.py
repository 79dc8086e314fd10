"""Transformer core tests: shapes, causality, incremental-vs-full parity.

All applies are jitted: this host pays ~1s of XLA compile per *eager* op,
so un-jitted flax applies are prohibitively slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.models.transformer import (
    TransformerDecoder,
    TransformerEncoder,
    TxConfig,
)

CFG = TxConfig(
    vocab_size=50, d_model=32, ffn_dim=64, n_layers=2, n_heads=4,
    dropout=0.0, max_len=24, pad_id=0,
)


@pytest.fixture(scope="module")
def dec_fns():
    """Decoder + jitted full/cache/step closures (compiled once)."""
    dec = TransformerDecoder(CFG, has_cross=True)
    toks = jnp.ones((2, 8), jnp.int32)
    enc = jnp.ones((2, 5, CFG.d_model), jnp.float32)
    variables = jax.jit(dec.init)(jax.random.PRNGKey(0), toks, enc)

    full = jax.jit(lambda t, e: dec.apply(variables, t, e))
    build = jax.jit(
        lambda e: dec.apply(
            variables, e.shape[0], CFG.max_len, e,
            method=TransformerDecoder.build_cache,
        )
    )
    step = jax.jit(
        lambda t, p, c: dec.apply(
            variables, t, p, c, method=TransformerDecoder.decode_step
        )
    )
    return dec, variables, full, build, step


def test_encoder_shapes_and_padding_invariance():
    enc = TransformerEncoder(CFG)
    toks = jnp.array([[5, 6, 7, 0, 0], [8, 9, 0, 0, 0]], jnp.int32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(1), toks)
    apply = jax.jit(
        lambda t, m: enc.apply(variables, t, pad_mask=m)
    )
    pad_mask = (toks != 0).astype(jnp.int32)
    out = apply(toks, pad_mask)
    assert out.shape == (2, 5, CFG.d_model)
    # changing a padded position's token must not affect non-pad outputs
    toks2 = toks.at[0, 4].set(3)
    out2 = apply(toks2, pad_mask)
    np.testing.assert_allclose(out[0, :3], out2[0, :3], atol=1e-5)


def test_decoder_causality(dec_fns):
    _, _, full, _, _ = dec_fns
    toks = jnp.array([[4, 5, 6, 7, 8, 9, 10, 11]], jnp.int32)
    enc = jnp.zeros((1, 5, CFG.d_model), jnp.float32)
    logits = full(toks, enc)
    toks2 = toks.at[0, 5].set(20)
    logits2 = full(toks2, enc)
    np.testing.assert_allclose(logits[0, :5], logits2[0, :5], atol=1e-5)
    assert not np.allclose(logits[0, 5:], logits2[0, 5:])


def test_incremental_matches_full(dec_fns):
    _, _, full, build, step = dec_fns
    B, T = 2, 8
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, 49, size=(B, T)), jnp.int32)
    enc = jnp.asarray(rng.standard_normal((B, 5, CFG.d_model)), jnp.float32)

    ref = full(toks, enc)
    cache = build(enc)
    outs = []
    for t in range(T):
        lg, cache = step(toks[:, t : t + 1], jnp.asarray(t, jnp.int32), cache)
        outs.append(lg[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(inc), atol=1e-4)


def test_incremental_no_cross():
    cfg = CFG
    dec = TransformerDecoder(cfg, has_cross=False)
    toks = jnp.ones((2, 6), jnp.int32)
    variables = jax.jit(dec.init)(jax.random.PRNGKey(3), toks)
    full = jax.jit(lambda t: dec.apply(variables, t))(toks)
    cache = jax.jit(
        lambda: dec.apply(
            variables, 2, cfg.max_len, None, method=TransformerDecoder.build_cache
        )
    )()
    step = jax.jit(
        lambda t, p, c: dec.apply(
            variables, t, p, c, method=TransformerDecoder.decode_step
        )
    )
    outs = []
    for t in range(6):
        lg, cache = step(toks[:, t : t + 1], jnp.asarray(t, jnp.int32), cache)
        outs.append(lg[:, 0])
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.stack(outs, 1)), atol=1e-4
    )


def test_cache_reorder_is_gather(dec_fns):
    """Beam reordering = take() on the cache pytree leading axis."""
    _, _, _, build, step = dec_fns
    B = 2
    enc = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, 5, CFG.d_model)), jnp.float32
    )
    cache = build(enc)
    toks = jnp.array([[7], [9]], jnp.int32)
    lg, cache = step(toks, jnp.asarray(0, jnp.int32), cache)
    order = jnp.array([1, 0])
    cache_r = jax.tree.map(lambda x: jnp.take(x, order, axis=0), cache)
    lg2, _ = step(toks[order], jnp.asarray(1, jnp.int32), cache_r)
    lg3, _ = step(toks, jnp.asarray(1, jnp.int32), cache)
    np.testing.assert_allclose(
        np.asarray(lg2), np.asarray(lg3[order]), atol=1e-5
    )


def test_decode_step_finite(dec_fns):
    _, _, _, build, step = dec_fns
    B = 2
    enc = jnp.zeros((B, 5, CFG.d_model), jnp.float32)
    cache = build(enc)
    tok = jnp.ones((B, 1), jnp.int32)
    lg, cache = step(tok, jnp.asarray(0, jnp.int32), cache)
    lg2, _ = step(tok, jnp.asarray(1, jnp.int32), cache)
    assert lg.shape == (B, 1, CFG.vocab_size)
    assert np.isfinite(np.asarray(lg)).all()
    assert np.isfinite(np.asarray(lg2)).all()
