"""RelTransformer (relative-position-bias encoder) semantics tests.

Reference math (utils/transformer_code.py:127-313): post-LN residual
blocks, sqrt(d_model) scaling applied AFTER adding the per-head bias,
causal INF-mask before the bias, mask multiply around each layer,
all-layer outputs. Verified against a from-scratch numpy computation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vidsitu_tpu.models.rel_transformer import RelTransformer

D, H, HID, N, B = 16, 4, 32, 6, 2


def _np_layer(x, pe, p, causal=False):
    """numpy forward of one RelEncoderLayer given its flax params."""
    def dense(v, w):
        return v @ np.asarray(w["kernel"])

    sa = p["selfattn"]
    q, k, v = dense(x, sa["wq"]), dense(x, sa["wk"]), dense(x, sa["wv"])
    dh = D // H
    outs = []
    for h in range(H):
        qh = q[..., h * dh : (h + 1) * dh]
        kh = k[..., h * dh : (h + 1) * dh]
        vh = v[..., h * dh : (h + 1) * dh]
        dots = qh @ kh.transpose(0, 2, 1)
        if causal:
            tri = np.triu(np.ones((N, N)), k=1) * 1e10
            dots = dots - tri[None]
        if pe is not None:
            dots = dots + pe[..., h]
        a = dots / np.sqrt(D)  # full model dim, not per-head
        a = np.exp(a - a.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        outs.append(a @ vh)
    attn = dense(np.concatenate(outs, -1), sa["wo"])

    def ln(v, lp):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * np.asarray(
            lp["scale"]
        ) + np.asarray(lp["bias"])

    x = ln(x + attn, p["ln_attn"])
    ff = p["feedforward"]
    hmid = np.maximum(
        x @ np.asarray(ff["linear1"]["kernel"]) + np.asarray(
            ff["linear1"]["bias"]
        ),
        0,
    )
    f = hmid @ np.asarray(ff["linear2"]["kernel"]) + np.asarray(
        ff["linear2"]["bias"]
    )
    return ln(x + f, p["ln_ff"])


def _setup(causal=False, n_layers=1):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    pe = (rng.standard_normal((B, N, N, H)) * 0.5).astype(np.float32)
    m = RelTransformer(
        d_model=D, d_hidden=HID, n_layers=n_layers, n_heads=H,
        dropout=0.0, causal=causal,
    )
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(pe))
    return m, variables, x, pe


def test_matches_numpy_reference():
    m, variables, x, pe = _setup()
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(pe)))
    want = _np_layer(x, pe, variables["params"]["layer_0"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_causal_matches_numpy_and_blocks_future():
    m, variables, x, pe = _setup(causal=True)
    got = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(pe)))
    want = _np_layer(x, pe, variables["params"]["layer_0"], causal=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # changing a future position must not affect earlier outputs
    x2 = x.copy()
    x2[:, -1] += 5.0
    got2 = np.asarray(m.apply(variables, jnp.asarray(x2), jnp.asarray(pe)))
    np.testing.assert_allclose(got[:, :2], got2[:, :2], rtol=1e-4, atol=1e-4)


def test_pe_bias_changes_attention():
    m, variables, x, pe = _setup()
    y1 = np.asarray(m.apply(variables, jnp.asarray(x), jnp.asarray(pe)))
    y2 = np.asarray(m.apply(variables, jnp.asarray(x), None))
    assert not np.allclose(y1, y2)


def test_all_outputs_and_mask():
    m, variables, x, pe = _setup(n_layers=3)
    outs = m.apply(
        variables, jnp.asarray(x), jnp.asarray(pe), all_outputs=True
    )
    assert len(outs) == 3
    # masked rows stay exactly zero after every layer (reference
    # multiplies by the mask around each layer)
    mask = np.ones((B, N, 1), np.float32)
    mask[:, -2:] = 0.0
    y = np.asarray(
        m.apply(variables, jnp.asarray(x), jnp.asarray(pe),
                mask=jnp.asarray(mask))
    )
    np.testing.assert_array_equal(y[:, -2:], np.zeros_like(y[:, -2:]))
