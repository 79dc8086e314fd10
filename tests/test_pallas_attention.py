"""Pallas fused attention: interpret-mode parity with the einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.ops.attention import (
    _einsum_attention,
    fused_attention,
)


@pytest.mark.parametrize("kind", ["softmax", "dot_product"])
def test_fused_matches_einsum(kind):
    rng = np.random.default_rng(0)
    b, sq, sk, d = 2, 640, 640, 128
    q = jnp.asarray(rng.standard_normal((b, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    scale = d**-0.5
    ref = _einsum_attention(q, k, v, kind, scale)
    out = fused_attention(
        q, k, v, kind=kind, scale=scale, q_block=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_query_padding():
    """sq not a multiple of the block: padded then cropped."""
    rng = np.random.default_rng(1)
    b, sq, sk, d = 1, 200, 256, 128
    q = jnp.asarray(rng.standard_normal((b, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    ref = _einsum_attention(q, k, v, "softmax", d**-0.5)
    out = fused_attention(q, k, v, kind="softmax", q_block=128, interpret=True)
    assert out.shape == (b, sq, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_softmax_key_padding_falls_back():
    """sk not a multiple of 128 under softmax: must stay exact (fallback)."""
    rng = np.random.default_rng(2)
    b, sq, sk, d = 1, 128, 200, 128
    q = jnp.asarray(rng.standard_normal((b, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, sk, d)), jnp.float32)
    ref = _einsum_attention(q, k, v, "softmax", d**-0.5)
    out = fused_attention(q, k, v, kind="softmax", q_block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_bf16_inputs():
    rng = np.random.default_rng(3)
    b, s, d = 1, 256, 128
    q = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    out = fused_attention(q, k, v, kind="softmax", q_block=128, interpret=True)
    ref = _einsum_attention(q, k, v, "softmax", d**-0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )
