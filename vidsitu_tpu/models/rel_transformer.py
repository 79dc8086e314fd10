"""Relative-position-bias transformer encoder (RelTransformer family).

Faithful JAX port of the reference's local transformer library
(/root/reference/utils/transformer_code.py:127-313, itself adapted from
grounded-video-description). Semantics preserved exactly:

  * post-LN residual blocks: ``LayerNorm(x + dropout(sublayer(x)))``
    (ResidualBlock, transformer_code.py:21-30);
  * attention scores scaled by sqrt(d_model) — the FULL model dim, not
    the per-head dim (Attention/RelAttention ctor receives d_key=d_model,
    transformer_code.py:33-37,127-132);
  * the relative-position bias ``pe`` (B, N, N, n_heads) is ADDED to the
    raw dot products BEFORE scaling: ``(qk + pe_h) / sqrt(d_model)``
    (RelAttention.forward, :141-150);
  * optional causal mask subtracts INF above the diagonal before the
    bias is added (:142-146);
  * heads are formed by chunking the model dim (== reshape to
    (B, N, H, dh) slices, :180-190);
  * the encoder multiplies by ``mask`` before the stack and after every
    layer, and returns ALL layer outputs (:246-253).

The reference's model selector never instantiates RelTransformer (it is
library surface); it is provided for completeness and usable as a
drop-in contextualizer over per-event features.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

INF = 1e10


class RelMultiHead(nn.Module):
    """Multi-head attention with an additive per-head relative bias."""

    d_model: int
    n_heads: int
    dropout: float = 0.1
    causal: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, pe=None, deterministic=True):
        d, h = self.d_model, self.n_heads
        dh = d // h
        dense = lambda name: nn.Dense(  # noqa: E731
            d, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        q = dense("wq")(query)
        k = dense("wk")(key)
        v = dense("wv")(value)
        b, n, _ = q.shape
        nk = k.shape[1]
        # chunk(n_heads, -1) == head-major reshape
        qh = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(b, nk, h, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(b, nk, h, dh).transpose(0, 2, 1, 3)
        dots = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        if self.causal:
            tri = jnp.triu(jnp.ones((n, nk), jnp.float32), k=1) * INF
            dots = dots - tri[None, None]
        if pe is not None:
            # pe: (B, N, N, H) per-head scalar bias, added pre-scale
            dots = dots + pe.transpose(0, 3, 1, 2).astype(jnp.float32)
        # reference scales by sqrt(d_model), not sqrt(d_head)
        attn = nn.softmax(dots / jnp.sqrt(jnp.float32(d)), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn.astype(self.dtype), vh
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return dense("wo")(out)


class _FeedForward(nn.Module):
    d_model: int
    d_hidden: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear1")(x)
        x = nn.relu(x)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="linear2")(x)


class RelEncoderLayer(nn.Module):
    """Post-LN residual: LayerNorm(x + dropout(sublayer(x)))."""

    d_model: int
    d_hidden: int
    n_heads: int
    dropout: float = 0.1
    causal: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pe=None, kv=None, deterministic=True):
        """``kv``: optional (key, value) pair for cross-attention mode
        (the reference's dict-input branch, transformer_code.py:208-214)."""
        key, value = (x, x) if kv is None else kv
        attn = RelMultiHead(
            self.d_model, self.n_heads, self.dropout, self.causal,
            dtype=self.dtype, param_dtype=self.param_dtype, name="selfattn",
        )(x, key, value, pe=pe, deterministic=deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln_attn")(
            x + attn
        )
        ff = _FeedForward(self.d_model, self.d_hidden, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="feedforward")(x)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="ln_ff")(
            x + ff
        )


class RelTransformer(nn.Module):
    """Stack of RelEncoderLayers; returns the last layer's output (or all
    of them with ``all_outputs=True``), with the reference's mask-multiply
    placement."""

    d_model: int
    d_hidden: int = 2048
    n_layers: int = 6
    n_heads: int = 8
    dropout: float = 0.1
    causal: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_pe: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        all_outputs: bool = False,
        deterministic: bool = True,
    ):
        if mask is not None:
            x = x * mask
        outs: List[jnp.ndarray] = []
        for i in range(self.n_layers):
            x = RelEncoderLayer(
                self.d_model, self.d_hidden, self.n_heads, self.dropout,
                self.causal, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}",
            )(x, pe=x_pe, deterministic=deterministic)
            if mask is not None:
                x = x * mask
            outs.append(x)
        return outs if all_outputs else outs[-1]
