"""Shared model building blocks."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

NEG_INF = -1e9  # additive mask value (finite: avoids NaNs in fully-masked rows)


class MLP(nn.Module):
    """Linear -> ReLU -> Linear stack, as used throughout the reference for
    projection heads (e.g. mdl_sf_base.py:161-167,767-769)."""

    features: Sequence[int]
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Fairseq-style sinusoidal embedding table (sin half | cos half)."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(max_len, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((max_len, 1))], axis=1)
    return table.astype(np.float32)


def make_causal_mask(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) additive causal mask."""
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[None, None, :, :]


def make_padding_mask(
    pad_mask: Optional[jnp.ndarray], dtype=jnp.float32
) -> Optional[jnp.ndarray]:
    """(B, S) {1 keep, 0 pad} -> (B, 1, 1, S) additive mask."""
    if pad_mask is None:
        return None
    return jnp.where(pad_mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(dtype)
