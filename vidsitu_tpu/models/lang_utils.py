"""LSTM sequence encoder (reference: utils/lang_utils.py:9-150).

Kept for capability parity — the reference ships a fairseq-style packed-
sequence LSTM encoder that no selected model uses (SURVEY.md §2.1 #18).
Implemented with an ``nn.scan``-wrapped ``OptimizedLSTMCell`` and length
masking (the XLA analog of packed sequences).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class LSTMEncoder(nn.Module):
    vocab_size: int
    embed_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 1
    bidirectional: bool = False
    pad_id: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        """tokens (B, T) -> {'outputs': (B, T, D), 'final': (B, D)}."""
        b, t = tokens.shape
        if lengths is None:
            lengths = (tokens != self.pad_id).sum(axis=1)
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name="embed")(tokens)
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)

        def run_direction(x_dir, name):
            h = x_dir
            for li in range(self.num_layers):
                cell = nn.OptimizedLSTMCell(self.hidden_dim,
                                            name=f"{name}_l{li}")
                scan = nn.RNN(cell, name=f"{name}_rnn{li}")
                h = scan(h)
            return h

        out_f = run_direction(x, "fwd")
        outputs = out_f
        if self.bidirectional:
            out_b = run_direction(x[:, ::-1], "bwd")[:, ::-1]
            outputs = jnp.concatenate([out_f, out_b], axis=-1)
        outputs = outputs * mask[..., None]
        # final state: last valid timestep per row
        idx = jnp.clip(lengths - 1, 0, t - 1)
        final = jnp.take_along_axis(
            outputs, idx[:, None, None].repeat(outputs.shape[-1], -1), axis=1
        )[:, 0]
        return {"outputs": outputs, "final": final}
