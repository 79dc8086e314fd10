"""LSTM sequence encoder (reference: utils/lang_utils.py:9-150).

Kept for capability parity — the reference ships a fairseq-style packed-
sequence LSTM encoder that no selected model uses (SURVEY.md §2.1 #18).
Implemented with ``nn.RNN``-wrapped ``OptimizedLSTMCell``s and
PACKED-SEQUENCE-EQUIVALENT handling of variable lengths:

  * the backward direction reverses each row WITHIN its valid length
    (pads stay at the tail of the scan order), so backward states at
    valid positions never consume pad embeddings — the property
    ``pack_padded_sequence`` gives the reference;
  * multi-layer bidirectional feeds the CONCAT of both directions of
    layer l-1 into layer l, like torch ``nn.LSTM(bidirectional=True)``;
  * ``final`` concatenates the forward state at the last valid step
    with the backward state at position 0 (each having consumed the
    whole valid sequence), matching torch's ``h_n`` semantics;
  * LEFT-padded inputs (the fairseq convention the reference defaults
    to, lang_utils.py:22,63-68) are converted to right-padding by
    shifting each row left by its leading-pad count — a no-op on
    already-right-padded rows, like fairseq's
    ``convert_padding_direction``;
  * ``dropout_in``/``dropout_out`` match the reference's 0.1 defaults
    (lang_utils.py:19-20,80,104): on the embeddings, between stacked
    layers, and on the unpacked outputs — active only when
    ``deterministic=False`` and a ``dropout`` RNG is provided.
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
    dropout_in: float = 0.1
    dropout_out: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """tokens (B, T) -> {'outputs': (B, T, D), 'final': (B, D)}."""
        b, t = tokens.shape
        if lengths is None:
            lengths = (tokens != self.pad_id).sum(axis=1)

        # left- -> right-padding: shift each row left by its leading-pad
        # count (0 for right-padded rows, so both conventions are
        # accepted — fairseq's convert_padding_direction semantics)
        ar0 = jnp.arange(t)[None, :]
        nonpad = tokens != self.pad_id
        lead = jnp.where(nonpad.any(axis=1), jnp.argmax(nonpad, axis=1), 0)
        src = ar0 + lead[:, None]
        tokens = jnp.where(
            src < t,
            jnp.take_along_axis(tokens, jnp.clip(src, 0, t - 1), axis=1),
            self.pad_id,
        )

        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name="embed")(tokens)
        x = nn.Dropout(self.dropout_in)(x, deterministic=deterministic)
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)

        # per-row reversal WITHIN the valid length (an involution on the
        # valid region; pads keep their positions and therefore come
        # after the valid tokens in the backward scan order)
        ar = jnp.arange(t)[None, :]
        rev_idx = jnp.where(
            ar < lengths[:, None],
            jnp.clip(lengths[:, None] - 1 - ar, 0, t - 1),
            ar,
        )

        def rev(z):
            return jnp.take_along_axis(z, rev_idx[:, :, None], axis=1)

        h = x
        for li in range(self.num_layers):
            f = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_dim, name=f"fwd_l{li}"),
                name=f"fwd_rnn{li}",
            )(h)
            if self.bidirectional:
                bk = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_dim,
                                         name=f"bwd_l{li}"),
                    name=f"bwd_rnn{li}",
                )(rev(h))
                h = jnp.concatenate([f, rev(bk)], axis=-1)
            else:
                h = f
            if li < self.num_layers - 1:
                # torch nn.LSTM inter-layer dropout (lang_utils.py:52)
                h = nn.Dropout(self.dropout_out)(
                    h, deterministic=deterministic
                )

        # dropout on the unpacked outputs (lang_utils.py:104); `final`
        # comes from the PRE-dropout states — the reference's h_n is
        # returned undropped
        h_final = h * mask[..., None]
        outputs = nn.Dropout(self.dropout_out)(
            h, deterministic=deterministic
        ) * mask[..., None]
        idx = jnp.clip(lengths - 1, 0, t - 1)
        last_valid = jnp.take_along_axis(
            h_final, idx[:, None, None], axis=1
        )[:, 0]
        if self.bidirectional:
            # forward summary at the last valid step; backward summary at
            # position 0 (it has consumed the whole valid sequence there)
            final = jnp.concatenate(
                [last_valid[:, : self.hidden_dim],
                 h_final[:, 0, self.hidden_dim:]],
                axis=-1,
            )
        else:
            final = last_valid
        return {"outputs": outputs, "final": final}
