"""RoBERTa encoder in flax (replaces HF ``RobertaModel`` /
``RobertaForSequenceClassification`` used by the evrel task,
reference: vidsitu_code/mdl_evrel.py:9,21-24,62-64).

Faithful architecture (embeddings with pad-offset learned positions +
LayerNorm, post-norm encoder stack, tanh pooler, classification head) so
converted ``roberta-base`` weights drop in; dims configurable for tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import EncoderLayer, TxConfig, _dropout


@dataclass(frozen=True)
class RobertaCfg:
    vocab_size: int
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    max_pos: int = 514
    pad_id: int = 1
    dropout: float = 0.1
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def tx_config(self) -> TxConfig:
        return TxConfig(
            ln_eps=self.ln_eps,
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            ffn_dim=self.ffn_dim,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            dropout=self.dropout,
            attn_dropout=self.dropout,
            act_dropout=0.0,
            max_len=self.max_pos,
            normalize_before=False,
            activation="gelu_exact",
            pad_id=self.pad_id,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )


def position_ids_from_tokens(input_ids: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """HF RoBERTa convention: positions count non-pad tokens, offset by
    pad_id + 1 (create_position_ids_from_input_ids)."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


class RobertaModel(nn.Module):
    cfg: RobertaCfg
    add_pooling_layer: bool = True

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(
            c.vocab_size, c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
            name="word_embeddings",
        )
        self.position_embeddings = nn.Embed(
            c.max_pos, c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
            name="position_embeddings",
        )
        self.token_type_embeddings = nn.Embed(
            1, c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
            name="token_type_embeddings",
        )
        self.emb_ln = nn.LayerNorm(
            epsilon=c.ln_eps, use_fast_variance=False,
            dtype=c.dtype, param_dtype=c.param_dtype,
            name="emb_ln",
        )
        tx = c.tx_config()
        self.layers = [
            EncoderLayer(tx, name=f"layers_{i}") for i in range(c.n_layers)
        ]
        if self.add_pooling_layer:
            self.pooler_dense = nn.Dense(
                c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
                name="pooler_dense",
            )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_id).astype(jnp.int32)
        pos_ids = position_ids_from_tokens(input_ids, c.pad_id)
        x = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(pos_ids)
            + self.token_type_embeddings(jnp.zeros_like(input_ids))
        )
        x = self.emb_ln(x)
        # HF RobertaEmbeddings applies dropout after the LayerNorm
        x = _dropout(x, self.cfg.dropout, deterministic,
                     lambda: self.make_rng("dropout"))
        from .common import make_padding_mask

        mask = make_padding_mask(attention_mask)
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        out = {"last_hidden_state": x}
        if self.add_pooling_layer:
            out["pooler_output"] = jnp.tanh(self.pooler_dense(x[:, 0]))
        return out


class RobertaClassificationHead(nn.Module):
    """dropout -> dense -> tanh -> dropout -> out_proj over the <s>
    token, matching HF's RobertaClassificationHead (both dropouts)."""

    d_model: int
    num_labels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, hidden, deterministic: bool = True):
        def drop(x):
            return _dropout(x, self.dropout, deterministic,
                            lambda: self.make_rng("dropout"))

        x = drop(hidden[:, 0])
        x = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(x)
        x = jnp.tanh(x)
        x = drop(x)
        return nn.Dense(self.num_labels, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out_proj")(x)
