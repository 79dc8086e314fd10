"""Transformer encoder/decoder in flax.linen with an explicit KV cache.

TPU-native replacement for the reference's fairseq TransformerEncoder /
TransformerDecoder + incremental-state machinery (mdl_sf_base.py:246-464,
seq_gen.py:811-913). Design choices for XLA:

  * the incremental-decode cache is a plain pytree carried through
    ``lax.while_loop`` / ``lax.scan`` — beam reordering is a batched
    gather on the leading axis, replacing fairseq's
    ``reorder_incremental_state`` dict mutation;
  * static shapes everywhere: the cache is pre-allocated at ``max_len``
    and written with ``dynamic_update_slice``;
  * attention math runs in the configured compute dtype (bfloat16 by
    default) with float32 softmax accumulation on the MXU.

Geometry mirrors the reference preset (configs/vsitu_tx_cfgs/
transformer.yaml): 3 layers, d=1024, ffn=2048, 8 heads, post-norm,
sinusoidal positions, scaled embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (
    NEG_INF,
    Dtype,
    make_causal_mask,
    make_padding_mask,
    sinusoidal_positions,
)


@dataclass(frozen=True)
class TxConfig:
    vocab_size: int
    d_model: int = 1024
    ffn_dim: int = 2048
    n_layers: int = 3
    n_heads: int = 8
    dropout: float = 0.1
    attn_dropout: float = 0.0
    act_dropout: float = 0.0
    max_len: int = 1024
    normalize_before: bool = False
    scale_embed: bool = True
    learned_pos: bool = False
    share_in_out_embed: bool = False
    pad_id: int = 0
    activation: str = "relu"  # "relu" | "gelu" (gelu: GPT-2 flavor)
    final_ln: bool = False  # LayerNorm before the output projection
    ln_eps: float = 1e-5  # fairseq/GPT-2/RoBERTa all use 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, tx_cfg, vocab_size: int, pad_id: int, side: str = "decoder",
                 dtype=jnp.float32, param_dtype=jnp.float32) -> "TxConfig":
        p = side  # 'encoder' | 'decoder'
        return cls(
            vocab_size=vocab_size,
            d_model=tx_cfg[f"{p}_embed_dim"],
            ffn_dim=tx_cfg[f"{p}_ffn_embed_dim"],
            n_layers=tx_cfg[f"{p}_layers"],
            n_heads=tx_cfg[f"{p}_attention_heads"],
            dropout=tx_cfg["dropout"],
            attn_dropout=tx_cfg["attention_dropout"],
            act_dropout=tx_cfg["activation_dropout"],
            max_len=tx_cfg[
                "max_target_positions" if p == "decoder" else "max_source_positions"
            ],
            normalize_before=tx_cfg[f"{p}_normalize_before"],
            scale_embed=not tx_cfg["no_scale_embedding"],
            learned_pos=tx_cfg[f"{p}_learned_pos"],
            share_in_out_embed=tx_cfg.get("share_decoder_input_output_embed", False),
            pad_id=pad_id,
            dtype=dtype,
            param_dtype=param_dtype,
        )


class MultiHeadAttention(nn.Module):
    """Attention with optional pre-allocated KV cache.

    Full-sequence mode: ``__call__(q, kv, mask)``.
    Incremental mode:   ``__call__(q, kv, mask, cache=(k,v), cache_index=i)``
    where q/kv have T==1; returns updated cache.
    """

    d_model: int
    n_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    dropout: float = 0.0

    def setup(self):
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.n_heads, self.d_model // self.n_heads),
            axis=-1,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = nn.DenseGeneral(
            self.d_model,
            axis=(-2, -1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_proj",
        )

    def project_kv(self, kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute K/V (used to build cross-attention caches once)."""
        return self.k_proj(kv), self.v_proj(kv)

    def attend(
        self,
        q_in: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        q = self.q_proj(q_in)
        depth = q.shape[-1]
        q = q / jnp.sqrt(depth).astype(q.dtype)
        # (B, T, H, Dh) x (B, S, H, Dh) -> (B, H, T, S)
        logits = jnp.einsum("bthd,bshd->bhts", q, k)
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        probs = _dropout(probs, self.dropout, deterministic,
                         lambda: self.make_rng("dropout"))
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v)
        return self.out_proj(ctx)

    def attend_ancestry(
        self,
        q_in: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        anc: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        """Beam-slot attention over an UNPERMUTED KV cache.

        ``k``/``v`` are (B*K, T, H, Dh) slot-major: row (b, j) position t
        holds the K/V of whatever hypothesis occupied beam slot j when
        step t ran — beams are never physically reordered. ``anc``
        (B, K, T) names the slot holding hypothesis (b, k)'s token at
        position t (maintained by gen/beam.ancestry_reorder). Attention
        computes all-pairs slot scores and selects with an exact 0/1
        one-hot contraction, which equals gathering the cache rows first
        — but reads the cache once instead of fairseq's
        reorder-then-attend (seq_gen.py:902-913), which costs an extra
        full-cache read+write per step (measured 96% of beam-5 decode
        cost, BENCH.md round 3).
        """
        q = self.q_proj(q_in)
        depth = q.shape[-1]
        q = q / jnp.sqrt(depth).astype(q.dtype)
        bsz, beams, _ = anc.shape
        qh = q.reshape(bsz, beams, q.shape[-2], q.shape[-1])  # (B,K,H,Dh)
        kh = k.reshape((bsz, beams) + k.shape[1:])  # (B,J,T,H,Dh)
        vh = v.reshape((bsz, beams) + v.shape[1:])
        allp = jnp.einsum("bkhd,bjthd->bkhjt", qh, kh)
        # exact 0/1 selection; HIGHEST so the MXU does not truncate f32
        # scores to bf16 (same argument as gen/beam._gather_beams)
        sel = jax.nn.one_hot(anc, beams, dtype=allp.dtype)  # (B,K,T,J)
        logits = jnp.einsum(
            "bkhjt,bktj->bkht", allp, sel,
            precision=jax.lax.Precision.HIGHEST,
        )
        if mask is not None:
            logits = logits + mask.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        probs = _dropout(probs, self.dropout, deterministic,
                         lambda: self.make_rng("dropout"))
        w = jnp.einsum(
            "bkht,bktj->bkhjt", probs, sel,
            precision=jax.lax.Precision.HIGHEST,
        )
        ctx = jnp.einsum("bkhjt,bjthd->bkhd", w, vh)
        ctx = ctx.reshape(bsz * beams, 1, ctx.shape[-2], ctx.shape[-1])
        return self.out_proj(ctx)

    def __call__(
        self,
        q_in: jnp.ndarray,
        kv_in: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        anc: Optional[jnp.ndarray] = None,
    ):
        if cache is None:
            k, v = self.project_kv(kv_in)
            return self.attend(q_in, k, v, mask, deterministic), None
        # incremental: write this step's K/V into the cache
        k_new, v_new = self.project_kv(kv_in)
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype), (0, cache_index, 0, 0))
        if anc is not None:
            out = self.attend_ancestry(q_in, ck, cv, anc, mask, deterministic)
        else:
            out = self.attend(q_in, ck, cv, mask, deterministic)
        return out, (ck, cv)


class FFN(nn.Module):
    d_model: int
    ffn_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    dropout: float = 0.0
    activation: str = "relu"

    def setup(self):
        self.fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="fc1")
        self.fc2 = nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="fc2")

    def __call__(self, x, deterministic: bool = True):
        h = self.fc1(x)
        if self.activation == "relu":
            h = nn.relu(h)
        elif self.activation == "gelu":  # GPT-2's gelu_new (tanh approx)
            h = nn.gelu(h, approximate=True)
        elif self.activation == "gelu_exact":  # BERT/RoBERTa erf gelu
            h = nn.gelu(h, approximate=False)
        else:
            raise NotImplementedError(self.activation)
        h = _dropout(h, self.dropout, deterministic,
                     lambda: self.make_rng("dropout"))
        return self.fc2(h)


def _dropout(x, rate, deterministic, rng_fn):
    if rate <= 0.0 or deterministic:
        return x
    keep = jax.random.bernoulli(rng_fn(), 1.0 - rate, x.shape)
    return x * keep / (1.0 - rate)


class EncoderLayer(nn.Module):
    cfg: TxConfig

    def setup(self):
        c = self.cfg
        self.self_attn = MultiHeadAttention(
            c.d_model, c.n_heads, c.dtype, c.param_dtype, c.attn_dropout,
            name="self_attn",
        )
        self.self_attn_ln = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                                 dtype=c.dtype, param_dtype=c.param_dtype,
                                         name="self_attn_ln")
        self.ffn = FFN(c.d_model, c.ffn_dim, c.dtype, c.param_dtype,
                       c.act_dropout, c.activation, name="ffn")
        self.final_ln = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                                 dtype=c.dtype, param_dtype=c.param_dtype,
                                     name="final_ln")

    def __call__(self, x, mask=None, deterministic: bool = True):
        c = self.cfg
        rng = lambda: self.make_rng("dropout")  # noqa: E731
        res = x
        if c.normalize_before:
            x = self.self_attn_ln(x)
        x, _ = self.self_attn(x, x, mask, deterministic)
        x = _dropout(x, c.dropout, deterministic, rng)
        x = res + x
        if not c.normalize_before:
            x = self.self_attn_ln(x)
        res = x
        if c.normalize_before:
            x = self.final_ln(x)
        x = self.ffn(x, deterministic)
        x = _dropout(x, c.dropout, deterministic, rng)
        x = res + x
        if not c.normalize_before:
            x = self.final_ln(x)
        return x


class DecoderLayer(nn.Module):
    cfg: TxConfig
    has_cross: bool = True

    def setup(self):
        c = self.cfg
        self.self_attn = MultiHeadAttention(
            c.d_model, c.n_heads, c.dtype, c.param_dtype, c.attn_dropout,
            name="self_attn",
        )
        self.self_attn_ln = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                                 dtype=c.dtype, param_dtype=c.param_dtype,
                                         name="self_attn_ln")
        if self.has_cross:
            self.cross_attn = MultiHeadAttention(
                c.d_model, c.n_heads, c.dtype, c.param_dtype, c.attn_dropout,
                name="cross_attn",
            )
            self.cross_attn_ln = nn.LayerNorm(
                epsilon=c.ln_eps, use_fast_variance=False,
                dtype=c.dtype, param_dtype=c.param_dtype, name="cross_attn_ln"
            )
        self.ffn = FFN(c.d_model, c.ffn_dim, c.dtype, c.param_dtype,
                       c.act_dropout, c.activation, name="ffn")
        self.final_ln = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                                 dtype=c.dtype, param_dtype=c.param_dtype,
                                     name="final_ln")

    def __call__(
        self,
        x,
        self_mask=None,
        enc_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        enc_mask=None,
        deterministic: bool = True,
        self_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index=None,
        anc: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        rng = lambda: self.make_rng("dropout")  # noqa: E731
        res = x
        if c.normalize_before:
            x = self.self_attn_ln(x)
        x, new_self_cache = self.self_attn(
            x, x, self_mask, deterministic, cache=self_cache,
            cache_index=cache_index, anc=anc,
        )
        x = _dropout(x, c.dropout, deterministic, rng)
        x = res + x
        if not c.normalize_before:
            x = self.self_attn_ln(x)

        if self.has_cross and enc_kv is not None:
            res = x
            if c.normalize_before:
                x = self.cross_attn_ln(x)
            k_enc, v_enc = enc_kv
            x = self.cross_attn.attend(x, k_enc, v_enc, enc_mask, deterministic)
            x = _dropout(x, c.dropout, deterministic, rng)
            x = res + x
            if not c.normalize_before:
                x = self.cross_attn_ln(x)

        res = x
        if c.normalize_before:
            x = self.final_ln(x)
        x = self.ffn(x, deterministic)
        x = _dropout(x, c.dropout, deterministic, rng)
        x = res + x
        if not c.normalize_before:
            x = self.final_ln(x)
        return x, new_self_cache


class TransformerEncoder(nn.Module):
    """Token or embedding encoder (mirrors TxEncoderOld/New semantics)."""

    cfg: TxConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(
            c.vocab_size, c.d_model,
            embedding_init=nn.initializers.normal(stddev=c.d_model**-0.5),
            dtype=c.dtype, param_dtype=c.param_dtype, name="embed_tokens",
        )
        if c.learned_pos:
            self.embed_positions = nn.Embed(
                c.max_len, c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
                name="embed_positions",
            )
        self.layers = [
            EncoderLayer(c, name=f"layers_{i}") for i in range(c.n_layers)
        ]

    def _pos(self, t: int) -> jnp.ndarray:
        c = self.cfg
        if c.learned_pos:
            return self.embed_positions(jnp.arange(t))
        return jnp.asarray(
            sinusoidal_positions(c.max_len, c.d_model)[:t], dtype=c.dtype
        )

    def __call__(
        self,
        src_tokens: Optional[jnp.ndarray] = None,
        token_embeddings: Optional[jnp.ndarray] = None,
        pad_mask: Optional[jnp.ndarray] = None,
        add_positions: bool = True,
        deterministic: bool = True,
        scale_embeddings: Optional[bool] = None,
    ) -> jnp.ndarray:
        """``scale_embeddings``: apply the sqrt(d_model) embed scale to
        PASSED-IN token_embeddings. fairseq's forward_embedding scales
        token_embeddings too (x = embed_scale * token_embedding), so
        fairseq-semantics callers (tx_enc_type old/new_conc) must pass
        True; the local-transformer flavor (new) passes False. Default
        None keeps the token-id path's behavior (scale iff
        cfg.scale_embed)."""
        c = self.cfg
        if token_embeddings is None:
            assert src_tokens is not None
            token_embeddings = self.embed_tokens(src_tokens)
            if pad_mask is None:
                pad_mask = (src_tokens != c.pad_id).astype(jnp.int32)
            if scale_embeddings is None:
                scale_embeddings = True
        x = token_embeddings
        if c.scale_embed and bool(scale_embeddings):
            x = x * jnp.sqrt(c.d_model).astype(x.dtype)
        if add_positions:
            x = x + self._pos(x.shape[1])[None]
        x = _dropout(x, c.dropout, deterministic,
                     lambda: self.make_rng("dropout"))
        attn_mask = make_padding_mask(pad_mask, dtype=jnp.float32)
        for layer in self.layers:
            x = layer(x, attn_mask, deterministic)
        return x


Cache = Dict[str, Any]


class TransformerDecoder(nn.Module):
    """Causal decoder with optional cross-attention.

    Three apply-methods:
      * ``__call__(tokens, enc_out, ...)`` — full teacher-forced forward.
      * ``build_cache(batch, max_len, enc_out)`` — allocate the decode
        cache (self K/V zeros + cross K/V computed once).
      * ``decode_step(token, position, cache, enc_mask)`` — one
        incremental step; returns (logits, new_cache).
    """

    cfg: TxConfig
    has_cross: bool = True

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(
            c.vocab_size, c.d_model,
            embedding_init=nn.initializers.normal(stddev=c.d_model**-0.5),
            dtype=c.dtype, param_dtype=c.param_dtype, name="embed_tokens",
        )
        if c.learned_pos:
            self.embed_positions = nn.Embed(
                c.max_len, c.d_model, dtype=c.dtype, param_dtype=c.param_dtype,
                name="embed_positions",
            )
        self.layers = [
            DecoderLayer(c, has_cross=self.has_cross, name=f"layers_{i}")
            for i in range(c.n_layers)
        ]
        if c.final_ln:
            self.ln_f = nn.LayerNorm(epsilon=c.ln_eps, use_fast_variance=False,
                                 dtype=c.dtype, param_dtype=c.param_dtype,
                                     name="ln_f")
        if not c.share_in_out_embed:
            self.output_proj = nn.Dense(
                c.vocab_size, use_bias=False, dtype=c.dtype,
                param_dtype=c.param_dtype, name="output_proj",
            )

    # -- shared pieces -----------------------------------------------------
    def _embed(self, tokens: jnp.ndarray, position0: int = 0) -> jnp.ndarray:
        c = self.cfg
        x = self.embed_tokens(tokens)
        if c.scale_embed:
            x = x * jnp.sqrt(c.d_model).astype(x.dtype)
        if c.learned_pos:
            pos = self.embed_positions(position0 + jnp.arange(tokens.shape[1]))
        else:
            table = jnp.asarray(
                sinusoidal_positions(c.max_len, c.d_model), dtype=c.dtype
            )
            pos = jax.lax.dynamic_slice_in_dim(table, position0, tokens.shape[1])
        return x + pos[None]

    def _logits(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if c.final_ln:
            x = self.ln_f(x)
        if c.share_in_out_embed:
            w = self.embed_tokens.embedding.astype(x.dtype)
            return x @ w.T
        return self.output_proj(x)

    # -- full forward ---------------------------------------------------------
    def __call__(
        self,
        tokens: jnp.ndarray,
        enc_out: Optional[jnp.ndarray] = None,
        enc_pad_mask: Optional[jnp.ndarray] = None,
        self_pad_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        b, t = tokens.shape
        x = self._embed(tokens)
        x = _dropout(x, c.dropout, deterministic,
                     lambda: self.make_rng("dropout"))
        mask = make_causal_mask(t)
        if self_pad_mask is not None:
            mask = mask + make_padding_mask(self_pad_mask)
        enc_mask = make_padding_mask(enc_pad_mask)
        enc_kv = None
        for layer in self.layers:
            if self.has_cross and enc_out is not None:
                enc_kv = layer.cross_attn.project_kv(enc_out)
            x, _ = layer(x, mask, enc_kv, enc_mask, deterministic)
        return self._logits(x)

    # -- incremental decoding ----------------------------------------------------
    def build_cache(
        self,
        batch: int,
        max_len: int,
        enc_out: Optional[jnp.ndarray] = None,
    ) -> Cache:
        c = self.cfg
        dh = c.d_model // c.n_heads
        cache: Cache = {"layers": []}
        for layer in self.layers:
            entry: Dict[str, Any] = {
                "self_k": jnp.zeros((batch, max_len, c.n_heads, dh), c.dtype),
                "self_v": jnp.zeros((batch, max_len, c.n_heads, dh), c.dtype),
            }
            if self.has_cross and enc_out is not None:
                k_enc, v_enc = layer.cross_attn.project_kv(enc_out)
                entry["cross_k"] = k_enc
                entry["cross_v"] = v_enc
            cache["layers"].append(entry)
        return cache

    def decode_step(
        self,
        token: jnp.ndarray,  # (B, 1)
        position: jnp.ndarray,  # scalar int
        cache: Cache,
        enc_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Cache]:
        c = self.cfg
        b = token.shape[0]
        x = self._embed(token, position0=position)
        # mask future cache slots: (1,1,1,max_len)
        max_len = cache["layers"][0]["self_k"].shape[1]
        pos_ids = jnp.arange(max_len)[None, None, None, :]
        step_mask = jnp.where(pos_ids <= position, 0.0, NEG_INF)
        # ancestry-mode beam decode (gen/beam.ancestry_reorder): the KV
        # cache stays slot-major and self-attention selects ancestor rows
        # via cache["anc"]; cross K/V are beam-invariant (tiled enc_out),
        # so they need no treatment at all
        anc = cache.get("anc")
        new_layers = []
        for layer, entry in zip(self.layers, cache["layers"]):
            enc_kv = (
                (entry["cross_k"], entry["cross_v"])
                if ("cross_k" in entry and self.has_cross)
                else None
            )
            x, new_self = layer(
                x,
                self_mask=step_mask,
                enc_kv=enc_kv,
                enc_mask=enc_mask,
                deterministic=True,
                self_cache=(entry["self_k"], entry["self_v"]),
                cache_index=position,
                anc=anc,
            )
            new_entry = dict(entry)
            new_entry["self_k"], new_entry["self_v"] = new_self
            new_layers.append(new_entry)
        new_cache = dict(cache)  # keep non-layer keys (e.g. "anc")
        new_cache["layers"] = new_layers
        return self._logits(x), new_cache
