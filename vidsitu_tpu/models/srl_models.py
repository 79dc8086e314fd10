"""SRL (vb_arg) task models: decoder-only and encoder-decoder variants.

Re-designs of the reference model zoo (mdl_sf_base.py:590-832) as one
configurable flax module:

  * ``tx_only``              — decoder-only LM over per-event role
                               sequences (Simple_TxDec, :590-675)
  * ``txed_only``            — + token encoder over the 5 verb tokens
                               (Simple_TxEncDec, :678-691)
  * ``sfpret_txed_vbarg``    — video-feature MLP -> per-event cross-attn
                               memory (SFPreFeats_TxDec, :763-790)
  * ``sfpret_txe_txd_vbarg`` — + 3-layer transformer over the 5 event
                               features (SFPreFeats_TxEncDec, :793-832)

Batch geometry: the (B, 5 events) axis is folded into the batch
(combine_first_ax, misc_utils.py:1-5) so all 5 events decode in parallel
— on TPU this is the long axis that shards across the data mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import optax
from flax import linen as nn

from .common import MLP
from .transformer import TransformerDecoder, TransformerEncoder, TxConfig

SRL_MDL_NAMES = (
    "tx_only",
    "new_gpt2_only",  # GPT-2-flavored decoder-only LM (Simple_GPT2_New)
    "txed_only",
    "sfpret_txed_vbarg",
    "sfpret_txe_txd_vbarg",
)


def get_head_dim(full_cfg) -> int:
    """Feature dim from the features-dir name (mdl_sf_base.py:751-760)."""
    d = full_cfg.ds.vsitu.vsit_frm_feats_dir
    if "i3d" in d:
        return 2048
    if "slow_fast" in d or "sfast" in d:
        return 2304
    raise NotImplementedError(f"cannot infer feature dim from {d}")


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, pad_id: int
) -> jnp.ndarray:
    """Mean CE over non-pad labels (F.cross_entropy(ignore_index=pad))."""
    mask = (labels != pad_id).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class SRLModel(nn.Module):
    """One module covering the SRL variants (selected by mdl_name).

    ``tx_enc_type`` mirrors cfg.mdl.tx_enc_type (mdl_sf_base.py:423-432):
    'old' adds sinusoidal positions (fairseq TxEncoderOld), 'new' encodes
    raw embeddings (TxEncoderNew, pe=False), 'new_conc' concatenates
    input and encoder output through an MLP (TxEncoderNew_Conc).
    """

    mdl_name: str
    dec_cfg: TxConfig
    enc_cfg: Optional[TxConfig] = None
    tx_enc_type: str = "new"

    @property
    def has_cross(self) -> bool:
        return self.mdl_name not in ("tx_only", "new_gpt2_only")

    def setup(self):
        assert self.mdl_name in SRL_MDL_NAMES, self.mdl_name
        self.decoder = TransformerDecoder(
            self.dec_cfg, has_cross=self.has_cross, name="decoder"
        )
        d = self.dec_cfg.d_model
        if self.mdl_name in ("sfpret_txed_vbarg", "sfpret_txe_txd_vbarg"):
            self.vid_feat_encoder = MLP(
                [d, d], dtype=self.dec_cfg.dtype,
                param_dtype=self.dec_cfg.param_dtype, name="vid_feat_encoder",
            )
        if self.mdl_name == "sfpret_txe_txd_vbarg":
            assert self.enc_cfg is not None
            self.vid_feat_txenc = TransformerEncoder(
                self.enc_cfg, name="vid_feat_txenc"
            )
            if self.tx_enc_type == "new_conc":
                self.txenc_conc = MLP(
                    [d, d], dtype=self.dec_cfg.dtype,
                    param_dtype=self.dec_cfg.param_dtype, name="txenc_conc",
                )
        if self.mdl_name == "txed_only":
            assert self.enc_cfg is not None
            self.encoder = TransformerEncoder(self.enc_cfg, name="encoder")

    # -- encoder ----------------------------------------------------------
    def encode(
        self, inp: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Returns (enc_out (B*5, S, D), enc_pad_mask (B*5, S)) or Nones."""
        if self.mdl_name in ("tx_only", "new_gpt2_only"):
            return None, None
        if self.mdl_name == "txed_only":
            # language-only enc-dec: encode the event's verb tokens
            vb_toks = inp["vb_out_by_ev"][:, :, 0, :]  # (B, 5, 5)
            b = vb_toks.shape[0]
            vb_flat = vb_toks.reshape(b * 5, -1)
            pad_mask = (vb_flat != self.dec_cfg.pad_id).astype(jnp.int32)
            out = self.encoder(
                src_tokens=vb_flat, pad_mask=pad_mask,
                deterministic=deterministic,
            )
            return out, pad_mask
        frm_feats = inp["frm_feats"]  # (B, 5, D)
        b = frm_feats.shape[0]
        out = self.vid_feat_encoder(frm_feats.astype(self.dec_cfg.dtype))
        if self.mdl_name == "sfpret_txed_vbarg":
            # each event attends to its own single feature vector
            # (mdl_sf_base.py:774-790)
            return out.reshape(b * 5, 1, -1), None
        # sfpret_txe_txd_vbarg: context across the 5 events, then split
        # back to per-event memories (mdl_sf_base.py:806-832)
        # 'old' and 'new_conc' mirror fairseq's TransformerEncoder
        # (TxEncoderOld / TxEncoderNew_Conc subclassing it,
        # mdl_sf_base.py:246-420): sinusoidal positions AND the
        # sqrt(d_model) embed scale apply to the passed-in feature
        # embeddings (forward_embedding scales token_embeddings too);
        # 'new' is the local pe=False transformer (no scale, no pos)
        fairseq_like = self.tx_enc_type in ("old", "new_conc")
        ctx = self.vid_feat_txenc(
            token_embeddings=out,
            add_positions=fairseq_like,
            scale_embeddings=fairseq_like,
            deterministic=deterministic,
        )  # (B, 5, D)
        if self.tx_enc_type == "new_conc":
            ctx = self.txenc_conc(jnp.concatenate([out, ctx], axis=-1))
        return ctx.reshape(b * 5, 1, -1), None

    # -- training forward --------------------------------------------------
    def __call__(
        self, inp: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        # REFERENCE QUIRK (faithfully preserved): the decoder input is the
        # UNSHIFTED sequence [verb, args..., eos] — the reference feeds
        # dst_toks directly as prev_tokens and losses logits[:-1] vs
        # toks[1:] (Simple_TxDec.forward, mdl_sf_base.py:636-653; its
        # add_prev_tokens helper exists but is never called), while
        # generation starts from eos-as-bos with the verb forced at step
        # 0 (forward_gen :658-663). Training therefore never sees the
        # bos input the generator starts from; we reproduce exactly that.
        toks = inp["seq_out_by_ev"][:, :, 0, :]  # (B, 5, 60)
        b = toks.shape[0]
        toks_flat = toks.reshape(b * 5, -1)
        enc_out, enc_mask = self.encode(inp, deterministic)
        logits = self.decoder(
            toks_flat,
            enc_out=enc_out,
            enc_pad_mask=enc_mask,
            deterministic=deterministic,
        )
        loss = masked_cross_entropy(
            logits[:, :-1], toks_flat[:, 1:], self.dec_cfg.pad_id
        )
        return {"loss": loss}

    # -- generation plumbing ------------------------------------------------
    def gen_encode(self, inp: Dict[str, jnp.ndarray]):
        return self.encode(inp, deterministic=True)

    def gen_build_cache(self, batch: int, max_len: int, enc_out):
        return self.decoder.build_cache(batch, max_len, enc_out)

    def gen_decode_step(self, token, position, cache, enc_mask=None):
        return self.decoder.decode_step(token, position, cache, enc_mask)
