"""Event-relation (evrel) models — the five reference variants
(vidsitu_code/mdl_evrel.py) in one configurable flax module:

  * ``rob_evrel``            — RoBERTa sequence classifier over the
                               pair sequences vs Ev3 (:12-50)
  * ``sfpret_evrel``         — RoBERTa pooler per event + video-feature
                               MLP -> vis-lang encoder -> pair concat via
                               [0,1,2,2] x [2,2,3,4] -> 5-way classifier
                               (:53-130)
  * ``sfpret_vbonly_evrel``  — language input = verb tokens only (:133-135)
  * ``sfpret_onlyvid_evrel`` — language zeroed (:138-188)
  * ``txe_evrel``            — video zeroed (:191-240)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .common import MLP
from .roberta import RobertaCfg, RobertaClassificationHead, RobertaModel
from .srl_models import masked_cross_entropy

EVREL_MDL_NAMES = (
    "rob_evrel",
    "txe_evrel",
    "sfpret_evrel",
    "sfpret_vbonly_evrel",
    "sfpret_onlyvid_evrel",
)

NUM_EVREL_LABELS = 5
PAIR_IDX_A = (0, 1, 2, 2)
PAIR_IDX_B = (2, 2, 3, 4)


class EvrelModel(nn.Module):
    mdl_name: str
    rob_cfg: RobertaCfg

    def setup(self):
        assert self.mdl_name in EVREL_MDL_NAMES, self.mdl_name
        c = self.rob_cfg
        d = 1024
        if self.mdl_name == "rob_evrel":
            self.rob_mdl = RobertaModel(c, add_pooling_layer=False, name="rob_mdl")
            self.classf_head = RobertaClassificationHead(
                c.d_model, NUM_EVREL_LABELS, dtype=c.dtype,
                param_dtype=c.param_dtype, name="classf_head",
            )
            return
        self.rob_mdl = RobertaModel(c, add_pooling_layer=True, name="rob_mdl")
        self.vid_feat_encoder = MLP(
            [d, d], dtype=c.dtype, param_dtype=c.param_dtype,
            name="vid_feat_encoder",
        )
        self.vis_lang_encoder = MLP(
            [d, d], dtype=c.dtype, param_dtype=c.param_dtype,
            name="vis_lang_encoder",
        )
        self.vis_lang_classf = MLP(
            [d, NUM_EVREL_LABELS], dtype=c.dtype, param_dtype=c.param_dtype,
            name="vis_lang_classf",
        )

    # -- variants -----------------------------------------------------------
    def _get_src(self, inp):
        if self.mdl_name == "sfpret_vbonly_evrel":
            return inp["evrel_vbonly_out_ones"], inp["evrel_vbonly_out_ones_lens"]
        return inp["evrel_seq_out_ones"], inp["evrel_seq_out_ones_lens"]

    def __call__(
        self, inp: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        labels = inp["evrel_labs"]  # (B, 4, N)
        if self.mdl_name == "rob_evrel":
            toks = inp["evrel_seq_out"]  # (B, 4, N, 120)
            b, nev, nann, slen = toks.shape
            flat = toks.reshape(b * nev * nann, slen)
            attn = inp["evrel_seq_out_lens"].reshape(b * nev * nann, slen)
            hidden = self.rob_mdl(
                flat, attn, deterministic=deterministic
            )["last_hidden_state"]
            logits = self.classf_head(hidden, deterministic)
            logits = logits.reshape(b, nev, nann, NUM_EVREL_LABELS)
        else:
            toks, lens = self._get_src(inp)  # (B, 5, N, L)
            b, nev5, nann, slen = toks.shape
            if self.mdl_name == "sfpret_onlyvid_evrel":
                # the language pathway is ZEROED for this ablation
                # (mdl_evrel.py:138-188) — skip the RoBERTa forward whose
                # output would be multiplied by zero anyway (the dominant
                # compute of the model, fwd+bwd). Initialize rob_mdl's
                # params anyway so the tree matches the reference's
                # state_dict (torch registers params at construction)
                if self.is_initializing():
                    flat0 = toks.reshape(b * nev5 * nann, slen)
                    attn0 = lens.reshape(b * nev5 * nann, slen)
                    _ = self.rob_mdl(flat0, attn0, deterministic=True)
                pooler5 = jnp.zeros(
                    (b, 5, nann, self.rob_cfg.d_model), self.rob_cfg.dtype
                )
            else:
                flat = toks.reshape(b * nev5 * nann, slen)
                attn = lens.reshape(b * nev5 * nann, slen)
                pooler = self.rob_mdl(
                    flat, attn, deterministic=deterministic
                )["pooler_output"]
                pooler5 = pooler.reshape(b, 5, nann, -1)

            vis = self.vid_feat_encoder(
                inp["frm_feats"].astype(self.rob_cfg.dtype)
            )  # (B, 5, 1024)
            vis = jnp.broadcast_to(
                vis[:, :, None, :], (b, 5, nann, vis.shape[-1])
            )
            if self.mdl_name == "txe_evrel":
                vis = jnp.zeros_like(vis)

            vis_lang = self.vis_lang_encoder(
                jnp.concatenate([vis, pooler5], axis=-1)
            )  # (B, 5, N, 1024)
            a = jnp.take(vis_lang, jnp.asarray(PAIR_IDX_A), axis=1)
            bb = jnp.take(vis_lang, jnp.asarray(PAIR_IDX_B), axis=1)
            logits = self.vis_lang_classf(
                jnp.concatenate([a, bb], axis=-1)
            )  # (B, 4, N, 5)

        loss = masked_cross_entropy(
            logits.reshape(-1, NUM_EVREL_LABELS), labels.reshape(-1), pad_id=-1
        )
        return {"loss": loss, "mdl_out": logits}


def build_evrel_model(cfg, comm):
    from .selector import compute_dtypes

    dtype, param_dtype = compute_dtypes(cfg)
    tok = comm.rob_hf_tok
    rc = cfg.rob_mdl
    # HF RoBERTa offsets positions by pad_id (pad=1 for the published
    # checkpoint). With a from-scratch vocab the pad id can be large, so
    # size the position table to cover pad_id + longest sequence (120).
    max_pos = max(rc.max_pos, tok.pad_token_id + 122)
    rob_cfg = RobertaCfg(
        vocab_size=len(tok),
        d_model=rc.d_model,
        n_layers=rc.n_layers,
        n_heads=rc.n_heads,
        ffn_dim=rc.ffn_dim,
        max_pos=max_pos,
        pad_id=tok.pad_token_id,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    return EvrelModel(mdl_name=cfg.mdl.mdl_name, rob_cfg=rob_cfg)
