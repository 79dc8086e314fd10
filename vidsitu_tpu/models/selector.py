"""Model/loss/eval selection by (task_type, mdl.mdl_name)
(reference: vidsitu_code/mdl_selector.py:26-73)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..gen.beam import GenConfig
from ..gen.generate import make_srl_generator
from .srl_models import SRL_MDL_NAMES, SRLModel
from .transformer import TxConfig

DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def compute_dtypes(cfg):
    return DTYPES[cfg.train.dtype], DTYPES[cfg.train.param_dtype]


def build_model(cfg, comm):
    """Instantiate and return the model for cfg."""
    task = cfg.task_type
    mdl_name = cfg.mdl.mdl_name
    dtype, param_dtype = compute_dtypes(cfg)
    if task == "vb_arg":
        assert mdl_name in SRL_MDL_NAMES, f"unknown vb_arg model {mdl_name}"
        tok = comm.gpt2_hf_tok
        if mdl_name == "new_gpt2_only":
            # GPT-2 architecture (pre-norm, gelu, learned positions, tied
            # in/out embeddings), dims from cfg.gpt2_mdl
            g = cfg.gpt2_mdl
            dec_cfg = TxConfig(
                vocab_size=len(tok),
                d_model=g.d_model,
                ffn_dim=4 * g.d_model,
                n_layers=g.n_layers,
                n_heads=g.n_heads,
                dropout=0.1,
                max_len=g.max_pos,
                normalize_before=True,
                scale_embed=False,
                learned_pos=True,
                share_in_out_embed=True,
                pad_id=tok.pad_token_id,
                activation="gelu",
                final_ln=True,
                dtype=dtype,
                param_dtype=param_dtype,
            )
        else:
            dec_cfg = TxConfig.from_cfg(
                cfg.tx_dec, len(tok), tok.pad_token_id, side="decoder",
                dtype=dtype, param_dtype=param_dtype,
            )
        enc_cfg = TxConfig.from_cfg(
            cfg.tx_dec, len(tok), tok.pad_token_id, side="encoder",
            dtype=dtype, param_dtype=param_dtype,
        )
        return SRLModel(
            mdl_name=mdl_name, dec_cfg=dec_cfg, enc_cfg=enc_cfg,
            tx_enc_type=cfg.mdl.tx_enc_type,
        )
    if task == "vb":
        from .vb_models import build_vb_model

        return build_vb_model(cfg, comm)
    if task == "evrel":
        from .evrel_models import build_evrel_model

        return build_evrel_model(cfg, comm)
    raise NotImplementedError(task)


def init_model_variables(model, sample_batch: Dict[str, Any], seed: int = 0):
    """Jitted init from a host sample batch."""
    batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    return jax.jit(model.init)(jax.random.PRNGKey(seed), batch)


def build_srl_generate_fn(cfg, comm, model, mesh=None):
    tok = comm.gpt2_hf_tok
    gen_cfg = GenConfig.from_cfg(cfg.gen)
    # decoder position capacity caps decode length (fairseq
    # max_decoder_positions(), seq_gen.py:233-239)
    if "gpt2" in cfg.mdl.mdl_name:
        # the CONFIGURED position-table size, not a hardcoded 1024: a
        # shrunk gpt2_mdl.max_pos must still cap decode length or the
        # learned nn.Embed would be indexed out of range (XLA clamps
        # silently -> wrong generations)
        max_positions = int(cfg.gpt2_mdl.max_pos)
    else:
        max_positions = int(cfg.tx_dec["max_target_positions"])
    return make_srl_generator(
        model,
        gen_cfg,
        vocab_size=len(tok),
        pad_id=tok.pad_token_id,
        bos_id=tok.eos_token_id,  # decode starts from eos-as-bos
        eos_id=tok.eos_token_id,
        unk_id=tok.unk_token_id,
        max_positions=max_positions,
        mesh=mesh,
        ancestry=bool(cfg.tpu.get("ancestry_beam", True)),
        seg_min=int(cfg.tpu.get("seg_decode_min", 64)),
    )
