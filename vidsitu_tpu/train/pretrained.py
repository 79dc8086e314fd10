"""Pretrained-weight loading policies (reference: trn_utils.py:352-413).

  * vb task: load a converted SlowFast/SFBase checkpoint into the video
    backbone (+ projection head if present);
  * ``train.freeze_sfbase``: freeze the backbone subtree during training
    (gradient mask, reference :376-413);
  * converted GPT-2 / RoBERTa params for the language models.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax


def _load_caffe2_blobs(path):
    """Return the caffe2 blob dict if ``path`` is a caffe2-format pickle
    (a {'blobs': ...} wrapper or a bare {name: ndarray} dict, both of
    which the published Kinetics checkpoints use), else None. Loads the
    file at most once — the dict is passed straight to the converter.
    torch checkpoints short-circuit (zip serialization) or fail the
    plain unpickle (legacy torch needs persistent_load)."""
    import pickle
    import zipfile

    if zipfile.is_zipfile(path):
        return None  # torch >=1.6 zip serialization
    try:
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    except Exception:
        return None
    if not isinstance(data, dict) or not data:
        return None
    blobs = data["blobs"] if "blobs" in data else data
    if isinstance(blobs, dict) and any(
        hasattr(v, "shape") for v in blobs.values()
    ):
        return blobs
    return None


def _is_caffe2_pickle(path) -> bool:
    return _load_caffe2_blobs(path) is not None


def load_pretrained_variables(cfg, model, variables: Dict[str, Any], logger=None):
    """Apply cfg-driven pretrained initialization. Returns new variables."""

    def log(msg):
        if logger:
            logger.info(msg)

    if cfg.task_type == "vb" and cfg.mdl.load_sf_pretrained:
        path = cfg.mdl.sf_pretrained_path
        assert path and Path(path).exists(), (
            f"load_sf_pretrained set but path missing: {path}"
        )
        blobs = _load_caffe2_blobs(path)
        if blobs is not None:
            # the published Kinetics checkpoints are caffe2 pickles; the
            # reference converts them at load time
            # (trn_utils.py:358-375 via slowfast load_checkpoint)
            from ..convert.caffe2 import convert_caffe2_backbone

            bb_params, bb_stats = convert_caffe2_backbone(
                blobs, cfg.vid_mdl.arch, strict=True
            )
            conv = {
                "params": {"backbone": bb_params},
                "batch_stats": {"backbone": bb_stats},
            }
        else:
            from ..convert.hf_torch import load_torch_state_dict
            from ..convert.slowfast_torch import convert_sfbase_checkpoint

            sd = load_torch_state_dict(path)
            conv = convert_sfbase_checkpoint(sd, cfg.vid_mdl.arch, strict=True)
        params = dict(variables["params"])
        params["backbone"] = conv["params"]["backbone"]
        if "proj_head" in conv["params"]:
            params["proj_head"] = conv["params"]["proj_head"]
        stats = dict(variables.get("batch_stats", {}))
        stats["backbone"] = conv["batch_stats"]["backbone"]
        log(f"loaded SlowFast pretrained weights from {path}")
        return dict(variables, params=params, batch_stats=stats)

    if cfg.task_type == "vb_arg" and cfg.mdl.mdl_name == "new_gpt2_only":
        path = cfg.mdl.gpt2_mdl_path
        if path:
            assert Path(path).exists(), path
            from ..convert.hf_torch import convert_gpt2, load_torch_state_dict

            tokvocab = variables["params"]["decoder"]["embed_tokens"][
                "embedding"
            ].shape[0]
            sd = load_torch_state_dict(path)
            dec = convert_gpt2(
                sd, n_layers=cfg.gpt2_mdl.n_layers,
                n_heads=cfg.gpt2_mdl.n_heads, target_vocab=tokvocab,
                strict=True,
            )
            params = dict(variables["params"])
            params["decoder"] = dec
            log(f"loaded GPT-2 pretrained weights from {path}")
            return dict(variables, params=params)

    if cfg.task_type == "evrel":
        path = cfg.mdl.rob_mdl_path
        if path:
            assert Path(path).exists(), path
            from ..convert.hf_torch import convert_roberta, load_torch_state_dict

            sd = load_torch_state_dict(path)
            rob = convert_roberta(
                sd, n_layers=cfg.rob_mdl.n_layers,
                n_heads=cfg.rob_mdl.n_heads, strict=True,
            )
            params = dict(variables["params"])
            merged = dict(params["rob_mdl"])
            merged.update(rob)
            params["rob_mdl"] = merged
            log(f"loaded RoBERTa pretrained weights from {path}")
            return dict(variables, params=params)

    return variables


def make_freeze_mask(cfg, params) -> Optional[Any]:
    """1.0/0.0 gradient mask tree; 0 freezes the video backbone
    (train.freeze_sfbase, reference trn_utils.py:376-413)."""
    if not cfg.train.freeze_sfbase or "backbone" not in params:
        return None

    def mask_subtree(tree, frozen):
        return jax.tree.map(lambda _: 0.0 if frozen else 1.0, tree)

    return {
        k: mask_subtree(v, k == "backbone") for k, v in params.items()
    }
