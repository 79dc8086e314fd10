"""Caffe2 pickle checkpoint support (reference: PySlowFast
CHECKPOINT_TYPE=caffe2, used for the Kinetics-pretrained backbones,
configs/vsitu_mdl_cfgs/*:CHECKPOINT_FILE_PATH; load path
utils/trn_utils.py:358-375).

Converts the caffe2 blob dictionary of single-pathway ResNet3D
checkpoints (I3D / C2D / SLOW R50, incl. non-local blocks) into the
PySlowFast torch naming, then reuses ``convert_video_backbone``. Blob
suffixes: ``_w`` conv weight, ``_bn_s``/``_bn_b`` BN scale/bias,
``_bn_rm``/``_bn_riv`` running mean/var.

Dual-pathway (SlowFast) caffe2 pickles use a fused blob namespace that
is not reliably documented; convert those to a torch state dict with
PySlowFast once and use ``convert_video_backbone`` directly — the loader
raises with that guidance.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict, Tuple

import numpy as np

from .slowfast_torch import convert_video_backbone

_SUFFIX_MAP = [
    ("_bn_s", "_bn.weight"),
    ("_bn_b", "_bn.bias"),
    ("_bn_rm", "_bn.running_mean"),
    ("_bn_riv", "_bn.running_var"),
    ("_w", ".weight"),
    ("_b", ".bias"),
]

_RES_RE = re.compile(r"^res(\d+)_(\d+)_branch(\d)([a-c]?)(.*)$")
_NL_RE = re.compile(r"^nonlocal_conv(\d+)_(\d+)_(theta|phi|g|out|bn)(.*)$")


def load_caffe2_pickle(path) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data["blobs"] if "blobs" in data else data
    return {
        k: np.asarray(v)
        for k, v in blobs.items()
        if isinstance(v, np.ndarray) or hasattr(v, "shape")
    }


def caffe2_to_pysf_names(blobs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Caffe2 blob names -> PySlowFast torch names (single pathway)."""
    out: Dict[str, np.ndarray] = {}
    for name, arr in blobs.items():
        if name.endswith("_momentum") or name.startswith(("pred_", "fc1000")):
            continue  # classifier head / optimizer state not needed
        # stem
        if name == "conv1_w":
            out["s1.pathway0_stem.conv.weight"] = arr
            continue
        m = re.match(r"^res_conv1_bn_(s|b|rm|riv)$", name)
        if m:
            suf = {"s": "weight", "b": "bias", "rm": "running_mean",
                   "riv": "running_var"}[m.group(1)]
            out[f"s1.pathway0_stem.bn.{suf}"] = arr
            continue
        m = _NL_RE.match(name)
        if m:
            stage, block, part, rest = m.groups()
            base = f"s{stage}.pathway0_nonlocal{block}"
            if part == "bn":
                suf = {"_s": "weight", "_b": "bias", "_rm": "running_mean",
                       "_riv": "running_var"}[rest]
                out[f"{base}.bn.{suf}"] = arr
            else:
                assert rest == "_w", name
                out[f"{base}.conv_{part}.weight"] = arr
            continue
        m = _RES_RE.match(name)
        if m:
            stage, block, branch, sub, rest = m.groups()
            base = f"s{stage}.pathway0_res{block}"
            if branch == "1":
                tgt = f"{base}.branch1"
            else:
                tgt = f"{base}.branch2.{sub}"
            if rest == "_w":
                out[f"{tgt}.weight"] = arr
            else:
                suf = {"_bn_s": "weight", "_bn_b": "bias",
                       "_bn_rm": "running_mean",
                       "_bn_riv": "running_var"}[rest]
                bn = f"{base}.branch1_bn" if branch == "1" else (
                    f"{base}.branch2.{sub}_bn"
                )
                out[f"{bn}.{suf}"] = arr
            continue
        # unknown blob: keep for diagnostics under a reserved prefix
        out[f"_unmapped.{name}"] = arr
    return out


def convert_caffe2_backbone(path, arch: str) -> Tuple[Dict, Dict]:
    """caffe2 pkl -> (params, batch_stats) for a single-pathway backbone."""
    if arch == "slowfast":
        raise NotImplementedError(
            "dual-pathway caffe2 pickles use an undocumented fused blob "
            "namespace; convert to a torch state dict with PySlowFast and "
            "use convert_video_backbone instead"
        )
    blobs = load_caffe2_pickle(path)
    sd = caffe2_to_pysf_names(blobs)
    unmapped = [k for k in sd if k.startswith("_unmapped.")]
    sd = {k: v for k, v in sd.items() if not k.startswith("_unmapped.")}
    if unmapped:
        import logging

        logging.getLogger(__name__).warning(
            "caffe2 conversion skipped %d unmapped blobs (e.g. %s)",
            len(unmapped), unmapped[:3],
        )
    return convert_video_backbone(sd, arch)
