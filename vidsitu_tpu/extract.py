"""Pre-extracted feature pipeline (reference:
vidsitu_code/feat_extractor.py): run the video backbone + trimmed head
over every segment of the requested splits and write one
``{seg}_feats.npy`` of shape (5, D) per segment — the input contract of
the SFPreFeats_* SRL models and the sfpret_* evrel models.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import VsituDS
from .data.loader import DataLoader
from .models.selector import init_model_variables
from .models.vb_models import build_feat_extractor


class FramesOnlyDS:
    """All-splits frames dataset (VsituDS_All, feat_extractor.py:20-74)."""

    def __init__(self, cfg, comm, split_type: str):
        base = VsituDS.__new__(VsituDS)
        base.full_cfg = cfg
        base.cfg = cfg.ds.vsitu
        base.vid_cfg = cfg.vid_mdl
        base.task_type = "vb"
        base.split_type = split_type
        base.comm = comm
        base.read_files(split_type)
        self.base = base
        self.vseg_lst = base.vseg_lst
        self.debug = cfg.debug_mode

    def __len__(self):
        return min(30, len(self.vseg_lst)) if self.debug else len(self.vseg_lst)

    def __getitem__(self, idx: int):
        out = self.base.get_frms_all(idx)
        out["vseg_idx"] = np.asarray(idx, dtype=np.int64)
        return out


def extract_features(
    cfg,
    comm,
    variables=None,
    splits: Optional[List[str]] = None,
    out_dir: Optional[str] = None,
    batch_size: int = 4,
) -> Dict[str, int]:
    """Extract features for the given splits. Returns counts per split."""
    splits = splits or ["valid", "train"]
    out_dir = Path(out_dir or cfg.ds.vsitu.vsitu_frm_feats)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = build_feat_extractor(cfg)
    counts: Dict[str, int] = {}
    fwd = jax.jit(lambda v, b: model.apply(v, b)["feats"])
    for split in splits:
        ds = FramesOnlyDS(cfg, comm, split)
        dl = DataLoader(ds, batch_size=batch_size, shuffle=False,
                        drop_last=False)
        n = 0
        for batch in dl:
            if variables is None:
                variables = init_model_variables(model, batch)
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            feats = np.asarray(fwd(variables, dev))
            for bix in range(feats.shape[0]):
                seg = ds.vseg_lst[int(batch["vseg_idx"][bix])]
                np.save(out_dir / f"{seg}_feats.npy", feats[bix])
                n += 1
        counts[split] = n
    return counts
