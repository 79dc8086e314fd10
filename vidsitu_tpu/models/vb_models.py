"""Verb-prediction task model (SFBase analog, mdl_sf_base.py:116-231) and
the feature-extraction model (vidsitu_code/feat_extractor.py:77-112)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .common import MLP
from .srl_models import masked_cross_entropy
from .video_backbone import (
    ResNet3DBackbone,
    SlowFastBackbone,
    VideoCfg,
    backbone_out_dim,
    trimmed_head,
)


def _fold_events(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 5, T, H, W, C) -> (B*5, T, H, W, C); 5-D inputs pass through.

    PERF: prefer folding on the HOST (data/loader.fold_frame_events — a
    free numpy view) and shipping 5-D. In-graph, XLA lays the folded
    tensor out batch-minor, so this reshape materializes a full copy of
    the frames (~11 ms at 120 clips on v5e, benchmarks/micro20): the
    6-D path is kept only as a compatibility fallback.
    """
    if x.ndim == 5:
        return x
    s = x.shape
    return x.reshape((s[0] * s[1],) + s[2:])


def _maybe_normalize(x: jnp.ndarray, vid_cfg: "VideoCfg", dtype) -> jnp.ndarray:
    """On-device preprocessing: uint8 frames -> normalized compute dtype
    (ships 4x fewer host->device bytes; north-star input pipeline).

    uint8 frames arrive already channel-reversed by the host packer when
    ``reverse_input_channel`` is set; the reference normalizes before
    reversing (dat_loader.py:478-484), so reverse mean/std here to make
    both preprocessing paths produce identical tensors.
    """
    if x.dtype == jnp.uint8:
        mean_t, std_t = vid_cfg.mean, vid_cfg.std
        if vid_cfg.reverse_input_channel:
            mean_t, std_t = mean_t[::-1], std_t[::-1]
        mean = jnp.asarray(mean_t, dtype)
        std = jnp.asarray(std_t, dtype)
        return (x.astype(dtype) / 255.0 - mean) / std
    return x.astype(dtype)


class VbVideoModel(nn.Module):
    """Backbone + trimmed head (+ optional projection to verb vocab).

    With ``num_classes > 0`` this is SFBase (2-layer MLP projection head,
    mdl_sf_base.py:161-167); with ``num_classes == 0`` it is the feature
    extractor producing (B, 5, D).
    """

    vid_cfg: VideoCfg
    num_classes: int = 0

    def setup(self):
        if self.vid_cfg.arch == "slowfast":
            self.backbone = SlowFastBackbone(self.vid_cfg, name="backbone")
        else:
            self.backbone = ResNet3DBackbone(self.vid_cfg, name="backbone")
        if self.num_classes > 0:
            din = backbone_out_dim(self.vid_cfg)
            self.proj_head = MLP(
                [din // 2, self.num_classes],
                dtype=self.vid_cfg.dtype,
                param_dtype=self.vid_cfg.param_dtype,
                name="proj_head",
            )

    def clip_features(self, inp: Dict[str, jnp.ndarray],
                      train: bool = False):
        """(N, D) pooled per-clip features; N need NOT be a multiple
        of 5. The production extractor feeds a FLAT clip stream in
        batches of exactly 128 clips and regroups (5, D) per video on
        the host: the whole inference program is batch-minor on current
        stacks (BENCH.md), so the clip dim pads to 128-lane multiples,
        and N=128 — zero padding waste, power-of-2 tiling — measures
        810.9 vs 790.6 clips/s at the N=120 video-granularity point
        (benchmarks/micro25)."""
        # fold first: on the 6-D fallback path the fold is a materialized
        # copy (see _fold_events), 4x cheaper on uint8 than on bf16
        fast = _maybe_normalize(
            _fold_events(inp["frms_ev_fast_tensor"]),
            self.vid_cfg, self.vid_cfg.dtype,
        )
        if self.vid_cfg.arch == "slowfast":
            slow = _maybe_normalize(
                _fold_events(inp["frms_ev_slow_tensor"]),
                self.vid_cfg, self.vid_cfg.dtype,
            )
            slow_f, fast_f = self.backbone(slow, fast, train)
            pooled = trimmed_head([slow_f, fast_f])
        else:
            feat = self.backbone(fast, train)
            pooled = trimmed_head([feat])
        return pooled

    def features(self, inp: Dict[str, jnp.ndarray], train: bool = False):
        """(B, 5, D) pooled clip features (forward_encoder + head)."""
        pooled = self.clip_features(inp, train)
        b5, d = pooled.shape
        return pooled.reshape(b5 // 5, 5, d)

    def __call__(
        self, inp: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        train = not deterministic
        feats = self.features(inp, train)
        if self.num_classes == 0:
            return {"feats": feats}
        logits = self.proj_head(feats)  # (B, 5, V)
        out = {"mdl_out": logits}
        if "label_tensor" in inp:
            # plain CE over B*5 events (LossB, mdl_sf_base.py:219-231)
            labels = inp["label_tensor"].reshape(-1)
            out["loss"] = masked_cross_entropy(
                logits.reshape(-1, self.num_classes), labels, pad_id=-1
            )
        return out


def build_vb_model(cfg, comm):
    from .selector import compute_dtypes

    dtype, param_dtype = compute_dtypes(cfg)
    vid_cfg = VideoCfg.from_cfg(
        cfg.vid_mdl, dtype=dtype, param_dtype=param_dtype,
        remat=cfg.train.remat,
        remat_stages=cfg.train.remat_stages,
        bn_f32_stats=cfg.train.bn_f32_stats,
        packed_stem_epilogue=cfg.tpu.packed_stem_epilogue,
    )
    return VbVideoModel(vid_cfg=vid_cfg, num_classes=len(comm.vb_id_vocab))


def build_feat_extractor(cfg):
    from .selector import compute_dtypes

    dtype, param_dtype = compute_dtypes(cfg)
    vid_cfg = VideoCfg.from_cfg(
        cfg.vid_mdl, dtype=dtype, param_dtype=param_dtype,
        remat=cfg.train.remat,
        remat_stages=cfg.train.remat_stages,
        bn_f32_stats=cfg.train.bn_f32_stats,
        packed_stem_epilogue=cfg.tpu.packed_stem_epilogue,
    )
    return VbVideoModel(vid_cfg=vid_cfg, num_classes=0)
