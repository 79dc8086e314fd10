"""3D-CNN video backbones: ResNet3D (c2d / i3d / slow) and SlowFast.

TPU-native re-implementation of the SlowFast-package backbones the
reference wraps (mdl_sf_base.py:20-62; SlowFast submodule
video_model_builder). Layout and design decisions:

  * channels-last (B, T, H, W, C) — XLA's native conv layout on TPU, so
    every conv lowers straight onto the MXU without transposes;
  * bottleneck residual stages [3,4,6,3] (R50) with per-arch temporal
    kernel bases (the public SlowFast `_TEMPORAL_KERNEL_BASIS`);
  * lateral fast->slow fusion convs (k=(fusion_kernel,1,1),
    stride=(alpha,1,1)) after the stem and after s2/s3/s4;
  * optional non-local blocks (dot_product / softmax instantiations)
    at the configured stage/block locations;
  * BatchNorm with running stats; under a sharded-batch jit the batch
    statistics reduce over the global batch (sync-BN for free).

Geometry (SlowFast-R50 8x8): slow stem 64ch T=8, fast stem 8ch T=32,
stage outputs slow [256,512,1024,2048] / fast [32,64,128,256], trimmed
head concat 2304 (SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# temporal kernel sizes per (arch, pathway, stage): stem + res2..res5
# Per-stage temporal-kernel PATTERNS (PySlowFast _TEMPORAL_KERNEL_BASIS,
# video_model_builder.py): a stage's pattern is tiled across its blocks
# — i3d res3/res4 alternate (3,1) per block and res5 alternates (1,3),
# NOT a single kernel per stage.
TEMPORAL_KERNELS = {
    "c2d": {"fast": [(1,), (1,), (1,), (1,), (1,)]},
    "i3d": {"fast": [(5,), (3,), (3, 1), (3, 1), (1, 3)]},
    "slow": {"fast": [(1,), (1,), (1,), (3,), (3,)]},
    "slowfast": {
        "slow": [(1,), (1,), (1,), (3,), (3,)],
        "fast": [(5,), (3,), (3,), (3,), (3,)],
    },
}

# temporal pool after s2 (SlowFast _POOL1): i3d/c2d pool T by 2
TEMPORAL_POOL = {"c2d": 2, "i3d": 2, "slow": 1, "slowfast": 1}

R50_BLOCKS = [3, 4, 6, 3]


@dataclass(frozen=True)
class VideoCfg:
    arch: str = "slowfast"
    depth_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    alpha: int = 4
    beta_inv: int = 8
    fusion_ratio: int = 2
    fusion_kernel: int = 7
    spatial_strides: Tuple[int, ...] = (1, 2, 2, 2)
    nl_location: Tuple[Tuple[Tuple[int, ...], ...], ...] = ((), (), (), ())
    nl_instantiation: str = "softmax"
    zero_init_final_bn: bool = True
    remat: bool = False  # jax.checkpoint each bottleneck (memory saver)
    # selective remat: stage indices (0..3 = s2..s5) whose bottlenecks
    # are checkpointed; cheaper than full remat when only the early
    # high-resolution stages cause the OOM (VERDICT r3 #4)
    remat_stages: Tuple[int, ...] = ()
    # False -> BN batch-stat reductions run in the compute dtype (bf16)
    # instead of f32: ~15% per-ConvBN train-fwd saving measured isolated
    # (BENCH.md round 3), accuracy-gated — A/B end-to-end before use
    bn_f32_stats: bool = True
    # inference fast-stem fused epilogue (Stem._packed_epilogue):
    # bit-exact and faster ISOLATED (micro23: 28.4 -> 25.5 ms), but
    # REGRESSES in-model (790 -> 773 clips/s at 120 — the dt-unpack of
    # the pooled tensor lands worse next to s2 than the plain unpack's
    # fusion pattern). Default OFF; togglable via tpu.packed_stem_epilogue
    # for re-measurement on future stacks
    packed_stem_epilogue: bool = False
    mean: tuple = (0.45, 0.45, 0.45)
    std: tuple = (0.225, 0.225, 0.225)
    # frames arriving on device are already channel-reversed host-side
    # (pack_pathways); reference normalizes BEFORE reversing
    # (dat_loader.py:478-484), so on-device normalization of reversed
    # uint8 frames must use reversed mean/std to match bit-for-bit
    reverse_input_channel: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @classmethod
    def from_cfg(cls, vid_mdl, dtype=jnp.float32, param_dtype=jnp.float32,
                 remat=False, remat_stages="",
                 bn_f32_stats=True, packed_stem_epilogue=False):
        # remat_stages: "s2,s3" / "0,1" -> stage indices 0..3;
        # "stem"/"s1" -> -1 (checkpoint the stems: drops the stem conv's
        # batch-minor input-relayout copy from the persistent set)
        stages = []
        for tok in str(remat_stages or "").replace(" ", "").split(","):
            if not tok:
                continue
            if tok in ("stem", "s1"):
                stages.append(-1)
            else:
                stages.append(
                    int(tok[1:]) - 2 if tok.startswith("s") else int(tok)
                )
        nl_loc = []
        for stage_loc in vid_mdl.nl.location:
            # per-pathway lists; keep as tuple-of-tuples
            nl_loc.append(tuple(tuple(p) for p in stage_loc))
        # 26 is a 1-block-per-stage bottleneck variant for fast tests
        depth_map = {26: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
        return cls(
            arch=vid_mdl.arch,
            depth_blocks=depth_map[vid_mdl.resnet.depth],
            width=vid_mdl.resnet.width_per_group,
            alpha=vid_mdl.slowfast.alpha,
            beta_inv=vid_mdl.slowfast.beta_inv,
            fusion_ratio=vid_mdl.slowfast.fusion_conv_channel_ratio,
            fusion_kernel=vid_mdl.slowfast.fusion_kernel_sz,
            spatial_strides=tuple(s[0] for s in vid_mdl.resnet.spatial_strides),
            nl_location=tuple(nl_loc),
            nl_instantiation=vid_mdl.nl.instantiation,
            zero_init_final_bn=vid_mdl.resnet.zero_init_final_bn,
            remat=remat,
            remat_stages=tuple(stages),
            bn_f32_stats=bool(bn_f32_stats),
            packed_stem_epilogue=bool(packed_stem_epilogue),
            mean=tuple(vid_mdl.mean),
            std=tuple(vid_mdl.std),
            reverse_input_channel=bool(vid_mdl.reverse_input_channel),
            dtype=dtype,
            param_dtype=param_dtype,
        )


class _PackedStemConv(nn.Module):
    """Output-packed stride-2 spatial conv for tiny C_out (the stems).

    A (kt,7,7) stride-(1,2,2) conv to 8 channels runs the 128-lane MXU at
    <10% (measured 39ms for the fast stem at 120 clips on v5e). Packing a
    gt x gh x gw block of output positions (temporal x spatial) into the
    channel dim re-expresses it as ONE plain conv with kernel
    (kt+gt-1, kh+2(gh-1), kw+2(gw-1)), strides (gt, 2gh, 2gw) and
    C_out = gt*gh*gw*F, whose weights are a zero-padded rearrangement of
    the canonical kernel:

        Wp[t+dt, h+2dh, w+2dw, ci, ((dt*gh+dh)*gw+dw)*F+f] = W[t,h,w,ci,f]

    followed by a free depth-to-space unpack. Packing redundancy is
    (kt+gt-1)(kh+2gh-2)(kw+2gw-2) / (gt*gh*gw*kt*kh*kw); for the
    SlowFast fast stem, g=(4,2,2) gives R=2.64 vs the round-2 spatial
    g=(1,4,4)'s 3.45 (measured 18.3 vs 23.0 ms at 120 clips on v5e).
    The parameter keeps the canonical nn.Conv layout ("kernel",
    (kt,kh,kw,Cin,F)) so checkpoints and converters are unchanged; the
    rearrangement is linear, so autodiff trains through it.
    """

    features: int
    kernel: Tuple[int, int, int]
    g: Any = 4  # int g == (1, g, g); or explicit (gt, gh, gw)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # False: return the packed tensor (n, t/gt, h2/gh, w2/gw, gt*gh*gw*F)
    # so the caller can run BN-affine/relu/pool in the lane-filling packed
    # layout and unpack a pooled (4x smaller) tensor instead (BENCH r4)
    unpack: bool = True

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        f = self.features
        gt, gh, gw = (
            (1, self.g, self.g) if isinstance(self.g, int) else self.g
        )
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kt, kh, kw, x.shape[-1], f),
            self.param_dtype,
        ).astype(self.dtype)
        ktp = kt + gt - 1
        khp, kwp = kh + 2 * (gh - 1), kw + 2 * (gw - 1)
        wp = jnp.zeros(
            (ktp, khp, kwp, x.shape[-1], gt * gh * gw * f), self.dtype
        )
        for dt in range(gt):
            for dh in range(gh):
                for dw in range(gw):
                    cix = ((dt * gh + dh) * gw + dw) * f
                    wp = wp.at[
                        dt : dt + kt,
                        2 * dh : 2 * dh + kh,
                        2 * dw : 2 * dw + kw,
                        :,
                        cix : cix + f,
                    ].set(w)
        n, t, h, win, ci = x.shape
        h_out, w_out = h // 2, win // 2
        # explicit padding reproduces the original SAME reads: packed
        # position m covers output rows gh*m+dh, each reading input rows
        # [2(gh*m+dh) - kh//2, ... + kh//2]
        pad_t = kt // 2
        pad_tr = max(gt * (t // gt - 1) + ktp - pad_t - t, 0)
        pad_h = kh // 2
        pad_hr = max(2 * gh * (h_out // gh - 1) + khp - pad_h - h, 0)
        pad_w = kw // 2
        pad_wr = max(2 * gw * (w_out // gw - 1) + kwp - pad_w - win, 0)
        # no preferred_element_type: match nn.Conv's dtype semantics so the
        # conv transpose (backward) sees uniform dtypes
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wp,
            window_strides=(gt, 2 * gh, 2 * gw),
            padding=((pad_t, pad_tr), (pad_h, pad_hr), (pad_w, pad_wr)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if not self.unpack:
            return y
        # depth-to-space unpack:
        # (n, t/gt, h/2gh, w/2gw, gt*gh*gw*F) -> (n, t, h/2, w/2, F)
        y = y.reshape(n, t // gt, h_out // gh, w_out // gw, gt, gh, gw, f)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return y.reshape(n, t, h_out, w_out, f)


class ConvBN(nn.Module):
    """Conv3D (channels-last) + BatchNorm + optional ReLU."""

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    relu: bool = True
    zero_init_gamma: bool = False
    cfg: VideoCfg = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        kt, kh, kw = self.kernel
        t, h, w_in = x.shape[1], x.shape[2], x.shape[3]
        # pick the packing that fills the 128 MXU lanes with the least
        # redundancy (see _PackedStemConv): temporal-first (4,2,2) for the
        # F=8 fast stem (R=2.64), spatial (1,4,4) fallback (R=3.45)
        g = None
        if self.strides == (1, 2, 2) and kh == kw == 7:
            if (
                self.features * 16 <= 128
                and t % 4 == 0
                and h % 4 == 0  # even input AND 2-divisible output rows
                and w_in % 4 == 0
            ):
                g = (4, 2, 2)
            elif self.features * 16 <= 128 and h % 8 == 0 and w_in % 8 == 0:
                g = (1, 4, 4)
            # NOT packed: the slow stem (F=64). A (1,1,2) packing (R=1.29)
            # measures 5.67 vs 6.49 ms in isolation but 641 vs 696 clips/s
            # in-model — the unpack transpose breaks BN/pool fusion.
        if g is not None:
            x = _PackedStemConv(
                self.features, (kt, kh, kw), g=g,
                dtype=c.dtype, param_dtype=c.param_dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(kt, kh, kw),
                strides=self.strides,
                padding=(
                    (kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2)
                ),
                use_bias=False,
                dtype=c.dtype,
                param_dtype=c.param_dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=c.bn_momentum,
            epsilon=c.bn_eps,
            dtype=c.dtype,
            param_dtype=c.param_dtype,
            # False: batch-stat reductions in the compute dtype (bf16)
            # instead of f32 — opt-in perf lever, see VideoCfg
            force_float32_reductions=c.bn_f32_stats,
            scale_init=(
                nn.initializers.zeros
                if self.zero_init_gamma
                else nn.initializers.ones
            ),
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class NonLocalBlock(nn.Module):
    """Non-local block (dot_product or softmax instantiation) with
    (1,2,2) max-pool subsampling on phi/g, as in the SlowFast package."""

    cfg: VideoCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        b, t, h, w, ch = x.shape
        inner = ch // 2
        # biased 1x1x1 convs, as in PySlowFast's Nonlocal (its caffe2
        # checkpoints carry *_b blobs for theta/phi/g/out)
        theta = nn.Conv(inner, (1, 1, 1), dtype=c.dtype,
                        param_dtype=c.param_dtype, name="theta")(x)
        pooled = nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        phi = nn.Conv(inner, (1, 1, 1), dtype=c.dtype,
                      param_dtype=c.param_dtype, name="phi")(pooled)
        g = nn.Conv(inner, (1, 1, 1), dtype=c.dtype,
                    param_dtype=c.param_dtype, name="g")(pooled)

        q = theta.reshape(b, -1, inner)
        k = phi.reshape(b, -1, inner)
        v = g.reshape(b, -1, inner)
        from ..ops.attention import nonlocal_attention

        out = nonlocal_attention(
            q, k, v, kind=c.nl_instantiation, scale=float(inner) ** -0.5
        ).astype(c.dtype).reshape(b, t, h, w, inner)
        out = nn.Conv(ch, (1, 1, 1), dtype=c.dtype,
                      param_dtype=c.param_dtype, name="out")(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=c.bn_momentum,
            epsilon=c.bn_eps, dtype=c.dtype, param_dtype=c.param_dtype,
            scale_init=nn.initializers.zeros, name="bn",
        )(out)
        return x + out


class Bottleneck(nn.Module):
    """1x1x1(temp) -> 1x3x3(stride) -> 1x1x1 with residual.

    A pallas fused single-VMEM-pass variant of the temporal-kernel-1
    stride-1 case exists as a gate-only probe
    (benchmarks/probe_fused_bottleneck.py): it moves ~2.5x fewer HBM
    bytes but loses in-model on current stacks (pallas DMA floor); gate
    1 of `python bench.py gates` re-measures the flip condition each
    round. No config flag routes to it.
    """

    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int
    cfg: VideoCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        needs_proj = (x.shape[-1] != self.dim_out) or (self.spatial_stride != 1)
        mods = {
            "a": ConvBN(self.dim_inner, (self.temp_kernel, 1, 1), cfg=c,
                        name="a"),
            "b": ConvBN(self.dim_inner, (1, 3, 3),
                        strides=(1, self.spatial_stride, self.spatial_stride),
                        cfg=c, name="b"),
            "c": ConvBN(self.dim_out, (1, 1, 1), relu=False,
                        zero_init_gamma=c.zero_init_final_bn, cfg=c,
                        name="c"),
        }
        if needs_proj:
            mods["proj"] = ConvBN(
                self.dim_out, (1, 1, 1),
                strides=(1, self.spatial_stride, self.spatial_stride),
                relu=False, cfg=c, name="proj",
            )
        residual = x
        if needs_proj:
            residual = mods["proj"](x, train)
        y = mods["a"](x, train)
        y = mods["b"](y, train)
        y = mods["c"](y, train)
        return nn.relu(residual + y)


class ResStage(nn.Module):
    n_blocks: int
    dim_out: int
    dim_inner: int
    temp_kernels: Tuple[int, ...]  # tiled across blocks (PySlowFast)
    spatial_stride: int
    nl_blocks: Tuple[int, ...]
    cfg: VideoCfg
    stage_idx: int = -1  # 0..3 = s2..s5, for cfg.remat_stages

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,))
            if self.cfg.remat or self.stage_idx in self.cfg.remat_stages
            else Bottleneck
        )
        for i in range(self.n_blocks):
            x = block_cls(
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel=self.temp_kernels[i % len(self.temp_kernels)],
                spatial_stride=self.spatial_stride if i == 0 else 1,
                cfg=self.cfg,
                name=f"block_{i}",
            )(x, train)
            if i in self.nl_blocks:
                x = NonLocalBlock(self.cfg, name=f"nl_{i}")(x, train)
        return x


class Stem(nn.Module):
    """Stem conv + BN + relu + (1,3,3) s(1,2,2) max pool.

    At inference, when ConvBN would choose the (4,2,2) packed stem conv
    (the F=8 fast stem), the whole epilogue runs in the PACKED layout
    (``_packed_epilogue``): BN-affine and relu at full 128 lanes fused
    into the conv, and the pool as shifted maxes that consume the packed
    dh/dw axes — so only the pooled, 4x smaller tensor pays the
    depth-to-space unpack. Bit-exact vs the unpacked chain (affine and
    max are elementwise; benchmarks/micro23: 28.4 -> 25.5 ms at
    120 clips on v5e)."""

    width: int
    temp_kernel: int
    cfg: VideoCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        conv_bn = ConvBN(
            self.width, (self.temp_kernel, 7, 7), strides=(1, 2, 2),
            cfg=c, name="conv",
        )
        t, h, w_in = x.shape[1], x.shape[2], x.shape[3]
        # must mirror ConvBN's g=(4,2,2) packing condition exactly
        use_packed_epi = (
            c.packed_stem_epilogue
            and not train
            and self.width * 16 <= 128
            and t % 4 == 0
            and h % 4 == 0
            and w_in % 4 == 0
            and not self.is_initializing()
        )
        if use_packed_epi:
            return self._packed_epilogue(x, conv_bn)
        x = conv_bn(x, train)
        x = nn.max_pool(
            x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
        )
        return x

    def _packed_epilogue(self, x, mod):
        c = self.cfg
        f = self.width
        # 1-pixel-scale dummy call declares the identical param tree
        # as the plain (unpacked) stem path
        mod(jnp.zeros((1, 4, 8, 8, x.shape[-1]), c.dtype), train=False)
        v = mod.variables
        y = _PackedStemConv(
            f, (self.temp_kernel, 7, 7), g=(4, 2, 2), dtype=c.dtype,
            param_dtype=c.param_dtype, unpack=False,
        ).apply({"params": {"kernel": v["params"]["conv"]["kernel"]}}, x)
        # flax _normalize inference arithmetic (f32 stats/params, cast at
        # the end), tiled over the 16 packed (dt,dh,dw) blocks
        mean = v["batch_stats"]["bn"]["mean"]
        mul = (
            jax.lax.rsqrt(v["batch_stats"]["bn"]["var"] + c.bn_eps)
            * v["params"]["bn"]["scale"]
        )
        bias = v["params"]["bn"]["bias"]
        y = (y - jnp.tile(mean, 16)) * jnp.tile(mul, 16) + jnp.tile(bias, 16)
        y = nn.relu(y.astype(c.dtype))
        # pool: unpacked h = 2*hb + dh  =>  out[i] = max(y[2i-1], y[2i],
        # y[2i+1]) = max(shift(y[dh=1])[i], y[dh=0][i], y[dh=1][i]);
        # same for w — consumes dh/dw, leaving a dt-only unpack
        n, tb, hb, wb, _ = y.shape
        y = y.reshape(n, tb, hb, wb, 4, 2, 2, f)
        neg = jnp.asarray(-jnp.inf, y.dtype)
        a, b = y[:, :, :, :, :, 0], y[:, :, :, :, :, 1]
        b_up = jnp.concatenate(
            [jnp.full_like(b[:, :, :1], neg), b[:, :, :-1]], axis=2
        )
        y = jnp.maximum(jnp.maximum(a, b), b_up)  # (n,tb,hb,wb,4,2,f)
        a, b = y[..., 0, :], y[..., 1, :]
        b_left = jnp.concatenate(
            [jnp.full_like(b[:, :, :, :1], neg), b[:, :, :, :-1]], axis=3
        )
        y = jnp.maximum(jnp.maximum(a, b), b_left)  # (n,tb,hb,wb,4,f)
        return y.transpose(0, 1, 4, 2, 3, 5).reshape(n, tb * 4, hb, wb, f)


class FuseFastToSlow(nn.Module):
    """Lateral connection: time-strided conv on fast, concat to slow."""

    fast_channels: int
    cfg: VideoCfg

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        c = self.cfg
        fuse = ConvBN(
            self.fast_channels * c.fusion_ratio,
            (c.fusion_kernel, 1, 1),
            strides=(c.alpha, 1, 1),
            cfg=c,
            name="conv_f2s",
        )(fast, train)
        return jnp.concatenate([slow, fuse], axis=-1), fast


def _nl_for(cfg: VideoCfg, stage: int, pathway: int) -> Tuple[int, ...]:
    loc = cfg.nl_location
    if stage < len(loc) and pathway < len(loc[stage]):
        return tuple(loc[stage][pathway])
    return ()


class SlowFastBackbone(nn.Module):
    """Dual-pathway backbone. forward_features mirrors
    SlowFast_FeatModel.forward_features (mdl_sf_base.py:21-34).

    ``num_stages`` truncates the residual stages (profiling aid)."""

    cfg: VideoCfg
    num_stages: int = 4

    @nn.compact
    def __call__(self, slow, fast, train: bool = False):
        c = self.cfg
        w = c.width                      # 64
        wf = w // c.beta_inv             # 8
        tk_s = TEMPORAL_KERNELS["slowfast"]["slow"]
        tk_f = TEMPORAL_KERNELS["slowfast"]["fast"]

        stem_cls = (
            nn.remat(Stem, static_argnums=(2,))
            if -1 in c.remat_stages else Stem
        )
        slow = stem_cls(w, tk_s[0][0], c, name="s1_slow")(slow, train)
        fast = stem_cls(wf, tk_f[0][0], c, name="s1_fast")(fast, train)
        slow, fast = FuseFastToSlow(wf, c, name="s1_fuse")(slow, fast, train)

        outs_s = [256, 512, 1024, 2048]
        inner_s = [64, 128, 256, 512]
        for i in range(self.num_stages):
            slow = ResStage(
                c.depth_blocks[i], outs_s[i], inner_s[i], tk_s[i + 1],
                c.spatial_strides[i], _nl_for(c, i, 0), c, stage_idx=i,
                name=f"s{i + 2}_slow",
            )(slow, train)
            fast = ResStage(
                c.depth_blocks[i], outs_s[i] // c.beta_inv,
                inner_s[i] // c.beta_inv, tk_f[i + 1],
                c.spatial_strides[i], _nl_for(c, i, 1), c, stage_idx=i,
                name=f"s{i + 2}_fast",
            )(fast, train)
            if i < 3:  # fuse after s2, s3, s4
                slow, fast = FuseFastToSlow(
                    outs_s[i] // c.beta_inv, c, name=f"s{i + 2}_fuse"
                )(slow, fast, train)
        return slow, fast


class ResNet3DBackbone(nn.Module):
    """Single-pathway backbone (c2d / i3d / slow variants)."""

    cfg: VideoCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        tk = TEMPORAL_KERNELS[c.arch]["fast"]
        stem_cls = (
            nn.remat(Stem, static_argnums=(2,))
            if -1 in c.remat_stages else Stem
        )
        x = stem_cls(c.width, tk[0][0], c, name="s1")(x, train)
        tpool = TEMPORAL_POOL[c.arch]
        outs = [256, 512, 1024, 2048]
        inner = [64, 128, 256, 512]
        for i in range(4):
            x = ResStage(
                c.depth_blocks[i], outs[i], inner[i], tk[i + 1],
                c.spatial_strides[i], _nl_for(c, i, 0), c, stage_idx=i,
                name=f"s{i + 2}",
            )(x, train)
            if i == 0 and tpool > 1:
                x = nn.max_pool(x, (tpool, 1, 1), strides=(tpool, 1, 1))
        return x


def trimmed_head(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-pathway global average pool + channel concat
    (ResNetBasicHead_Trimmed, mdl_sf_base.py:65-113). (B,T,H,W,C)->(B,C)."""
    pooled = [f.mean(axis=(1, 2, 3)) for f in feats]
    return jnp.concatenate(pooled, axis=-1)


def backbone_out_dim(c: "VideoCfg") -> int:
    """Channel dim of trimmed_head's output for a VideoCfg (2304 for
    slowfast-R50, 2048 single-pathway — ref get_head_dim sniffing,
    mdl_sf_base.py:751-760)."""
    w = c.width * 32
    if c.arch == "slowfast":
        return w + w // c.beta_inv
    return w
