"""Pallas fused bottleneck block for inference (slow-pathway s2/s3).

GATE-ONLY PROBE — not importable from ``vidsitu_tpu``. The kernel was
EVICTED from the package in round 5: it is exact (tests drive it
against the package's unfused Bottleneck via ``run_fused_block``) but
permanently unprofitable on current stacks (the pallas pipeline DMA
floor, ~273-413 GB/s, sits far below the ~550 GB/s it needs — gate 1
of `python bench.py gates` re-measures the floor each round). Should
the floor ever cross, re-landing an in-model path is a deliberate code
change; until then no config flag routes to it.

One VMEM pass computes relu(x + c(relu(b(relu(a(x)))))) for a ResNet
bottleneck whose convs are 1x1x1 -> 1x3x3(stride 1) -> 1x1x1 with
BatchNorm folded into the weights (inference). The temporal kernel is 1
(SlowFast slow pathway, stages s2/s3), so each (n, t) frame is
independent: the grid runs one whole frame per step and the 3x3 SAME
padding falls on true image borders — no halo exchange at all.

The traffic math favors fusion — the unfused chain materializes every
intermediate in HBM (~4.6-7.3 GB/block for slow s2 at 120 clips) vs the
fused pass's read-x-once/write-out-once (~2-3.1 GB) — but MEASURED on
v5e (round 2) the kernel LOSES in-model: 650 vs 696 clips/s with the
full featext bench. Two causes, both measured in isolation (tmp/micro4):
(a) the pallas pipeline DMA floor is ~410 GB/s vs XLA's ~700 GB/s
elementwise, capping the best case at ~1.4x; and (b) per-frame Mosaic
compute (small K=64 matmuls + 9 tap shifts, tried both as pad+slice
relayouts, 15.5 ms/block, and as one matmul + f32 pltpu.roll + mask,
17.2 ms/block) runs ~2x above the 7.5 ms DMA floor instead of hiding
under it, while XLA's in-model unfused chain is ~10.7 ms/block.
Correctness is tested (tests/test_fused_bottleneck.py drives
``run_fused_block`` against the package's unfused Bottleneck).

Reference behavior: SlowFast bottleneck residual stages
(mdl_sf_base.py:20-42 wraps the SlowFast package's ResStage).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
            wp_ref, bp_ref, o_ref, *, has_proj: bool):
    x = x_ref[0]                       # (H, W, Cin)
    h, w, cin = x.shape
    cmid = wa_ref.shape[1]
    cout = wc_ref.shape[1]
    hw = h * w
    xf = x.reshape(hw, cin)

    # a: 1x1 conv + folded BN + relu
    h1 = jnp.dot(xf, wa_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + ba_ref[:], 0.0).astype(x.dtype)

    # b: 3x3 SAME conv + folded BN + relu. ONE matmul against the
    # tap-concatenated kernel (Cmid, 9*Cmid), then each tap's slab is
    # circularly rolled to its output offset in the flat (row-major)
    # index and border-masked. A flat roll by (dh*w + dw) IS the 2D
    # shift except where the source row/col leaves the frame — exactly
    # what the mask zeroes — so SAME zero padding is reproduced without
    # materializing a padded tile (pad+slice+reshape relayouts measured
    # ~2x slower than roll+mask on v5e).
    ridx = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    row = ridx // w
    col = ridx - row * w
    acc = jnp.broadcast_to(bb_ref[:], (hw, cmid)).astype(jnp.float32)
    # the matmul runs per kh-row of taps (3 at a time): the full 9-tap
    # f32 product (HW, 9*Cmid) alone would be 7.2MB of VMEM at slow-s2
    # geometry, and Mosaic requires 32-bit matmul accumulators
    for dh in range(-1, 2):
        pg = jnp.dot(
            h1, wb_ref[:, (dh + 1) * 3 * cmid:(dh + 2) * 3 * cmid],
            preferred_element_type=jnp.float32,
        )
        for dw in range(-1, 2):
            off = dh * w + dw
            pt = pg[:, (dw + 1) * cmid:(dw + 2) * cmid]
            if off:
                # flat roll by the output offset (f32: Mosaic's rotate
                # requires 32-bit data)
                pt = pltpu.roll(pt, -off % hw, axis=0)
            mask = (
                (row + dh >= 0) & (row + dh < h)
                & (col + dw >= 0) & (col + dw < w)
            )
            acc = acc + jnp.where(mask, pt, 0)
    h2 = jnp.maximum(acc, 0.0).astype(x.dtype)

    # c: 1x1 conv + folded BN (zero-init-gamma folds in naturally)
    y = jnp.dot(h2, wc_ref[:], preferred_element_type=jnp.float32)
    y = y + bc_ref[:]

    # residual (+ optional folded 1x1 projection), final relu
    if has_proj:
        res = jnp.dot(xf, wp_ref[:], preferred_element_type=jnp.float32)
        res = res + bp_ref[:]
    else:
        res = xf.astype(jnp.float32)
    o_ref[0] = jnp.maximum(y + res, 0.0).astype(x.dtype).reshape(h, w, cout)


def fused_bottleneck_frames(
    x: jnp.ndarray,
    wa: jnp.ndarray, ba: jnp.ndarray,
    wb: jnp.ndarray, bb: jnp.ndarray,
    wc: jnp.ndarray, bc: jnp.ndarray,
    wp: Optional[jnp.ndarray] = None, bp: Optional[jnp.ndarray] = None,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(x + BNc(c(relu(BNb(b(relu(BNa(a(x)))))))) per frame.

    x: (B, H, W, Cin) — caller merges (N, T) into B (temporal kernel 1).
    wa (Cin, Cmid), wb (3, 3, Cmid, Cmid), wc (Cmid, Cout) with the BN
    scale folded in; ba/bb/bc (1, C*) the folded BN shifts. wp/bp: the
    optional 1x1 residual projection (required iff Cin != Cout).
    """
    if not interpret and jax.default_backend() != "tpu":
        # compiled Mosaic kernels need a real TPU; anywhere else
        # (CPU tests, virtual-device meshes) runs interpreted
        interpret = True
    b, h, w, cin = x.shape
    cout = wc.shape[1]
    cmid = wa.shape[1]
    # tap-concatenate the 3x3 kernel for the kernel's single-matmul form:
    # (3, 3, Cmid, Cmid) -> (Cmid, 9*Cmid), slab t = kh*3 + kw
    wb = wb.transpose(2, 0, 1, 3).reshape(cmid, 9 * cmid)
    has_proj = wp is not None
    if not has_proj:
        assert cin == cout, (cin, cout)
        # dummies keep one kernel signature (never read)
        wp = jnp.zeros((1, 1), x.dtype)
        bp = jnp.zeros((1, 1), x.dtype)

    def full(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(_kernel, has_proj=has_proj),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wa.shape), full(ba.shape), full(wb.shape), full(bb.shape),
            full(wc.shape), full(bc.shape), full(wp.shape), full(bp.shape),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wa, ba, wb, bb, wc, bc, wp, bp)


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float):
    """Fold inference BatchNorm into a conv: returns (W', b') with
    W'[..., o] = W[..., o] * s[o], b' = bias - mean * s,
    s = scale / sqrt(var + eps)."""
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s, (bias - mean * s)


def run_fused_block(variables, x, dim_inner: int, dim_out: int,
                    bn_eps: float = 1e-5, *, dtype=jnp.float32,
                    interpret: bool = False):
    """Drive the fused kernel from a package ``Bottleneck``'s variables
    (the evicted in-model fold path, reconstructed probe-side): reads
    the a/b/c (+ optional proj) ConvBN params + batch stats from
    ``variables``, folds BN into the weights, and runs ONE VMEM pass
    over the frames. x: (N, T, H, W, Cin); temporal kernel must be 1 and
    spatial stride 1 (the kernel's contract)."""
    params, stats = variables["params"], variables["batch_stats"]

    def folded(name):
        k = params[name]["conv"]["kernel"].astype(jnp.float32)
        w, b = fold_conv_bn(
            k,
            params[name]["bn"]["scale"].astype(jnp.float32),
            params[name]["bn"]["bias"].astype(jnp.float32),
            stats[name]["bn"]["mean"].astype(jnp.float32),
            stats[name]["bn"]["var"].astype(jnp.float32),
            bn_eps,
        )
        return w, b.reshape(1, -1).astype(jnp.float32)

    cin = x.shape[-1]
    wa, ba = folded("a")
    wb, bb = folded("b")
    wc, bc = folded("c")
    wp = bp = None
    if "proj" in params:
        wp, bp = folded("proj")
        wp = wp.reshape(cin, dim_out).astype(dtype)
    n, t, h, w_sp, _ = x.shape
    y = fused_bottleneck_frames(
        x.reshape(n * t, h, w_sp, cin).astype(dtype),
        wa.reshape(cin, dim_inner).astype(dtype), ba,
        wb.reshape(3, 3, dim_inner, dim_inner).astype(dtype), bb,
        wc.reshape(dim_inner, dim_out).astype(dtype), bc,
        wp, bp,
        interpret=interpret,
    )
    return y.reshape(n, t, h, w_sp, dim_out)
