"""Pallas row-select kernel for the beam-search KV-cache reorder.

``beam_gather_rows(x, src_rows)``: out[r] = x[src_rows[r]] for a 2-D
``x (R, F)`` — the per-step cache reorder of beam search
(gen/beam._gather_beams). The scalar-prefetched source indices drive the
automatic pipeline's input DMA via the BlockSpec index_map, so each grid
step streams one dynamically-selected row HBM->VMEM->HBM double-buffered
at the pallas DMA floor (~413 GB/s on this stack, BENCH.md).

Shipped OFF by default: the one-hot matmul gather in gen/beam.py is the
production path (in-model A/B receipts in BENCH.md round 3); set
``VIDSITU_PALLAS_BEAM_GATHER=1`` to route float leaves here for
re-measurement on future stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, x_ref, o_ref):
    del idx_ref  # consumed by the index_map
    o_ref[...] = x_ref[...]


def beam_gather_rows(
    x: jnp.ndarray, src_rows: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """out[r] = x[src_rows[r]]; x (R, F) with F % 128 == 0, any float
    dtype; src_rows (R,) int32."""
    return beam_gather_rows_multi([x], src_rows, interpret=interpret)[0]


def _multi_copy_kernel(n: int):
    def kernel(idx_ref, *refs):
        del idx_ref
        for xr, orr in zip(refs[:n], refs[n:]):
            orr[...] = xr[...]

    return kernel


def beam_gather_rows_multi(
    xs, src_rows: jnp.ndarray, interpret: bool = False
):
    """Gather the SAME source rows from several arrays in one
    pallas_call: each grid step issues one DMA per array, so the
    pipeline moves n_arrays x row_bytes per step instead of one small
    row (the per-row transfer size is what limits this kernel vs the
    ~413 GB/s pipeline floor). All xs share leading dim R; every
    feature size must be a multiple of 128."""
    r = xs[0].shape[0]
    shaped = []
    for x in xs:
        f = x.shape[1]
        assert x.shape[0] == r and f % 128 == 0, x.shape
        # (R, F/128, 128): last dim fills the 128 lanes
        shaped.append(x.reshape(r, f // 128, 128))
    outs = pl.pallas_call(
        _multi_copy_kernel(len(xs)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r,),
            in_specs=[
                pl.BlockSpec(
                    (1, x3.shape[1], 128), lambda i, idx: (idx[i], 0, 0)
                )
                for x3 in shaped
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, x3.shape[1], 128), lambda i, idx: (i, 0, 0)
                )
                for x3 in shaped
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(x3.shape, x3.dtype) for x3 in shaped
        ],
        interpret=interpret,
    )(src_rows.astype(jnp.int32), *shaped)
    return [o.reshape(x.shape) for o, x in zip(outs, xs)]
