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
    r, f = x.shape
    assert f % 128 == 0, f
    # (R, F/128, 128): last dim fills the 128 lanes, middle the sublanes
    x3 = x.reshape(r, f // 128, 128)
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r,),
            in_specs=[
                pl.BlockSpec(
                    (1, f // 128, 128), lambda i, idx: (idx[i], 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, f // 128, 128), lambda i, idx: (i, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=interpret,
    )(src_rows.astype(jnp.int32), x3)
    return out.reshape(r, f)
