"""Pallas row-select kernel for the beam-search KV-cache reorder.

GATE-ONLY PROBE — not importable from ``vidsitu_tpu``. The kernel was
EVICTED from the package in round 5: a whole-program XLA
buffer-assignment interaction on the 2026-08 axon stacks corrupts one
of six compared in-model compilations despite the kernel being
bit-exact standalone (full receipts: BENCH.md "pallas beam gather
layout hazard"), and a shipping package must contain no flag that can
produce known-wrong tokens. The per-round stack gate
(`python bench.py gates` -> benchmarks/micro14_beam_gather_ab.py)
monkeypatches ``vidsitu_tpu.gen.beam._gather_beams`` with
``pallas_gather_beams`` below and re-runs the six-program A/B on each
new stack; should a future stack PASS, re-landing is a deliberate
code change, not an env flip.

``beam_gather_rows(x, src_rows)``: out[r] = x[src_rows[r]] for a 2-D
``x (R, F)`` — the per-step cache reorder of beam search
(gen/beam._gather_beams). The scalar-prefetched source indices drive the
automatic pipeline's input DMA via the BlockSpec index_map, so each grid
step streams one dynamically-selected row HBM->VMEM->HBM double-buffered
at the pallas DMA floor (~413 GB/s on this stack, BENCH.md). It measured
33.6 vs 39.2 ms/video beam-5 where it worked, and is obsolete on the
default path anyway — ancestry decode (cfg.tpu.ancestry_beam) removed
the per-step cache reorder entirely. Off-TPU the kernel self-selects
interpret mode so forced-on CPU runs (tests, virtual meshes) execute
the same routing.
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
    """out[r] = x[src_rows[r]]; x (R, F) with F % 128 == 0 AND
    F >= 1024 (the M = F/128 >= 8 layout-hazard floor enforced by
    beam_gather_rows_multi — smaller rows get XLA's narrow T(1,128)
    tiling that Mosaic mis-reads); any float dtype; src_rows (R,)
    int32."""
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
    if not interpret and jax.default_backend() != "tpu":
        # no Mosaic off-TPU; interpret mode keeps forced-on CPU runs
        # (tests, virtual-device meshes) on the same code path
        interpret = True
    r = xs[0].shape[0]
    shaped = []
    for x in xs:
        f = x.shape[1]
        m = f // 128
        # LAYOUT HAZARD (BENCH.md round 3): the (R, M, 128) operand gets
        # XLA's default T(8,128) tiling only when padding M up to 8 rows
        # is not wasteful. For M < 8 XLA picks a narrower tiling (T(1,128)
        # observed at M == 1) that Mosaic does not expect — producing
        # REAL value corruption in-model (28/8040 decode tokens). M >= 8
        # keeps the pad waste under 1/8 x, for which XLA retains the
        # default tiling (verified in compiled HLO). Callers must route
        # smaller leaves elsewhere (gen/beam routes them to the exact
        # one-hot dot gather).
        assert x.shape[0] == r and f % 128 == 0 and m >= 8, x.shape
        # (R, M, 128): last dim fills the 128 lanes
        shaped.append(x.reshape(r, m, 128))
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


def pallas_gather_beams(tree, beam_idx, batch: int, beam: int, fallback):
    """The evicted in-package routing, reconstructed probe-side: one
    pallas_call over ALL eligible float leaves (each grid step DMAs one
    row of every leaf, raising the per-step transfer size — the limiter
    of the row-DMA kernel); ineligible leaves go to ``fallback`` (the
    package's exact one-hot-dot ``_gather_beams``, captured BEFORE the
    monkeypatch). The gate installs this as
    ``vidsitu_tpu.gen.beam._gather_beams`` to rebuild the historical
    hazard-sensitive programs exactly (micro14)."""
    src_rows = (
        jnp.arange(batch, dtype=jnp.int32)[:, None] * beam + beam_idx
    ).reshape(-1)
    leaves, treedef = jax.tree.flatten(tree)
    ok = [
        i for i, leaf in enumerate(leaves)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
        and (leaf.size // (batch * beam)) % 128 == 0
        # rows must span >= 8 of the kernel's 128-lane tiles: smaller
        # leaves get non-default XLA tilings that corrupt under Mosaic
        # (layout hazard above) — they stay on the exact dot path
        and (leaf.size // (batch * beam)) // 128 >= 8
    ]
    done = {}
    if ok:
        ins = [leaves[i].reshape(batch * beam, -1) for i in ok]
        outs = beam_gather_rows_multi(ins, src_rows)
        done = {
            id(leaves[i]): o.reshape(leaves[i].shape)
            for i, o in zip(ok, outs)
        }

    def gather(x):
        if id(x) in done:
            return done[id(x)]
        return fallback(x, beam_idx, batch, beam)

    return jax.tree.map(gather, tree)
