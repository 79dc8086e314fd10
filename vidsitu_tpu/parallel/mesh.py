"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP runtime
(utils/trn_dist_utils.py, trn_utils.py:44-129): a data-parallel
``jax.sharding.Mesh`` over all devices; parameters replicated; the batch
sharded on the ``data`` axis. Gradient all-reduce is inserted by XLA
from the shardings (no explicit collectives needed in the step), riding
ICI intra-slice / DCN across hosts.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build the mesh from cfg.tpu (default: 1-D data mesh over all
    devices)."""
    devices = devices if devices is not None else jax.devices()
    axis_names = tuple(cfg.tpu.mesh_axis_names) if cfg is not None else ("data",)
    shape = list(cfg.tpu.mesh_shape) if cfg is not None else [-1]
    n = len(devices)
    fixed = int(np.prod([s for s in shape if s != -1])) if shape else 1
    shape = [n // fixed if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    if len(shape) > 1:
        # topology-aware placement for multi-axis meshes: a naive
        # reshape of jax.devices() (device-id order) can spread a
        # model/fsdp axis across non-adjacent chips or DCN;
        # create_device_mesh assigns ICI-contiguous rings per axis so
        # TP all-reduces and FSDP all-gathers ride ICI. Fall back to
        # the reshape when the topology solver rejects the shape
        # (numerically equivalent either way — GSPMD).
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                shape, devices=devices
            )
        except Exception:
            dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Batch sharding: the leading axis splits over BOTH the 'data' and
    'fsdp' mesh axes ('model' stays replicated — TP shards weights, not
    examples). fsdp is a subdivision of data parallelism (ZeRO), so the
    effective DP degree is data*fsdp; sharding the batch over 'data'
    alone would make every fsdp peer recompute the same examples."""
    axes = tuple(a for a in mesh.axis_names if a in ("data", "fsdp"))
    return NamedSharding(mesh, P(axes))


def data_extent(mesh: Mesh) -> int:
    """How many ways the batch axis is split: the product of the
    'data' and 'fsdp' mesh extents ('model' shards weights/heads, not
    examples — see data_sharded). The batch-size divisibility
    requirement is against THIS, not the total device count."""
    n = 1
    for a in mesh.axis_names:
        if a in ("data", "fsdp"):
            n *= int(mesh.shape[a])
    return n


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    """Host batch -> device arrays sharded along the data axis.

    Single process: a plain sharded device_put. Multi-process: each host
    holds only ITS loader shard of the global batch, so the global array
    is assembled from process-local data (the jax analog of
    DistributedSampler feeding DDP ranks)."""
    sh = data_sharded(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


_QKV_RE = re.compile(r"(q|k|v)_proj")


def tp_spec(path: str, shape, n: int, axis: str = "model") -> Optional[P]:
    """Megatron-style tensor-parallel PartitionSpec for one transformer
    parameter, or None if the leaf is not TP-shardable.

    The flax transformer family (models/transformer.py — decoder,
    encoder, rel_transformer share its layer modules) exposes the
    canonical Megatron split points by name:

      * ``{q,k,v}_proj/kernel (d, H, dh)`` — column-parallel: shard the
        HEAD axis; each shard computes its heads' attention outputs
        independently;
      * ``out_proj/kernel (H, dh, d)`` — row-parallel: shard the head
        axis of the input; XLA inserts the forward all-reduce over
        ``model`` (its bias stays replicated, added after the reduce);
      * ``ffn/fc1/kernel (d, ffn)`` column-parallel, ``ffn/fc2/kernel
        (ffn, d)`` row-parallel — the hidden dim never materializes
        unsharded.

    Everything else (LayerNorms, embeddings, non-transformer modules)
    returns None and falls through to the fsdp/replicated rule. GSPMD
    guarantees any sharding is numerically equivalent, so a miss is a
    performance choice, never a correctness one.
    """
    if path.endswith("kernel"):
        if _QKV_RE.search(path) and len(shape) == 3 and shape[1] % n == 0:
            return P(None, axis, None)
        if "out_proj" in path and len(shape) == 3 and shape[0] % n == 0:
            return P(axis, None, None)
        if "fc1" in path and len(shape) == 2 and shape[1] % n == 0:
            return P(None, axis)
        if "fc2" in path and len(shape) == 2 and shape[0] % n == 0:
            return P(axis, None)
    elif path.endswith("bias"):
        if _QKV_RE.search(path) and len(shape) == 2 and shape[0] % n == 0:
            return P(axis, None)
        if "fc1" in path and len(shape) == 1 and shape[0] % n == 0:
            return P(axis)
        # out_proj / fc2 biases: replicated (added after the all-reduce)
    return None


def _leaf_path_str(path) -> str:
    """KeyPath -> 'a/b/c' (works for dict keys, attrs, sequence ixs —
    optimizer-state trees prefix the param tree with .mu/.nu etc., so
    rules match on SUFFIX substrings)."""
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name",
                                                   getattr(k, "idx", k)))))
    return "/".join(parts)


def param_shardings(
    mesh: Mesh, tree: Any, axis: str = "fsdp", tp_axis: str = "model"
) -> Any:
    """Per-leaf parameter shardings: tensor parallelism + ZeRO-3 FSDP.

    With a ``model`` axis in the mesh (cfg.tpu.mesh_shape [-1, N] +
    mesh_axis_names ['data','model']), transformer parameters matching
    the Megatron split points (see ``tp_spec``) are tensor-parallel;
    with an ``fsdp`` axis, every remaining parameter (and its optimizer
    moments, which share shapes and path suffixes) is sharded along its
    largest axis-divisible dimension — XLA inserts the all-gathers
    before use and reduce-scatters on the gradients. Both axes may
    coexist (['data','model','fsdp']): TP leaves stay 1-D-sharded on
    ``model``, the rest shard on ``fsdp``. Leaves with no divisible
    dimension and scalars stay replicated. With neither axis this is
    all-replicated (plain DP).
    """
    repl = replicated(mesh)
    has_tp = tp_axis in mesh.axis_names and int(mesh.shape[tp_axis]) > 1
    has_fsdp = axis in mesh.axis_names and int(mesh.shape[axis]) > 1
    if not has_tp and not has_fsdp:
        return jax.tree.map(lambda _: repl, tree)
    n_tp = int(mesh.shape[tp_axis]) if has_tp else 0
    n = int(mesh.shape[axis]) if has_fsdp else 0

    def rule(path, x):
        shape = getattr(x, "shape", ())
        if has_tp:
            spec = tp_spec(_leaf_path_str(path), shape, n_tp, tp_axis)
            if spec is not None:
                return NamedSharding(mesh, spec)
        if not has_fsdp:
            return repl
        best_s, best_d = 0, -1
        for d, s in enumerate(shape):
            if s % n == 0 and s > best_s:
                best_s, best_d = s, d
        if best_d < 0 or best_s < n:
            return repl
        spec = [None] * len(shape)
        spec[best_d] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, tree)


def globalize_replicated(tree: Any, mesh: Mesh) -> Any:
    """Make every leaf a REPLICATED global array across all processes.

    Multi-process jit with replicated in_shardings cannot consume
    host-local arrays; each process holds an identical full copy (same
    init seed / same restored checkpoint), which
    host_local_array_to_global_array with P() lifts to one global
    replicated array. Leaves that are already global pass through.
    Single-process: identity."""
    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils as mhu

    def lift(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return mhu.host_local_array_to_global_array(
            np.asarray(x), mesh, P()
        )

    return jax.tree.map(lift, tree)


def maybe_shard_jit(fn, mesh: Mesh = None):
    """jit a (params_tree, batch) -> out fn; with a populated mesh the
    batch is sharded on the data axis, otherwise a plain jit. The single
    home of the eval-path sharding policy.

    Params keep the caller's shardings (None = inherit): after training
    on an fsdp/tensor-parallel mesh the variables arrive sharded, and
    pinning replicated in_shardings would make jit reject them — eval
    simply computes with whatever layout training left (GSPMD guarantees
    equivalence). Multi-process: params must be pre-globalized replicated
    (globalize_replicated), so they are pinned, and outputs are
    replicated so every host can read them with np.asarray (a sharded
    global array is not fully addressable from one host)."""
    if mesh is None or int(mesh.devices.size) <= 1:
        return jax.jit(fn)
    kwargs = {}
    p_in = None  # inherit the caller's param shardings
    if jax.process_count() > 1:
        kwargs["out_shardings"] = replicated(mesh)
        p_in = replicated(mesh)
    return jax.jit(
        fn, in_shardings=(p_in, data_sharded(mesh)), **kwargs
    )


def to_device(batch: Dict[str, np.ndarray], mesh: Mesh = None):
    """Host batch -> device arrays, data-sharded when a populated mesh is
    given."""
    import jax.numpy as jnp

    if mesh is not None and int(mesh.devices.size) > 1:
        return shard_batch(batch, mesh)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def prefetch_to_device(batches, mesh: Mesh, lookahead: int = 1):
    """Iterate host batches with their device transfer started
    ``lookahead`` steps early (device_put is async), overlapping
    host->device copies of batch k+1 with the compute of batch k."""
    from collections import deque

    buf = deque()
    for batch in batches:
        buf.append(shard_batch(batch, mesh))
        if len(buf) > lookahead:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
