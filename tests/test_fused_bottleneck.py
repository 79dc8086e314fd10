"""Gate-only fused-bottleneck probe (benchmarks/probe_fused_bottleneck)
== the package's unfused flax Bottleneck, in interpret mode on CPU.

The kernel was evicted from the package in round 5 (no config flag
routes to it — it is exact but unprofitable under the pallas DMA floor,
gate 1 of `python bench.py gates`); these tests keep the probe honest
so the gate's flip decision stays meaningful.
"""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.models.video_backbone import Bottleneck, VideoCfg

_spec = importlib.util.spec_from_file_location(
    "probe_fused_bottleneck",
    Path(__file__).resolve().parent.parent
    / "benchmarks" / "probe_fused_bottleneck.py",
)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


def _block_and_vars(needs_proj: bool, seed: int = 0):
    cfg = VideoCfg(
        dtype=jnp.float32, param_dtype=jnp.float32, zero_init_final_bn=False
    )
    cin = 24 if needs_proj else 32
    blk = Bottleneck(
        dim_out=32, dim_inner=16, temp_kernel=1, spatial_stride=1, cfg=cfg
    )
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 2, 8, 8, cin))
    v = blk.init(jax.random.PRNGKey(seed + 1), x)
    # non-trivial BN stats so folding is actually exercised
    stats = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size,
        v["batch_stats"],
    )
    return blk, {"params": v["params"], "batch_stats": stats}, x


@pytest.mark.parametrize("needs_proj", [False, True])
def test_fused_probe_matches_package_block(needs_proj):
    blk, v, x = _block_and_vars(needs_proj)
    y_ref = blk.apply(v, x, train=False)
    y_fused = probe.run_fused_block(
        v, x, dim_inner=16, dim_out=32, bn_eps=blk.cfg.bn_eps, interpret=True
    )
    assert ("proj" in v["params"]) == needs_proj
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


def test_fused_probe_on_cpu_falls_back_to_interpret():
    """Driving the probe without asking for interpret mode must not
    crash off-TPU: the op detects the backend and runs interpreted."""
    blk, v, x = _block_and_vars(False)
    y = probe.run_fused_block(
        v, x, dim_inner=16, dim_out=32, interpret=False
    )
    assert y.shape == x.shape


def test_no_fused_path_in_package():
    """The eviction contract: no fused-bottleneck code or config flag
    is reachable from the package."""
    import vidsitu_tpu.models.video_backbone as vb

    assert not hasattr(Bottleneck, "_fused")
    assert "fuse_inference" not in VideoCfg.__dataclass_fields__
    src = Path(vb.__file__).read_text()
    assert "ops.fused_bottleneck" not in src
    assert "fused_bottleneck_frames" not in src

    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    cfg = get_cfg_with_overrides("evict")
    assert "fuse_inference" not in cfg.tpu
