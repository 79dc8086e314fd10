"""Fused pallas bottleneck (ops/fused_bottleneck) == the unfused flax
chain, in interpret mode on CPU. Covers plain blocks, projection blocks,
and the full SlowFastBackbone with fusion toggled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.models.video_backbone import Bottleneck, VideoCfg


def _run_block(fused: bool, needs_proj: bool, seed: int = 0):
    cfg = VideoCfg(
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        fuse_inference=fused,
        fuse_interpret=True,
        zero_init_final_bn=False,
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
    v = {"params": v["params"], "batch_stats": stats}
    return blk.apply(v, x, train=False), v, x


@pytest.mark.parametrize("needs_proj", [False, True])
def test_fused_block_matches_unfused(needs_proj):
    y_ref, v, x = _run_block(False, needs_proj)
    y_fused, _, _ = _run_block(True, needs_proj)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


def test_fused_param_tree_identical():
    _, v_ref, _ = _run_block(False, True)
    _, v_fused, _ = _run_block(True, True)
    ref_paths = jax.tree_util.tree_structure(v_ref)
    fused_paths = jax.tree_util.tree_structure(v_fused)
    assert ref_paths == fused_paths
    for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_fused)):
        assert a.shape == b.shape


def test_fused_backbone_matches_unfused():
    from vidsitu_tpu.models.video_backbone import SlowFastBackbone

    kw = dict(dtype=jnp.float32, param_dtype=jnp.float32,
              depth_blocks=(1, 1, 1, 1), zero_init_final_bn=False)
    cfg_ref = VideoCfg(**kw)
    cfg_fused = VideoCfg(fuse_inference=True, fuse_interpret=True, **kw)
    rng = jax.random.PRNGKey(3)
    slow = jax.random.normal(rng, (1, 4, 32, 32, 3))
    fast = jax.random.normal(rng, (1, 16, 32, 32, 3))
    mdl_ref = SlowFastBackbone(cfg_ref)
    v = mdl_ref.init(jax.random.PRNGKey(4), slow, fast)
    ys_ref, yf_ref = mdl_ref.apply(v, slow, fast, train=False)
    ys, yf = SlowFastBackbone(cfg_fused).apply(v, slow, fast, train=False)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yf_ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_on_cpu_falls_back_to_interpret():
    """fuse_inference='on' without a TPU must not crash: the op detects
    the backend and runs interpreted."""
    cfg = VideoCfg(
        dtype=jnp.float32, param_dtype=jnp.float32,
        fuse_inference=True, fuse_interpret=False,  # NOT asking interpret
        zero_init_final_bn=False,
    )
    blk = Bottleneck(dim_out=32, dim_inner=16, temp_kernel=1,
                     spatial_stride=1, cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 32))
    v = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(v, x, train=False)
    assert y.shape == x.shape
