"""SlowFast checkpoint converter test: fabricate a PySlowFast-layout
torch-style state dict (independent hand-written inverse mapping), convert
it, and require an exact tree/shape match with the flax model's init."""

import jax
import numpy as np
import pytest

from vidsitu_tpu.convert.slowfast_torch import (
    convert_sfbase_checkpoint,
    convert_video_backbone,
    strip_prefixes,
)
from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.models.selector import build_model, init_model_variables
from vidsitu_tpu.utils.config import get_cfg_with_overrides


pytestmark = pytest.mark.slow

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _fabricate_pysf_sd(flat_params, flat_stats, multi):
    """Inverse mapping, written independently of the converter."""
    rng = np.random.default_rng(0)
    sd = {}

    def torch_conv(shape):  # flax (T,H,W,Cin,Cout) -> torch (Cout,Cin,T,H,W)
        t, h, w, ci, co = shape
        return rng.standard_normal((co, ci, t, h, w)).astype(np.float32)

    def src_of(path):
        # path like ('backbone','s1_slow','conv','conv','kernel')
        parts = path[1:]  # drop 'backbone'
        stage = parts[0]
        if stage.startswith("s1_fuse") or (
            stage.endswith("_fuse") and not stage[1].isdigit() is False
        ):
            pass
        if stage == "s1" or stage.startswith("s1_") and "fuse" not in stage:
            p = 0 if (stage == "s1" or stage.endswith("slow")) else 1
            return f"s1.pathway{p}_stem", parts[2]
        if stage.endswith("_fuse"):
            k = stage[1]
            return f"s{k}_fuse", parts[1]
        # residual stages
        k = stage[1]
        p = 0 if (stage.endswith("slow") or "_" not in stage) else 1
        blk = parts[1]
        if blk.startswith("block_"):
            i = blk.split("_")[1]
            part = parts[2]
            base = f"s{k}.pathway{p}_res{i}"
            if part == "proj":
                return base + ".branch1", None
            return base + f".branch2.{part}", None
        if blk.startswith("nl_"):
            j = blk.split("_")[1]
            return f"s{k}.pathway{p}_nonlocal{j}", parts[2]
        raise AssertionError(path)

    for path, arr in flat_params.items():
        parts = path[1:]
        stage = parts[0]
        if stage.endswith("_fuse"):
            k = stage[1]
            if path[-2] == "conv" and path[-1] == "kernel":
                sd[f"{stage}.conv_f2s.weight"] = torch_conv(arr.shape)
            elif path[-2] == "bn":
                nm = {"scale": "weight", "bias": "bias"}[path[-1]]
                sd[f"{stage}.bn.{nm}"] = rng.standard_normal(arr.shape).astype(
                    np.float32
                )
            continue
        if stage.startswith("s1"):
            p = 0 if (stage == "s1" or stage.endswith("slow")) else 1
            base = f"s1.pathway{p}_stem"
            if path[-1] == "kernel":
                sd[f"{base}.conv.weight"] = torch_conv(arr.shape)
            else:
                nm = {"scale": "weight", "bias": "bias"}[path[-1]]
                sd[f"{base}.bn.{nm}"] = rng.standard_normal(arr.shape).astype(
                    np.float32
                )
            continue
        k = stage[1]
        p = 0 if (stage.endswith("slow") or "_" not in stage) else 1
        blk = parts[1]
        if blk.startswith("block_"):
            i = blk.split("_")[1]
            part = parts[2]
            base = f"s{k}.pathway{p}_res{i}"
            src = (
                f"{base}.branch1" if part == "proj" else f"{base}.branch2.{part}"
            )
            bn = (
                f"{base}.branch1_bn"
                if part == "proj"
                else f"{base}.branch2.{part}_bn"
            )
            if path[-1] == "kernel":
                sd[f"{src}.weight"] = torch_conv(arr.shape)
            else:
                nm = {"scale": "weight", "bias": "bias"}[path[-1]]
                sd[f"{bn}.{nm}"] = rng.standard_normal(arr.shape).astype(
                    np.float32
                )
            continue
        if blk.startswith("nl_"):
            j = blk.split("_")[1]
            base = f"s{k}.pathway{p}_nonlocal{j}"
            sub = parts[2]
            if sub == "bn":
                nm = {"scale": "weight", "bias": "bias"}[path[-1]]
                sd[f"{base}.bn.{nm}"] = rng.standard_normal(arr.shape).astype(
                    np.float32
                )
            else:
                name = {"theta": "conv_theta", "phi": "conv_phi",
                        "g": "conv_g", "out": "conv_out"}[sub]
                sd[f"{base}.{name}.weight"] = torch_conv(arr.shape)
            continue
        raise AssertionError(path)

    def stat_arr(shape, kind):
        if kind == "running_var":  # variances must be positive
            return rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
        return rng.standard_normal(shape).astype(np.float32)

    for path, arr in flat_stats.items():
        parts = path[1:]
        stage = parts[0]
        nm = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        if stage.endswith("_fuse"):
            sd[f"{stage}.bn.{nm}"] = stat_arr(arr.shape, nm)
        elif stage.startswith("s1"):
            p = 0 if (stage == "s1" or stage.endswith("slow")) else 1
            sd[f"s1.pathway{p}_stem.bn.{nm}"] = stat_arr(arr.shape, nm)
        else:
            k = stage[1]
            p = 0 if (stage.endswith("slow") or "_" not in stage) else 1
            blk = parts[1]
            if blk.startswith("block_"):
                i = blk.split("_")[1]
                part = parts[2]
                base = f"s{k}.pathway{p}_res{i}"
                bn = (
                    f"{base}.branch1_bn"
                    if part == "proj"
                    else f"{base}.branch2.{part}_bn"
                )
                sd[f"{bn}.{nm}"] = stat_arr(arr.shape, nm)
            else:
                j = blk.split("_")[1]
                sd[f"s{k}.pathway{p}_nonlocal{j}.bn.{nm}"] = stat_arr(
                    arr.shape, nm
                )
    return sd


def test_sfbase_strict_rejects_unconsumed_top_level(monkeypatch):
    """strict mode must audit keys OUTSIDE sf_mdl.* too: cls_head./
    EMA-copy keys used to be silently dropped (round-5 review fix)."""
    from vidsitu_tpu.convert import slowfast_torch as st

    monkeypatch.setattr(
        st, "convert_video_backbone",
        lambda sd, arch, strict=False: ({}, {}),
    )
    good = {"module.sf_mdl.s1.x": np.zeros(1, np.float32)}
    st.convert_sfbase_checkpoint(dict(good), "slow", strict=True)
    bad = dict(good)
    bad["module.cls_head.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="cls_head"):
        st.convert_sfbase_checkpoint(bad, "slow", strict=True)


@pytest.mark.parametrize("arch_name,arch", [
    ("slow_fast_nl_r50_8x8", "slowfast"),
    ("i3d_r50_nl_8x8", "i3d"),
])
def test_converter_tree_exact_match(tmp_path, arch_name, arch):
    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=61,
                               with_frames=True)
    cfg = get_cfg_with_overrides(
        "conv_t",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": arch_name,
            "vid_mdl.resnet.depth": 26,
            "vid_mdl.crop_size": 32,
            "vid_mdl.num_frames": 4,
            "train.bs": 8,
            "train.nw": 0,
            "train.dtype": "float32",
        },
    )
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    flat_p = _flatten(variables["params"]["backbone"], ("backbone",))
    flat_s = _flatten(variables["batch_stats"]["backbone"], ("backbone",))

    sd = _fabricate_pysf_sd(flat_p, flat_s, multi=(arch == "slowfast"))
    # add DDP + SFBase wrappers + projection head (torch Linear layout)
    din = flat_p[sorted(flat_p)[0]].shape  # noqa - existence only
    v = len(comm.vb_id_vocab)
    w = 64 * 32 + (64 * 32 // 8 if arch == "slowfast" else 0)
    rng = np.random.default_rng(1)
    full_sd = {f"module.sf_mdl.{k}": v2 for k, v2 in sd.items()}
    full_sd["module.proj_head.0.weight"] = rng.standard_normal(
        (w // 2, w)
    ).astype(np.float32)
    full_sd["module.proj_head.0.bias"] = np.zeros(w // 2, np.float32)
    full_sd["module.proj_head.2.weight"] = rng.standard_normal(
        (v, w // 2)
    ).astype(np.float32)
    full_sd["module.proj_head.2.bias"] = np.zeros(v, np.float32)

    converted = convert_sfbase_checkpoint(full_sd, arch)

    # exact structural match with the model's own init tree
    cp = _flatten(converted["params"]["backbone"], ("backbone",))
    cs = _flatten(converted["batch_stats"]["backbone"], ("backbone",))
    assert set(cp.keys()) == set(flat_p.keys())
    assert set(cs.keys()) == set(flat_s.keys())
    for k in flat_p:
        assert cp[k].shape == flat_p[k].shape, k
    for k in flat_s:
        assert cs[k].shape == flat_s[k].shape, k

    # model runs with the converted weights and differs from random init
    import jax.numpy as jnp

    out0 = jax.jit(lambda v_, b: model.apply(v_, b)["mdl_out"])(
        variables, {k: jnp.asarray(x) for k, x in batch.items()}
    )
    out1 = jax.jit(lambda v_, b: model.apply(v_, b)["mdl_out"])(
        {"params": dict(variables["params"], **converted["params"]),
         "batch_stats": converted["batch_stats"]},
        {k: jnp.asarray(x) for k, x in batch.items()},
    )
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    assert np.isfinite(np.asarray(out1)).all()
