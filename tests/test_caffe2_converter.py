"""caffe2 pickle conversion test on the tiny i3d-nl model."""

import pickle

import numpy as np
import pytest

from vidsitu_tpu.convert.caffe2 import convert_caffe2_backbone
from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.models.selector import build_model, init_model_variables
from vidsitu_tpu.utils.config import get_cfg_with_overrides
from tests.test_slowfast_converter import _flatten


def _fabricate_caffe2_blobs(flat_params, flat_stats):
    rng = np.random.default_rng(0)
    blobs = {}

    def torch_conv(shape):
        t, h, w, ci, co = shape
        return rng.standard_normal((co, ci, t, h, w)).astype(np.float32)

    def put_stats(bn_base, shape):
        blobs[bn_base + "_rm"] = rng.standard_normal(shape).astype(np.float32)
        blobs[bn_base + "_riv"] = rng.uniform(0.5, 1.5, shape).astype(np.float32)

    for path, arr in flat_params.items():
        parts = path[1:]
        stage = parts[0]
        if stage == "s1":
            if path[-1] == "kernel":
                blobs["conv1_w"] = torch_conv(arr.shape)
            else:
                nm = {"scale": "s", "bias": "b"}[path[-1]]
                blobs[f"res_conv1_bn_{nm}"] = rng.standard_normal(
                    arr.shape
                ).astype(np.float32)
            continue
        k = stage[1]
        blk = parts[1]
        if blk.startswith("block_"):
            i = blk.split("_")[1]
            part = parts[2]
            if part == "proj":
                base = f"res{k}_{i}_branch1"
            else:
                base = f"res{k}_{i}_branch2{part}"
            if path[-1] == "kernel":
                blobs[base + "_w"] = torch_conv(arr.shape)
            else:
                nm = {"scale": "s", "bias": "b"}[path[-1]]
                blobs[f"{base}_bn_{nm}"] = rng.standard_normal(
                    arr.shape
                ).astype(np.float32)
        else:  # nl_
            j = blk.split("_")[1]
            sub = parts[2]
            if sub == "bn":
                nm = {"scale": "s", "bias": "b"}[path[-1]]
                blobs[f"nonlocal_conv{k}_{j}_bn_{nm}"] = rng.standard_normal(
                    arr.shape
                ).astype(np.float32)
            else:
                blobs[f"nonlocal_conv{k}_{j}_{sub}_w"] = torch_conv(arr.shape)

    for path, arr in flat_stats.items():
        parts = path[1:]
        stage = parts[0]
        if stage == "s1":
            if path[-1] == "mean":
                blobs["res_conv1_bn_rm"] = rng.standard_normal(
                    arr.shape
                ).astype(np.float32)
            else:
                blobs["res_conv1_bn_riv"] = rng.uniform(
                    0.5, 1.5, arr.shape
                ).astype(np.float32)
            continue
        k = stage[1]
        blk = parts[1]
        suf = {"mean": "rm", "var": "riv"}[path[-1]]

        def arr_of():
            if suf == "riv":
                return rng.uniform(0.5, 1.5, arr.shape).astype(np.float32)
            return rng.standard_normal(arr.shape).astype(np.float32)

        if blk.startswith("block_"):
            i = blk.split("_")[1]
            part = parts[2]
            base = (
                f"res{k}_{i}_branch1" if part == "proj"
                else f"res{k}_{i}_branch2{part}"
            )
            blobs[f"{base}_bn_{suf}"] = arr_of()
        else:
            j = blk.split("_")[1]
            blobs[f"nonlocal_conv{k}_{j}_bn_{suf}"] = arr_of()
    # classifier head + momentum blobs must be skipped by the converter
    blobs["pred_w"] = np.zeros((400, 2048), np.float32)
    blobs["pred_b"] = np.zeros((400,), np.float32)
    blobs["conv1_w_momentum"] = np.zeros((1,), np.float32)
    return blobs


def test_caffe2_i3d_conversion(tmp_path):
    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=81,
                               with_frames=True)
    cfg = get_cfg_with_overrides(
        "c2",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": "i3d_r50_nl_8x8",
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

    blobs = _fabricate_caffe2_blobs(flat_p, flat_s)
    pkl_path = tmp_path / "kinetics_i3d.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    params, stats = convert_caffe2_backbone(str(pkl_path), "i3d")
    cp = _flatten(params, ("backbone",))
    cs = _flatten(stats, ("backbone",))
    assert set(cp.keys()) == set(flat_p.keys())
    assert set(cs.keys()) == set(flat_s.keys())
    for k in flat_p:
        assert cp[k].shape == flat_p[k].shape, k


def _flax_to_caffe2_name(path):
    """flax param/stat path (under backbone) -> caffe2 dual-pathway blob
    name + kind ('conv'|'bn')."""
    parts = path[1:]  # drop 'backbone'
    stage = parts[0]  # e.g. s1_slow / s3_fast / s2_fuse
    leaf = path[-1]
    bn_suf = {"scale": "s", "bias": "b", "mean": "rm", "var": "riv"}
    pre = "t_" if stage.endswith("_fast") else ""
    k = stage[1]
    if stage.endswith("_fuse"):
        base = ("t_pool1_subsample" if k == "1"
                else f"t_res{k}_0_branch2c_bn_subsample")
        if leaf == "kernel":
            return base + "_w", "conv"
        return f"{base}_bn_{bn_suf[leaf]}", "bn"
    if k == "1":  # stem
        if leaf == "kernel":
            return pre + "conv1_w", "conv"
        return f"{pre}res_conv1_bn_{bn_suf[leaf]}", "bn"
    blk = parts[1]
    if blk.startswith("block_"):
        i = blk.split("_")[1]
        part = parts[2]
        base = (f"res{k}_{i}_branch1" if part == "proj"
                else f"res{k}_{i}_branch2{part}")
        if leaf == "kernel":
            return pre + base + "_w", "conv"
        return f"{pre}{base}_bn_{bn_suf[leaf]}", "bn"
    # non-local
    j = blk.split("_")[1]
    sub = parts[2]
    if sub == "bn":
        return f"{pre}nonlocal_conv{k}_{j}_bn_{bn_suf[leaf]}", "bn"
    return f"{pre}nonlocal_conv{k}_{j}_{sub}_w", "conv"


def test_caffe2_slowfast_dual_pathway_roundtrip(tmp_path):
    """Value-exact round trip: flax SlowFast tree -> caffe2 dual-pathway
    blobs (slow unprefixed, fast t_-prefixed, *_subsample fuse convs) ->
    converter -> identical flax tree."""
    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=82,
                               with_frames=True)
    cfg = get_cfg_with_overrides(
        "c2sf",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
            "vid_mdl.resnet.depth": 26,
            "vid_mdl.crop_size": 32,
            "vid_mdl.num_frames": 8,
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
    assert any("_fast" in p[1] for p in flat_p), "expected dual-pathway tree"
    assert any("_fuse" in p[1] for p in flat_p)

    blobs = {}
    for path, arr in {**flat_p, **flat_s}.items():
        name, kind = _flax_to_caffe2_name(path)
        a = np.asarray(arr)
        if kind == "conv":
            # flax (T,H,W,Ci,Co) -> caffe2/torch (Co,Ci,T,H,W)
            a = np.transpose(a, (4, 3, 0, 1, 2))
        assert name not in blobs, name
        blobs[name] = a
    blobs["pred_w"] = np.zeros((400, 2304), np.float32)
    blobs["t_conv1_w_momentum"] = np.zeros((1,), np.float32)

    pkl_path = tmp_path / "kinetics_slowfast.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    params, stats = convert_caffe2_backbone(str(pkl_path), "slowfast")
    cp = _flatten(params, ("backbone",))
    cs = _flatten(stats, ("backbone",))
    assert set(cp.keys()) == set(flat_p.keys())
    assert set(cs.keys()) == set(flat_s.keys())
    for k in flat_p:
        np.testing.assert_array_equal(cp[k], np.asarray(flat_p[k]), err_msg=str(k))
    for k in flat_s:
        np.testing.assert_array_equal(cs[k], np.asarray(flat_s[k]), err_msg=str(k))


def test_caffe2_pickle_loads_directly_as_sf_pretrained(tmp_path):
    """cfg.mdl.sf_pretrained_path pointed at a caffe2 pickle loads
    torch-free through load_pretrained_variables (the reference converts
    caffe2 at load time, trn_utils.py:358-375)."""
    from vidsitu_tpu.train.pretrained import (
        _is_caffe2_pickle,
        load_pretrained_variables,
    )

    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=83,
                               with_frames=True)
    cfg = get_cfg_with_overrides(
        "c2direct",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
            "vid_mdl.resnet.depth": 26,
            "vid_mdl.crop_size": 32,
            "vid_mdl.num_frames": 8,
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

    rng = np.random.RandomState(7)
    blobs = {}
    for path, arr in {**flat_p, **flat_s}.items():
        name, kind = _flax_to_caffe2_name(path)
        a = rng.randn(*np.asarray(arr).shape).astype(np.float32)
        if kind == "conv":
            a = np.transpose(a, (4, 3, 0, 1, 2))
        blobs[name] = a
    pkl_path = tmp_path / "SLOWFAST_8x8_R50.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    assert _is_caffe2_pickle(str(pkl_path))

    cfg.mdl.load_sf_pretrained = True
    cfg.mdl.sf_pretrained_path = str(pkl_path)
    new_vars = load_pretrained_variables(cfg, model, variables)
    got = _flatten(new_vars["params"]["backbone"], ("backbone",))
    changed = sum(
        not np.array_equal(np.asarray(got[k]), np.asarray(flat_p[k]))
        for k in flat_p
    )
    assert changed > 0, "pretrained load did not replace backbone params"
    # a specific conv kernel must match the fabricated blob value-exactly
    for k in flat_p:
        name, kind = _flax_to_caffe2_name(k)
        if kind == "conv":
            exp = np.transpose(blobs[name], (2, 3, 4, 1, 0))
            np.testing.assert_array_equal(np.asarray(got[k]), exp,
                                          err_msg=str(k))
            break
