"""vb task end-to-end on a tiny backbone (depth-26, 32px frames)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evaluators import EvalB
from vidsitu_tpu.models.selector import build_model, init_model_variables
from vidsitu_tpu.models.video_backbone import VideoCfg
from vidsitu_tpu.train.learner import Learner
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

TINY_VID = {
    "vid_mdl.resnet.depth": 26,
    "vid_mdl.crop_size": 32,
    "vid_mdl.num_frames": 4,
    "vid_mdl.sampling_rate": 2,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("vbdata")
    paths = make_synth_dataset(
        root, n_train=8, n_valid=4, seed=31, with_frames=True
    )
    return paths, root


def mk(env_, arch="slow_fast_nl_r50_8x8", **kw):
    paths, root = env_
    return get_cfg_with_overrides(
        "vbtest",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": arch,
            **TINY_VID,
            "train.bs": 8,
            "train.bsv": 4,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
            "misc.tmp_path": str(root / "tmp"),
            **kw,
        },
    )


def test_slowfast_backbone_shapes(env):
    cfg = mk(env)
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    assert batch["frms_ev_fast_tensor"].shape == (8, 5, 4, 32, 32, 3)
    assert batch["frms_ev_slow_tensor"].shape == (8, 5, 1, 32, 32, 3)
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    assert "batch_stats" in variables
    out = jax.jit(lambda v, b: model.apply(v, b))(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    # logits over verb vocab per event
    assert out["mdl_out"].shape == (8, 5, len(comm.vb_id_vocab))
    assert np.isfinite(float(out["loss"]))


def test_single_pathway_archs(env):
    for arch in ["i3d_r50_nl_8x8", "c2d_r50_8x8"]:
        cfg = mk(env, arch=arch, **{"vid_mdl.sampling_rate": 2})
        comm = build_comm(cfg)
        data = get_data(cfg)
        batch = next(iter(data.train_dl))
        assert "frms_ev_slow_tensor" not in batch
        model = build_model(cfg, comm)
        variables = init_model_variables(model, batch)
        out = jax.jit(lambda v, b: model.apply(v, b))(
            variables, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        assert out["mdl_out"].shape == (8, 5, len(comm.vb_id_vocab))
        assert np.isfinite(float(out["loss"]))


def test_vb_train_and_eval(env):
    cfg = mk(env)
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    evalb = EvalB(cfg, comm, model)
    learner = Learner(
        uid="vb_e2e", cfg=cfg, model=model, variables=variables,
        data=data, eval_fn=evalb,
    )
    losses = learner.overfit_batch(epochs=6, lr=1e-3)
    assert losses[-1] < losses[0], losses
    # batch_stats must have been updated by training
    bs0 = jax.tree.leaves(variables["batch_stats"])[0]
    bs1 = jax.tree.leaves(learner.variables["batch_stats"])[0]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))

    val_loss, val_acc, _ = learner.validate(write_to_file=True)
    for k in EvalB.met_keys:
        assert k in val_acc
        assert 0.0 <= val_acc[k] <= 1.0
    # prediction pickle in leaderboard format
    import pickle

    preds = pickle.load(
        open(learner.predictions_dir / "valid_0.pkl", "rb")
    )
    assert len(preds) == 4
    assert set(preds[0].keys()) == {"pred_vbs_ev", "pred_scores_ev", "ann_idx"}
    assert len(preds[0]["pred_vbs_ev"]) == 5
    assert len(preds[0]["pred_vbs_ev"][0]) == 5


def test_feature_extractor_dims(env):
    from vidsitu_tpu.models.vb_models import build_feat_extractor

    cfg = mk(env)
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    fe = build_feat_extractor(cfg)
    variables = init_model_variables(fe, batch)
    out = jax.jit(lambda v, b: fe.apply(v, b))(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    # slowfast trimmed head: 2048 + 256 = 2304
    assert out["feats"].shape == (8, 5, 2304)


def test_extract_features_roundtrip(env, tmp_path):
    """extract -> npy files -> SFPreFeats SRL model consumes them."""
    from vidsitu_tpu.extract import extract_features

    cfg = mk(env)
    comm = build_comm(cfg)
    out_dir = tmp_path / "slow_fast_feats"
    counts = extract_features(
        cfg, comm, splits=["valid"], out_dir=out_dir, batch_size=4
    )
    assert counts["valid"] == 4
    files = sorted(out_dir.glob("*_feats.npy"))
    assert len(files) == 4
    arr = np.load(files[0])
    assert arr.shape == (5, 2304)
    assert np.isfinite(arr).all()

    # the on-disk contract is float32 even under a bfloat16 model body
    # (a bf16 npy would be raw-void '|V2', unreadable downstream)
    cfg_bf = mk(env, **{"train.dtype": "bfloat16"})
    out_bf = tmp_path / "bf16_feats"
    extract_features(cfg_bf, build_comm(cfg_bf), splits=["valid"],
                     out_dir=out_bf, batch_size=4)
    arr_bf = np.load(sorted(out_bf.glob("*_feats.npy"))[0])
    assert arr_bf.dtype == np.float32 and np.isfinite(arr_bf).all()

    # features dir name carries the dim hint for get_head_dim
    from vidsitu_tpu.models.srl_models import get_head_dim

    cfg2 = mk(env)
    cfg2.ds.vsitu.vsit_frm_feats_dir = str(out_dir)
    assert get_head_dim(cfg2) == 2304


def test_extract_clip_stream_spanning(env, tmp_path):
    """The flat clip stream regroups (5, D) per segment exactly even
    when device batches cut across video boundaries: clip_batch=7
    forces every video's 5 clips to span dispatches (7 % 5 != 0), and
    the tail batch exercises the zero-pad path. Results must match a
    single-dispatch run (clip_batch large) per segment."""
    from vidsitu_tpu.extract import extract_features

    cfg = mk(env)
    comm = build_comm(cfg)
    out_a = tmp_path / "span7"
    out_b = tmp_path / "onebatch"
    counts = extract_features(cfg, comm, splits=["valid"], out_dir=out_a,
                              batch_size=3, clip_batch=7)
    assert counts["valid"] == 4
    extract_features(cfg, comm, splits=["valid"], out_dir=out_b,
                     batch_size=4, clip_batch=64)
    for f in sorted(out_a.glob("*_feats.npy")):
        a, b = np.load(f), np.load(out_b / f.name)
        assert a.shape == b.shape == (5, a.shape[1])
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_extract_clip_stream_device_mesh(env, tmp_path):
    """n_devices=4 shards the flat clip stream over a local data mesh
    (global device batch = 4 * clip_batch); features must match the
    single-device run per segment, including through the zero-padded
    tail (20 clips into a global batch of 4*6=24)."""
    from vidsitu_tpu.extract import extract_features

    cfg = mk(env)
    comm = build_comm(cfg)
    out_m = tmp_path / "mesh4"
    counts = extract_features(cfg, comm, splits=["valid"], out_dir=out_m,
                              batch_size=3, clip_batch=6, n_devices=4)
    assert counts["valid"] == 4
    out_s = tmp_path / "single_dev"
    extract_features(cfg, comm, splits=["valid"], out_dir=out_s,
                     batch_size=4, clip_batch=64, n_devices=1)
    files = sorted(out_m.glob("*_feats.npy"))
    assert len(files) == 4
    for f in files:
        np.testing.assert_allclose(
            np.load(f), np.load(out_s / f.name), rtol=2e-5, atol=2e-5)


def test_extract_clip_stream_multihost_shards(env, tmp_path, monkeypatch):
    """Clip-stream extraction under multi-process segment sharding:
    3 shards over 4 segments forces the sampler's pad duplicates
    (ceil(4/3)=2 per shard -> 2 repeats), which must only re-write the
    same file atomically. Union of shard outputs == the full split."""
    from vidsitu_tpu.extract import extract_features

    cfg = mk(env)
    comm = build_comm(cfg)
    out_dir = tmp_path / "sharded"
    for rank in range(3):
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        extract_features(cfg, comm, splits=["valid"], out_dir=out_dir,
                         batch_size=2, clip_batch=7)
    monkeypatch.undo()
    files = sorted(out_dir.glob("*_feats.npy"))
    assert len(files) == 4
    ref_dir = tmp_path / "single"
    extract_features(cfg, comm, splits=["valid"], out_dir=ref_dir,
                     batch_size=4, clip_batch=64)
    for f in files:
        np.testing.assert_allclose(
            np.load(f), np.load(ref_dir / f.name), rtol=2e-5, atol=2e-5)


def test_on_device_preproc_equivalence(env):
    """uint8 frames + on-device normalize == host-normalized float path."""
    cfg_f = mk(env)
    comm = build_comm(cfg_f)
    data_f = get_data(cfg_f)
    batch_f = next(iter(data_f.train_dl))
    assert batch_f["frms_ev_fast_tensor"].dtype == np.float32

    cfg_u = mk(env, **{"tpu.on_device_preproc": True})
    data_u = get_data(cfg_u)
    batch_u = next(iter(data_u.train_dl))
    assert batch_u["frms_ev_fast_tensor"].dtype == np.uint8

    model = build_model(cfg_f, comm)
    variables = init_model_variables(model, batch_f)
    fwd = jax.jit(lambda v, b: model.apply(v, b)["mdl_out"])
    out_f = np.asarray(fwd(variables, {k: jnp.asarray(v) for k, v in batch_f.items()}))
    out_u = np.asarray(fwd(variables, {k: jnp.asarray(v) for k, v in batch_u.items()}))
    np.testing.assert_allclose(out_f, out_u, atol=1e-4)


def test_prefolded_5d_inputs_match_6d(env):
    """Host-side event fold (data/loader.fold_frame_events): the model
    accepts pre-folded (B*5, T, H, W, C) frames and produces bit-equal
    outputs to the 6-D (B, 5, ...) compatibility path."""
    from vidsitu_tpu.data.loader import fold_frame_events
    from vidsitu_tpu.models.vb_models import VbVideoModel

    cfg = mk(env)
    vid_cfg = VideoCfg.from_cfg(cfg.vid_mdl)
    model = VbVideoModel(vid_cfg=vid_cfg, num_classes=17)
    rng = np.random.default_rng(0)
    batch6 = {
        "frms_ev_fast_tensor": rng.standard_normal(
            (2, 5, 4, 32, 32, 3)
        ).astype(np.float32),
        "frms_ev_slow_tensor": rng.standard_normal(
            (2, 5, 1, 32, 32, 3)
        ).astype(np.float32),
        "label_tensor": np.zeros((2, 5), np.int64),
    }
    batch5 = fold_frame_events(batch6)
    assert batch5["frms_ev_fast_tensor"].shape == (10, 4, 32, 32, 3)
    assert batch5["label_tensor"].shape == (2, 5)  # non-frame keys intact
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch6)
    out6 = jax.jit(model.apply)(variables, batch6)
    out5 = jax.jit(model.apply)(variables, batch5)
    np.testing.assert_array_equal(
        np.asarray(out6["mdl_out"]), np.asarray(out5["mdl_out"])
    )
    np.testing.assert_array_equal(
        np.asarray(out6["loss"]), np.asarray(out5["loss"])
    )


def test_selective_remat_matches_full(env):
    """remat_stages checkpoints only the named stages; grads must equal
    the non-remat program (remat is numerics-preserving)."""
    from vidsitu_tpu.models.vb_models import VbVideoModel

    cfg = mk(env)
    rng = np.random.default_rng(1)
    batch = {
        "frms_ev_fast_tensor": rng.standard_normal(
            (10, 4, 32, 32, 3)
        ).astype(np.float32),
        "frms_ev_slow_tensor": rng.standard_normal(
            (10, 1, 32, 32, 3)
        ).astype(np.float32),
        "label_tensor": np.zeros((2, 5), np.int64),
    }

    def grads(remat_stages):
        vc = VideoCfg.from_cfg(cfg.vid_mdl, remat_stages=remat_stages)
        model = VbVideoModel(vid_cfg=vc, num_classes=17)
        variables = model.init(jax.random.PRNGKey(0), batch)

        def loss_fn(p):
            out, _ = model.apply(
                {**variables, "params": p}, batch, deterministic=False,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return out["loss"]

        return jax.jit(jax.grad(loss_fn))(variables["params"])

    g0 = grads("")
    g1 = grads("s2,s3")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        g0, g1,
    )


def test_bn_bf16_stats_knob_runs(env):
    """bn_f32_stats=False must produce a close (not bit-equal) loss."""
    from vidsitu_tpu.models.vb_models import VbVideoModel

    cfg = mk(env)
    rng = np.random.default_rng(2)
    batch = {
        "frms_ev_fast_tensor": rng.standard_normal(
            (10, 4, 32, 32, 3)
        ).astype(np.float32),
        "frms_ev_slow_tensor": rng.standard_normal(
            (10, 1, 32, 32, 3)
        ).astype(np.float32),
        "label_tensor": np.zeros((2, 5), np.int64),
    }
    losses = {}
    for f32 in (True, False):
        vc = VideoCfg.from_cfg(cfg.vid_mdl, bn_f32_stats=f32)
        model = VbVideoModel(vid_cfg=vc, num_classes=17)
        variables = model.init(jax.random.PRNGKey(0), batch)
        out, _ = model.apply(
            variables, batch, deterministic=False,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
        )
        losses[f32] = float(out["loss"])
    assert abs(losses[True] - losses[False]) < 0.05 * abs(losses[True]) + 1e-3


def test_evalb_rebind_mesh_matches(env, tmp_path):
    """rebind_mesh (mid-run elasticity) must make EvalB produce the same
    metrics/pkl as an evaluator built directly on the target mesh."""
    import pickle

    from jax.sharding import Mesh

    cfg = mk(env)
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch, seed=13)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

    ev = EvalB(cfg, comm, model)  # un-meshed construction
    ev.rebind_mesh(mesh)
    assert ev.mesh is mesh
    p1 = tmp_path / "rebound"
    p1.mkdir()
    out1 = ev(variables, data.valid_dl, "valid", p1)

    ev2 = EvalB(cfg, comm, model, mesh=mesh)  # built on the mesh
    p2 = tmp_path / "direct"
    p2.mkdir()
    out2 = ev2(variables, data.valid_dl, "valid", p2)

    assert out1 == out2
    preds1 = pickle.load(open(p1 / "valid_0.pkl", "rb"))
    preds2 = pickle.load(open(p2 / "valid_0.pkl", "rb"))
    assert preds1 == preds2
