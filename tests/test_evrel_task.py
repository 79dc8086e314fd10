"""evrel task: all five model variants + evaluator end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evaluators import EvalB_Acc
from vidsitu_tpu.models.selector import build_model, init_model_variables
from vidsitu_tpu.train.learner import Learner
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

TINY_ROB = {
    "rob_mdl.d_model": 64,
    "rob_mdl.n_layers": 2,
    "rob_mdl.n_heads": 4,
    "rob_mdl.ffn_dim": 128,
    "rob_mdl.max_pos": 130,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("evreldata")
    paths = make_synth_dataset(root, n_train=8, n_valid=4, seed=41)
    return paths, root


def mk(env_, mdl_name, **kw):
    paths, root = env_
    return get_cfg_with_overrides(
        "evreltest",
        **{
            **paths,
            **TINY_ROB,
            "task_type": "evrel",
            "mdl.mdl_name": mdl_name,
            "train.bs": 8,
            "train.bsv": 4,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
            "misc.tmp_path": str(root / "tmp"),
            **kw,
        },
    )


@pytest.mark.parametrize(
    "mdl_name",
    [
        "rob_evrel",
        "txe_evrel",
        "sfpret_evrel",
        "sfpret_vbonly_evrel",
        "sfpret_onlyvid_evrel",
    ],
)
def test_forward_shapes_and_loss(env, mdl_name):
    cfg = mk(env, mdl_name)
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    assert out["mdl_out"].shape == (8, 4, 1, 5)
    assert np.isfinite(float(out["loss"]))
    assert 0.1 < float(out["loss"]) < 8.0  # ~log(5) at init


def test_ablation_zeroing_changes_logits(env):
    """txe (video zeroed) vs sfpret (full) differ; onlyvid ignores text."""
    cfg_full = mk(env, "sfpret_evrel")
    comm = build_comm(cfg_full)
    data = get_data(cfg_full)
    batch = next(iter(data.train_dl))
    dev = {k: jnp.asarray(v) for k, v in batch.items()}

    m_vid = build_model(mk(env, "sfpret_onlyvid_evrel"), comm)
    v_vid = init_model_variables(m_vid, batch)
    out1 = jax.jit(lambda v, b: m_vid.apply(v, b))(v_vid, dev)
    # shuffle the text tokens: onlyvid output must not change
    batch2 = dict(batch)
    rng = np.random.default_rng(0)
    batch2["evrel_seq_out_ones"] = rng.permutation(
        batch["evrel_seq_out_ones"].reshape(-1)
    ).reshape(batch["evrel_seq_out_ones"].shape)
    dev2 = {k: jnp.asarray(v) for k, v in batch2.items()}
    out2 = jax.jit(lambda v, b: m_vid.apply(v, b))(v_vid, dev2)
    np.testing.assert_allclose(
        np.asarray(out1["mdl_out"]), np.asarray(out2["mdl_out"]), atol=1e-5
    )

    m_txe = build_model(mk(env, "txe_evrel"), comm)
    v_txe = init_model_variables(m_txe, batch)
    out3 = jax.jit(lambda v, b: m_txe.apply(v, b))(v_txe, dev)
    # txe (video zeroed) must be invariant to frm_feats
    batch3 = dict(batch)
    batch3["frm_feats"] = batch["frm_feats"] * 0 + 7.0
    dev3 = {k: jnp.asarray(v) for k, v in batch3.items()}
    out4 = jax.jit(lambda v, b: m_txe.apply(v, b))(v_txe, dev3)
    np.testing.assert_allclose(
        np.asarray(out3["mdl_out"]), np.asarray(out4["mdl_out"]), atol=1e-5
    )


def test_val_loss_exact_on_partial_final_batch(env, tmp_path):
    """The reported val_loss must equal the count-weighted mean of the
    TRUE per-batch losses: the static-shape padding (repeat-last-row)
    must not leak duplicated rows into the loss (the reference evaluates
    the real-sized final batch, trn_utils.py:536-566)."""
    cfg = mk(env, "rob_evrel", **{"train.bsv": 3})  # 4 valid -> 3 + 1
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    ev = EvalB_Acc(cfg, comm, model)

    val_loss, _ = ev(variables, data.valid_dl, "valid", pred_path=tmp_path)

    exp, ns = [], []
    for b in data.valid_dl:
        dev = {k: jnp.asarray(v) for k, v in b.items()}
        exp.append(float(model.apply(variables, dev)["loss"]))
        ns.append(next(iter(b.values())).shape[0])
    assert ns[-1] == 1  # the partial batch actually occurred
    expect = float(np.average(exp, weights=ns))
    assert abs(val_loss["loss"] - expect) < 1e-5, (
        f"padded rows leaked into val_loss: {val_loss['loss']} vs {expect}"
    )


def test_evrel_train_eval_end_to_end(env):
    cfg = mk(env, "sfpret_evrel")
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    evalb = EvalB_Acc(cfg, comm, model)
    learner = Learner(
        uid="evrel_e2e", cfg=cfg, model=model, variables=variables,
        data=data, eval_fn=evalb,
    )
    losses = learner.overfit_batch(epochs=8, lr=1e-3)
    assert losses[-1] < losses[0]
    val_loss, val_acc, _ = learner.validate(write_to_file=True)
    assert set(val_acc) == {"Macro_Top_1", "Top_1"}
    assert 0.0 <= val_acc["Top_1"] <= 1.0

    import pickle

    preds = pickle.load(open(learner.predictions_dir / "valid_0.pkl", "rb"))
    assert len(preds) == 4
    assert set(preds[0].keys()) == {
        "pred_evrels_ev", "pred_scores_ev", "ann_idx"
    }
    assert len(preds[0]["pred_evrels_ev"]) == 4
    assert len(preds[0]["pred_evrels_ev"][0]) == 3  # 3 valid annotators
    assert preds[0]["pred_evrels_ev"][0][0] in comm.evrel_dct


def test_evalb_acc_rebind_mesh_matches(env, tmp_path):
    """rebind_mesh (mid-run elasticity, learner._apply_resize) must make
    EvalB_Acc produce the identical val_loss/accuracy/pkl as an evaluator
    BUILT on the target mesh."""
    import pickle

    from jax.sharding import Mesh

    from vidsitu_tpu.data import get_data

    cfg = mk(env, "rob_evrel")
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))

    ev = EvalB_Acc(cfg, comm, model)  # un-meshed construction
    ev.rebind_mesh(mesh)
    assert ev.mesh is mesh
    p1 = tmp_path / "rebound"
    p1.mkdir()
    loss1, acc1 = ev(variables, data.valid_dl, "valid", p1)

    ev2 = EvalB_Acc(cfg, comm, model, mesh=mesh)  # built on the mesh
    p2 = tmp_path / "direct"
    p2.mkdir()
    loss2, acc2 = ev2(variables, data.valid_dl, "valid", p2)

    assert abs(loss1["loss"] - loss2["loss"]) < 1e-6
    assert acc1 == acc2
    preds1 = pickle.load(open(p1 / "valid_0.pkl", "rb"))
    preds2 = pickle.load(open(p2 / "valid_0.pkl", "rb"))
    assert preds1 == preds2
