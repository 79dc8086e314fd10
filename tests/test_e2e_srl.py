"""End-to-end minimum slice: synth data -> SRL model -> train step on an
8-device mesh -> jitted greedy decode -> leaderboard pkl -> CIDEr.

This exercises every layer of the framework (SURVEY.md §7 step 3).
"""

import jax
import numpy as np
import pytest

from vidsitu_tpu.data import build_comm, get_data
from vidsitu_tpu.data.synth import make_synth_dataset
from vidsitu_tpu.evaluation.evaluators import EvalB_Gen, conv_seq_to_srl
from vidsitu_tpu.models.selector import (
    build_model,
    build_srl_generate_fn,
    init_model_variables,
)
from vidsitu_tpu.train.learner import Learner
from vidsitu_tpu.utils.config import get_cfg_with_overrides

pytestmark = pytest.mark.slow

TINY_TX = {
    "gpt2_mdl.d_model": 64,
    "gpt2_mdl.n_layers": 2,
    "gpt2_mdl.n_heads": 4,
    "gpt2_mdl.max_pos": 128,
    "tx_dec.decoder_embed_dim": 64,
    "tx_dec.decoder_ffn_embed_dim": 128,
    "tx_dec.decoder_layers": 2,
    "tx_dec.decoder_attention_heads": 4,
    "tx_dec.encoder_embed_dim": 64,
    "tx_dec.encoder_ffn_embed_dim": 128,
    "tx_dec.encoder_layers": 2,
    "tx_dec.encoder_attention_heads": 4,
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    paths = make_synth_dataset(root, n_train=8, n_valid=5, seed=21)
    return paths, root


def mk(env_, mdl_name, **kw):
    paths, root = env_
    cfg = get_cfg_with_overrides(
        "e2e_" + mdl_name,
        **{
            **paths,
            **TINY_TX,
            "task_type": "vb_arg",
            "mdl.mdl_name": mdl_name,
            "train.bs": 8,
            "train.bsv": 8,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
            "misc.tmp_path": str(root / "tmp"),
            **kw,
        },
    )
    return cfg


@pytest.mark.parametrize(
    "mdl_name",
    ["tx_only", "sfpret_txed_vbarg", "sfpret_txe_txd_vbarg", "txed_only",
     "new_gpt2_only"],
)
def test_forward_loss_finite(env, mdl_name):
    cfg = mk(env, mdl_name)
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    import jax.numpy as jnp

    out = jax.jit(
        lambda v, b: model.apply(v, b)
    )(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    loss = float(out["loss"])
    assert np.isfinite(loss)
    # ~uniform init: loss near log(vocab)
    assert 2.0 < loss < 12.0


def test_overfit_batch_decreases_loss(env):
    cfg = mk(env, "sfpret_txe_txd_vbarg")
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    evalb = EvalB_Gen(cfg, comm, gen_fn)
    learner = Learner(
        uid=cfg.uid, cfg=cfg, model=model, variables=variables,
        data=data, eval_fn=evalb,
    )
    losses = learner.overfit_batch(epochs=15, lr=3e-3)
    assert losses[-1] < losses[0] * 0.7, losses
    assert all(np.isfinite(l) for l in losses)


def test_generate_and_score(env):
    """Generation path produces verb-forced parseable sequences that score."""
    cfg = mk(env, "tx_only")
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.valid_dl))
    variables = init_model_variables(model, batch)
    gen_fn = build_srl_generate_fn(cfg, comm, model)

    import jax.numpy as jnp

    out = np.asarray(gen_fn(variables, {k: jnp.asarray(v) for k, v in batch.items()}))
    assert out.shape[:3] == (batch["seq_out_by_ev"].shape[0], 5, 1)
    # first token is the forced verb token
    np.testing.assert_array_equal(
        out[:, :, 0, 0], batch["seq_out_by_ev"][:, :, 0, 0]
    )
    # decoded first word is a verb id (vb.NN), so conv_seq_to_srl parses
    wvoc = comm.gpt2_hf_tok
    text = wvoc.decode(out[0, 0, 0], skip_special_tokens=True)
    assert "." in text.split(" ")[0]

    evalb = EvalB_Gen(cfg, comm, gen_fn)
    val_loss, val_acc = evalb(
        variables, data.valid_dl, "valid", cfg.misc.tmp_path
    )
    for k in EvalB_Gen.met_keys:
        assert k in val_acc
        assert np.isfinite(val_acc[k])
    # random model: scores must be low but defined
    assert 0 <= val_acc["cider"] <= 10


def test_conv_seq_to_srl_parser():
    ag = {"<Arg0>", "<Arg1>", "<AScn>"}
    d = conv_seq_to_srl("walk.01 <Arg0> a man <Arg1> the dog", ag)
    assert d == {"vb_id": "walk.01", "Arg0": "a man", "Arg1": "the dog"}
    assert conv_seq_to_srl("no verb here", ag) == {}
    d2 = conv_seq_to_srl("walk.01 stray words <Arg0> x", ag)
    assert d2["vb_id"] == "walk.01" and d2["Arg0"] == "x"


def test_fit_one_epoch_end_to_end(env):
    cfg = mk(env, "tx_only", **{"train.epochs": 1})
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.train_dl))
    variables = init_model_variables(model, batch)
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    evalb = EvalB_Gen(cfg, comm, gen_fn)
    learner = Learner(
        uid=cfg.uid + "_fit", cfg=cfg, model=model, variables=variables,
        data=data, eval_fn=evalb,
    )
    learner.fit(epochs=1, lr=1e-3)
    assert learner.num_epoch == 1
    assert learner.model_file.exists()  # best ckpt written
    # resume roundtrip
    learner2 = Learner(
        uid=cfg.uid + "_fit", cfg=cfg, model=model, variables=variables,
        data=data, eval_fn=evalb,
    )
    learner2.load_model_dict(str(learner.model_file))
    assert learner2.num_epoch == 1
    p0 = jax.tree.leaves(learner.variables["params"])[0]
    p1 = jax.tree.leaves(learner2.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.parametrize("enc_type", ["old", "new", "new_conc"])
def test_tx_enc_type_variants(env, enc_type):
    cfg = mk(env, "sfpret_txe_txd_vbarg", **{"mdl.tx_enc_type": enc_type})
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    import jax.numpy as jnp

    out = jax.jit(lambda v, b: model.apply(v, b))(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    assert np.isfinite(float(out["loss"]))
    if enc_type == "new_conc":
        assert "txenc_conc" in variables["params"]


def test_bf16_compute_dtype(env):
    """bfloat16 model body: finite loss, finite generation."""
    cfg = mk(env, "sfpret_txe_txd_vbarg", **{"train.dtype": "bfloat16"})
    comm = build_comm(cfg)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    model = build_model(cfg, comm)
    variables = init_model_variables(model, batch)
    import jax.numpy as jnp

    # params stay float32; compute in bf16
    leaf = jax.tree.leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    out = jax.jit(lambda v, b: model.apply(v, b))(
        variables, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    assert np.isfinite(float(out["loss"]))
    gen_fn = build_srl_generate_fn(cfg, comm, model)
    sents = np.asarray(
        gen_fn(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    assert sents.shape[1:3] == (5, 1)
