"""Full-size converter fidelity rehearsal (no downloads).

The toy-dim parity tests (test_converters.py) prove the MATH of the
conversions; these prove the SCHEMA at the real checkpoint sizes the
reference consumes (trn_utils.py:358-375, mdl_sf_base.py:467-530,
mdl_evrel.py:21-24): the exact gpt2-medium (24L/1024d) and roberta-base
(12L/768d, MaskedLM on-disk layout) key sets are built in-test by
constructing the real HF architectures from config (random weights, no
network), converted with ``strict=True`` (every source key must be
consumed — a missing key raises KeyError at the access site, an
unconsumed key raises ValueError), loaded, and forward-checked for
logit parity at full width. The caffe2 SLOWFAST_8x8_R50 blob set is
fabricated at the real depth-50 block counts (3,4,6,3).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from vidsitu_tpu.convert.hf_torch import (
    convert_gpt2,
    convert_roberta,
    state_dict_to_numpy,
)
from vidsitu_tpu.models.roberta import RobertaCfg, RobertaModel
from vidsitu_tpu.models.transformer import TransformerDecoder, TxConfig

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def gpt2_medium_sd():
    """Real gpt2-medium key set: construct the architecture from config
    (vocab 50257, 1024 positions, 24 layers, d=1024, 16 heads)."""
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=50257, n_positions=1024, n_embd=1024, n_layer=24,
        n_head=16, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(cfg).eval()
    return hf, state_dict_to_numpy(hf.state_dict())


def test_gpt2_medium_fullsize_strict_and_parity(gpt2_medium_sd):
    hf, sd = gpt2_medium_sd
    # the reference resizes for its added special/verb tokens
    # (dat_loader.py:84-122); rehearse with a realistic augmentation
    target_vocab = 50257 + 11
    params = convert_gpt2(
        sd, n_layers=24, n_heads=16, target_vocab=target_vocab, strict=True
    )
    assert params["embed_tokens"]["embedding"].shape == (target_vocab, 1024)
    assert params["embed_positions"]["embedding"].shape == (1024, 1024)
    assert "layers_23" in params and "layers_24" not in params

    cfg = TxConfig(
        vocab_size=target_vocab, d_model=1024, ffn_dim=4096, n_layers=24,
        n_heads=16, dropout=0.0, max_len=1024, normalize_before=True,
        scale_embed=False, learned_pos=True, share_in_out_embed=True,
        pad_id=0, activation="gelu", final_ln=True,
    )
    dec = TransformerDecoder(cfg, has_cross=False)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 50257, size=(1, 8))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    ours = np.asarray(
        jax.jit(lambda t: dec.apply({"params": params}, t))(
            jnp.asarray(toks, jnp.int32)
        )
    )[:, :, :50257]
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    # tight agreement in aggregate at full width
    assert float(np.abs(ours - ref).mean()) < 2e-4


def test_gpt2_medium_missing_key_raises(gpt2_medium_sd):
    _, sd = gpt2_medium_sd
    broken = dict(sd)
    del broken["transformer.h.17.mlp.c_proj.bias"]
    with pytest.raises(KeyError, match="h.17.mlp.c_proj.bias"):
        convert_gpt2(broken, n_layers=24, n_heads=16, strict=True)


def test_gpt2_medium_unconsumed_key_raises(gpt2_medium_sd):
    _, sd = gpt2_medium_sd
    extra = dict(sd)
    # e.g. a checkpoint with one more layer than the config claims
    extra["transformer.h.24.ln_1.weight"] = np.zeros(1024, np.float32)
    with pytest.raises(ValueError, match="h.24.ln_1.weight"):
        convert_gpt2(extra, n_layers=24, n_heads=16, strict=True)
    # without strict the legacy silent behavior is preserved
    convert_gpt2(extra, n_layers=24, n_heads=16, strict=False)


@pytest.fixture(scope="module")
def roberta_base_sd():
    """roberta-base in its published on-disk layout: RobertaForMaskedLM
    (roberta.* + lm_head.*, no pooler), 12 layers, d=768, vocab 50265."""
    from transformers import RobertaConfig, RobertaForMaskedLM

    cfg = RobertaConfig(
        vocab_size=50265, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    hf = RobertaForMaskedLM(cfg).eval()
    return hf, state_dict_to_numpy(hf.state_dict())


def test_roberta_base_fullsize_strict_and_parity(roberta_base_sd):
    hf, sd = roberta_base_sd
    # lm_head.* keys must be ignored by the strict accounting
    assert any(k.startswith("lm_head.") for k in sd)
    params = convert_roberta(sd, n_layers=12, n_heads=12, strict=True)
    assert params["word_embeddings"]["embedding"].shape == (50265, 768)
    assert "layers_11" in params and "layers_12" not in params
    assert "pooler_dense" not in params  # MaskedLM layout has no pooler

    cfg = RobertaCfg(
        vocab_size=50265, d_model=768, n_layers=12, n_heads=12,
        ffn_dim=3072, max_pos=514, pad_id=1, dropout=0.0,
    )
    model = RobertaModel(cfg, add_pooling_layer=False)
    rng = np.random.default_rng(3)
    toks = rng.integers(3, 50260, size=(1, 10))
    attn = np.ones_like(toks)
    with torch.no_grad():
        ref = hf.roberta(
            torch.tensor(toks), attention_mask=torch.tensor(attn)
        ).last_hidden_state.numpy()
    out = jax.jit(lambda t, a: model.apply({"params": params}, t, a))(
        jnp.asarray(toks, jnp.int32), jnp.asarray(attn, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref, atol=5e-3
    )
    assert float(np.abs(np.asarray(out["last_hidden_state"]) - ref).mean()) \
        < 2e-4


def test_roberta_base_unconsumed_key_raises(roberta_base_sd):
    _, sd = roberta_base_sd
    extra = dict(sd)
    extra["roberta.encoder.layer.12.output.dense.weight"] = np.zeros(
        (768, 3072), np.float32
    )
    with pytest.raises(ValueError, match="layer.12"):
        convert_roberta(extra, n_layers=12, n_heads=12, strict=True)


# ---------------------------------------------------------------------------
# caffe2 SLOWFAST_8x8_R50 at the real depth-50 block counts
# ---------------------------------------------------------------------------


def _r50_blob_names():
    """The caffe2 blob-name set of a Kinetics SLOWFAST R50 checkpoint:
    stems + fuse convs + res{2..5}_{i}_branch{1,2{a,b,c}} at block counts
    (3,4,6,3), for both pathways (fast prefixed t_)."""
    names = []
    for pre in ("", "t_"):
        names.append(f"{pre}conv1_w")
        for suf in ("s", "b", "rm", "riv"):
            names.append(f"{pre}res_conv1_bn_{suf}")
        for stage, nblk in ((2, 3), (3, 4), (4, 6), (5, 3)):
            for i in range(nblk):
                for suf in ("_w",):
                    names.append(f"{pre}res{stage}_{i}_branch2a{suf}")
                    names.append(f"{pre}res{stage}_{i}_branch2b{suf}")
                    names.append(f"{pre}res{stage}_{i}_branch2c{suf}")
                    if i == 0:
                        names.append(f"{pre}res{stage}_{i}_branch1{suf}")
                for part in ("branch2a", "branch2b", "branch2c") + (
                    ("branch1",) if i == 0 else ()
                ):
                    for suf in ("s", "b", "rm", "riv"):
                        names.append(f"{pre}res{stage}_{i}_{part}_bn_{suf}")
    # fast->slow lateral fusion (after stem and after s2..s4)
    names.append("t_pool1_subsample_w")
    for suf in ("s", "b", "rm", "riv"):
        names.append(f"t_pool1_subsample_bn_{suf}")
    for stage in (2, 3, 4):
        names.append(f"t_res{stage}_0_branch2c_bn_subsample_w")
        for suf in ("s", "b", "rm", "riv"):
            names.append(f"t_res{stage}_0_branch2c_bn_subsample_bn_{suf}")
    return names


def test_caffe2_r50_depth50_keyset(tmp_path):
    """Depth-50 SlowFast: fabricate the full R50 blob-name set with the
    model's real shapes, convert strict, and require the converted tree
    to cover the flax model's parameter tree key-for-key."""
    from vidsitu_tpu.convert.caffe2 import convert_caffe2_backbone
    from vidsitu_tpu.data import build_comm, get_data
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.models.selector import build_model, init_model_variables
    from vidsitu_tpu.utils.config import get_cfg_with_overrides
    from tests.test_slowfast_converter import _flatten
    from tests.test_caffe2_converter import _flax_to_caffe2_name

    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4,
                               seed=84, with_frames=True)
    cfg = get_cfg_with_overrides(
        "c2r50",
        **{
            **paths,
            "task_type": "vb",
            "mdl.mdl_name": "sf_base",
            # plain slowfast (no NL blocks): the published
            # SLOWFAST_8x8_R50 Kinetics caffe2 checkpoint has none
            "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
            "vid_mdl.resnet.depth": 50,
            "vid_mdl.crop_size": 32,
            "vid_mdl.num_frames": 8,
            "train.bs": 2,
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
    # depth-50 block counts (3,4,6,3) in the flax tree
    for stage, nblk in ((2, 3), (3, 4), (4, 6), (5, 3)):
        for pn in ("slow", "fast"):
            assert ("backbone", f"s{stage}_{pn}", f"block_{nblk - 1}", "c",
                    "conv", "kernel") in flat_p
            assert ("backbone", f"s{stage}_{pn}", f"block_{nblk}", "c",
                    "conv", "kernel") not in flat_p

    blobs = {}
    for path, arr in {**flat_p, **flat_s}.items():
        name, kind = _flax_to_caffe2_name(path)
        a = np.asarray(arr)
        if kind == "conv":
            a = np.transpose(a, (4, 3, 0, 1, 2))
        blobs[name] = a
    # the model-derived blob names must equal the R50 name inventory
    # (modulo NL blocks which this model config includes/excludes)
    expected = set(n for n in _r50_blob_names())
    produced = set(n for n in blobs if "nonlocal" not in n)
    assert produced == expected, (
        f"missing={sorted(expected - produced)[:5]} "
        f"extra={sorted(produced - expected)[:5]}"
    )
    # real checkpoints also carry bookkeeping blobs — must be ignored
    blobs["pred_w"] = np.zeros((400, 2304), np.float32)
    blobs["pred_b"] = np.zeros((400,), np.float32)
    blobs["conv1_w_momentum"] = np.zeros((1,), np.float32)
    blobs["model_iter"] = np.zeros((1,), np.float32)
    blobs["lr"] = np.zeros((1,), np.float32)

    params, stats = convert_caffe2_backbone(blobs, "slowfast", strict=True)
    cp = _flatten(params, ("backbone",))
    cs = _flatten(stats, ("backbone",))
    assert set(cp.keys()) == set(flat_p.keys())
    assert set(cs.keys()) == set(flat_s.keys())
    for k in flat_p:
        np.testing.assert_array_equal(cp[k], np.asarray(flat_p[k]),
                                      err_msg=str(k))

    # adversarial: an unknown blob must fail strict conversion
    blobs["res6_0_branch2a_w"] = np.zeros((4, 4, 1, 1, 1), np.float32)
    with pytest.raises(ValueError):
        convert_caffe2_backbone(blobs, "slowfast", strict=True)
