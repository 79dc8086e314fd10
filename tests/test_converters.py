"""Weight-converter parity: our flax modules vs torch HF models with the
same (random) weights must produce matching logits."""

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


def test_gpt2_logits_parity():
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=97, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    sd = state_dict_to_numpy(hf.state_dict())
    params = convert_gpt2(sd, n_layers=2, n_heads=4)

    cfg = TxConfig(
        vocab_size=97, d_model=48, ffn_dim=192, n_layers=2, n_heads=4,
        dropout=0.0, max_len=64, normalize_before=True, scale_embed=False,
        learned_pos=True, share_in_out_embed=True, pad_id=0,
        activation="gelu", final_ln=True,
    )
    dec = TransformerDecoder(cfg, has_cross=False)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 97, size=(2, 10))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    ours = np.asarray(
        jax.jit(lambda t: dec.apply({"params": params}, t))(
            jnp.asarray(toks, jnp.int32)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_gpt2_resize_embeddings():
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=50, n_positions=32, n_embd=16, n_layer=1, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    sd = state_dict_to_numpy(hf.state_dict())
    params = convert_gpt2(sd, n_layers=1, n_heads=2, target_vocab=60)
    assert params["embed_tokens"]["embedding"].shape == (60, 16)
    # original rows preserved
    np.testing.assert_array_equal(
        params["embed_tokens"]["embedding"][:50],
        sd["transformer.wte.weight"],
    )


def test_roberta_hidden_and_pooler_parity():
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=80, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    hf = HFRobertaModel(hf_cfg, add_pooling_layer=True).eval()
    sd = state_dict_to_numpy(hf.state_dict())
    params = convert_roberta(sd, n_layers=2, n_heads=4)

    cfg = RobertaCfg(
        vocab_size=120, d_model=48, n_layers=2, n_heads=4, ffn_dim=96,
        max_pos=80, pad_id=1, dropout=0.0,
    )
    model = RobertaModel(cfg, add_pooling_layer=True)

    rng = np.random.default_rng(2)
    toks = rng.integers(3, 119, size=(2, 12))
    toks[0, 9:] = 1  # pad tail
    attn = (toks != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(toks), attention_mask=torch.tensor(attn))
    out = jax.jit(
        lambda t, a: model.apply({"params": params}, t, a)
    )(jnp.asarray(toks, jnp.int32), jnp.asarray(attn, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"])[attn.astype(bool)],
        ref.last_hidden_state.numpy()[attn.astype(bool)],
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]),
        ref.pooler_output.numpy(),
        atol=2e-4,
    )


def test_converted_gpt2_into_srl_model(tmp_path):
    """HF GPT-2 -> converted params -> new_gpt2_only SRL model generates."""
    import torch as _torch
    from transformers import GPT2Config, GPT2LMHeadModel

    from vidsitu_tpu.data import build_comm, get_data
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.models.selector import (
        build_model,
        build_srl_generate_fn,
        init_model_variables,
    )
    from vidsitu_tpu.train.pretrained import load_pretrained_variables
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(tmp_path / "d", n_train=8, n_valid=4, seed=95)
    cfg = get_cfg_with_overrides(
        "gpt2pre",
        **{
            **paths,
            "task_type": "vb_arg",
            "mdl.mdl_name": "new_gpt2_only",
            "gpt2_mdl.d_model": 32,
            "gpt2_mdl.n_layers": 1,
            "gpt2_mdl.n_heads": 2,
            "gpt2_mdl.max_pos": 128,
            "train.bs": 8,
            "train.bsv": 4,
            "train.nw": 0,
            "train.nwv": 0,
            "train.dtype": "float32",
        },
    )
    comm = build_comm(cfg)
    base_vocab = len(comm.gpt2_hf_tok.bpe)

    hf_cfg = GPT2Config(
        vocab_size=base_vocab, n_positions=128, n_embd=32, n_layer=1,
        n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    _torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    ckpt_path = tmp_path / "gpt2_tiny.pt"
    _torch.save(hf.state_dict(), ckpt_path)

    cfg.defrost()
    cfg.mdl.gpt2_mdl_path = str(ckpt_path)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    batch = next(iter(data.valid_dl))
    variables = init_model_variables(model, batch)
    variables = load_pretrained_variables(cfg, model, variables)
    # token embedding resized to the augmented vocab
    emb = variables["params"]["decoder"]["embed_tokens"]["embedding"]
    assert emb.shape[0] == len(comm.gpt2_hf_tok)
    np.testing.assert_array_equal(
        np.asarray(emb)[:base_vocab],
        hf.state_dict()["transformer.wte.weight"].numpy(),
    )

    gen_fn = build_srl_generate_fn(cfg, comm, model)
    out = np.asarray(
        gen_fn(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    assert out.shape[:3] == (4, 5, 1)
    assert np.isfinite(out.astype(np.float64)).all()
