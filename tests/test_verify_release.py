"""End-to-end test of the real-artifact readiness harness
(python -m vidsitu_tpu.verify_release) against a fabricated release tree
holding REAL-FORMAT artifacts: a pickled live GPT2TokenizerFast
(dat_loader.py:87-89) and a fairseq-Dictionary-shaped pickle
(dat_loader.py:81-83)."""

import json
import pickle

import pytest

from vidsitu_tpu.data.synth import make_release_tree
from vidsitu_tpu.verify_release import main


@pytest.fixture(scope="module")
def release(tmp_path_factory):
    root = tmp_path_factory.mktemp("release")
    make_release_tree(root, with_frames=True, frame_hw=64)
    return root


def test_release_tree_passes(release, capsys):
    rc = main(["--dir", str(release)])
    out = capsys.readouterr().out
    assert rc == 0, out
    # the three data-layer epochs all ran
    assert "debug epoch[vb/sf_base]" in out
    assert "[ok]   debug epoch[vb_arg/tx_only]" in out
    assert "[ok]   debug epoch[vb_arg/sfpret_txe_txd_vbarg]" in out
    # converted artifacts exist and reload
    from vidsitu_tpu.tokenization.tokenizer import BPETokenizer
    from vidsitu_tpu.tokenization.vocab import Vocabulary

    conv = release / "converted_tpu"
    voc = Vocabulary.load(conv / "verb_id_vocab.json")
    assert len(voc) > 10
    tok = BPETokenizer.from_dir(conv / "bpe_with_seps_vb_arg_vocab")
    assert "<EV_SEP>" in tok.get_added_vocab()


def test_fairseq_pickle_loads_without_fairseq(release):
    """The verb vocab pickle references fairseq.data.dictionary.Dictionary,
    which is NOT installed — the tolerant unpickler must substitute."""
    with pytest.raises(ModuleNotFoundError):
        import fairseq  # noqa: F401
    from vidsitu_tpu.tokenization.vocab import Vocabulary

    voc = Vocabulary.load(release / "vsitu_vocab" / "verb_id_vocab.pkl")
    assert voc.indices["walk.01"] == voc.symbols.index("walk.01")
    assert voc.pad_index == 1 and voc.unk_index == 3


def test_hf_pickle_is_live_tokenizer(release):
    from transformers import GPT2TokenizerFast

    with open(
        release / "vsitu_vocab" / "bpe_with_seps_vb_arg_vocab.pkl", "rb"
    ) as f:
        tok = pickle.load(f)
    assert isinstance(tok, GPT2TokenizerFast)
    assert "<EV_SEP>" in tok.get_added_vocab()
    assert tok.pad_token == "<|pad|>"


def test_precise_errors_on_corruption(release, tmp_path, capsys):
    """Corrupt one annotation file; the harness must FAIL that check with
    a precise message and still run the others."""
    import shutil

    bad = tmp_path / "bad_release"
    shutil.copytree(release, bad)
    ann = (
        bad / "vidsitu_annotations" / "vseg_ann_files" / "vsann_valid_lb.json"
    )
    lst = json.loads(ann.read_text())
    del lst[0]["Ev3"]
    ann.write_text(json.dumps(lst))
    rc = main(["--dir", str(bad), "--no_epoch"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] ann[valid]" in out and "Ev3" in out
    assert "[ok]   ann[train]" in out  # other checks still ran


def test_missing_vocab_pickle_reported(release, tmp_path, capsys):
    import shutil

    bad = tmp_path / "novocab"
    shutil.copytree(release, bad)
    (bad / "vsitu_vocab" / "verb_id_vocab.pkl").unlink()
    rc = main(["--dir", str(bad), "--no_epoch"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] verb_id_vocab.pkl" in out


@pytest.mark.slow
def test_release_train_step(tmp_path, capsys):
    """--train_step runs ONE real jitted fwd+bwd+Adam step per task
    against the release's converted vocabs (no frames dir -> vb skips,
    no roberta dir -> evrel skips; both SRL variants must step)."""
    make_release_tree(tmp_path)  # no frames
    rc = main(["--dir", str(tmp_path), "--train_step"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok]   train step[vb_arg/tx_only]" in out
    assert "[ok]   train step[vb_arg/sfpret_txe_txd_vbarg]" in out
    assert "param tensors updated" in out


# --------------------------------------------------------------- --weights
@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """Fabricate a published-weights directory at REAL schemas but tiny
    dims (VERDICT r4 #8): HF gpt2/roberta torch weights in their
    on-disk layout (pytorch_model.bin + config.json), a caffe2 SlowFast
    blob pickle, and a reference-trained sf_base Learner .pth
    (module.sf_mdl.* + proj_head.* under model_state_dict)."""
    import numpy as np

    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    root = tmp_path_factory.mktemp("weights")

    gdir = root / "gpt2"
    gdir.mkdir()
    gcfg = GPT2Config(
        vocab_size=97, n_positions=32, n_embd=32, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    torch.save(GPT2LMHeadModel(gcfg).eval().state_dict(),
               gdir / "pytorch_model.bin")
    (gdir / "config.json").write_text(gcfg.to_json_string())

    rdir = root / "roberta"
    rdir.mkdir()
    rcfg = RobertaConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=36, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    torch.save(HFRoberta(rcfg, add_pooling_layer=False).eval().state_dict(),
               rdir / "pytorch_model.bin")
    (rdir / "config.json").write_text(rcfg.to_json_string())

    # caffe2 + trained sf_base: fabricate from a depth-26 slowfast model
    from tests.test_caffe2_converter import _flax_to_caffe2_name
    from tests.test_slowfast_converter import _fabricate_pysf_sd, _flatten
    from vidsitu_tpu.data import build_comm, get_data
    from vidsitu_tpu.data.synth import make_synth_dataset
    from vidsitu_tpu.models.selector import build_model, init_model_variables
    from vidsitu_tpu.utils.config import get_cfg_with_overrides

    paths = make_synth_dataset(root / "d", n_train=8, n_valid=4, seed=88,
                               with_frames=True)
    cfg = get_cfg_with_overrides(
        "wsweep",
        **{
            **paths, "task_type": "vb", "mdl.mdl_name": "sf_base",
            "mdl.sf_mdl_name": "slow_fast_nl_r50_8x8",
            "vid_mdl.resnet.depth": 26, "vid_mdl.crop_size": 32,
            "vid_mdl.num_frames": 4, "train.bs": 2, "train.nw": 0,
            "train.dtype": "float32",
        },
    )
    comm = build_comm(cfg)
    data = get_data(cfg)
    model = build_model(cfg, comm)
    variables = init_model_variables(model, next(iter(data.train_dl)))
    flat_p = _flatten(variables["params"]["backbone"], ("backbone",))
    flat_s = _flatten(variables["batch_stats"]["backbone"], ("backbone",))

    blobs = {}
    for path, arr in {**flat_p, **flat_s}.items():
        name, kind = _flax_to_caffe2_name(path)
        a = np.asarray(arr)
        if kind == "conv":
            a = np.transpose(a, (4, 3, 0, 1, 2))
        blobs[name] = a
    with open(root / "SLOWFAST_8x8_R50.pkl", "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    rng = np.random.default_rng(2)
    sd = _fabricate_pysf_sd(flat_p, flat_s, multi=True)
    full = {f"module.sf_mdl.{k}": v for k, v in sd.items()}
    w = 64 * 32 + 64 * 32 // 8
    nverbs = len(comm.vb_id_vocab)
    full["module.proj_head.0.weight"] = rng.standard_normal(
        (w // 2, w)).astype(np.float32)
    full["module.proj_head.0.bias"] = np.zeros(w // 2, np.float32)
    full["module.proj_head.2.weight"] = rng.standard_normal(
        (nverbs, w // 2)).astype(np.float32)
    full["module.proj_head.2.bias"] = np.zeros(nverbs, np.float32)
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                              for k, v in full.items()},
         "num_it": 7},
        root / "vb_slow_fast_nl_r50_8x8_model.pth",
    )
    # an unrecognizable payload must be reported, not silently ignored
    torch.save({"mystery.weight": torch.zeros(3)}, root / "unknown.pt")
    return root


def test_weights_sweep(weights_dir, capsys):
    """--weights converts every artifact with strict key accounting and
    logit-spot-checks the language models against torch/HF."""
    rc = main(["--weights", str(weights_dir)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok]   weights[gpt2/pytorch_model.bin]" in out
    assert "logits == torch/HF" in out
    assert "[ok]   weights[roberta/pytorch_model.bin]" in out
    assert "hidden states == torch/HF" in out
    assert "[ok]   weights[SLOWFAST_8x8_R50.pkl]" in out
    assert "caffe2/slowfast: strict-converted" in out
    assert "[ok]   weights[vb_slow_fast_nl_r50_8x8_model.pth]" in out
    assert "sfbase/slowfast" in out
    assert "[skip] weights[unknown.pt]" in out and "unrecognized" in out


def test_weights_sweep_unprefixed_gpt2(tmp_path, capsys):
    """The hub-published gpt2/gpt2-medium layout stores the backbone
    keys UNprefixed ('wte.weight', 'h.0. ...' — transformers adds the
    'transformer.' base_model_prefix at load time); the spot-check must
    rebuild the HF model from that layout too (round-5 review fix)."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    gdir = tmp_path / "gpt2_hub"
    gdir.mkdir()
    gcfg = GPT2Config(
        vocab_size=97, n_positions=32, n_embd=32, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(4)
    torch.save(GPT2LMHeadModel(gcfg).eval().transformer.state_dict(),
               gdir / "pytorch_model.bin")
    (gdir / "config.json").write_text(gcfg.to_json_string())
    rc = main(["--weights", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok]   weights[gpt2_hub/pytorch_model.bin]" in out
    assert "logits == torch/HF" in out


def test_weights_honored_alongside_dir(release, weights_dir, capsys):
    """`--dir X --weights Y` must run BOTH surfaces — the weights sweep
    used to be silently dropped when a release dir was also given
    (round-5 review fix). --no_epoch keeps the combined run cheap."""
    rc = main(["--dir", str(release), "--weights", str(weights_dir),
               "--no_epoch"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[ok]   weights[gpt2/pytorch_model.bin]" in out
    assert "[ok]   weights[SLOWFAST_8x8_R50.pkl]" in out


def test_weights_sweep_catches_corruption(weights_dir, tmp_path, capsys):
    """A checkpoint with an extra (unconsumed) key must FAIL its entry
    while the rest of the sweep still runs."""
    import shutil

    import numpy as np

    torch = pytest.importorskip("torch")
    bad = tmp_path / "badw"
    shutil.copytree(weights_dir / "gpt2", bad / "gpt2")
    sd = torch.load(bad / "gpt2" / "pytorch_model.bin", weights_only=True)
    sd["transformer.h.2.ln_1.weight"] = torch.zeros(32)
    torch.save(sd, bad / "gpt2" / "pytorch_model.bin")
    rc = main(["--weights", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] weights[gpt2/pytorch_model.bin]" in out
    assert "h.2" in out


@pytest.mark.slow
def test_fit_rehearsal_single_task(tmp_path, capsys):
    """--fit lifecycle on one task: epochs -> beamed validation ->
    best-ckpt -> leaderboard pkl -> scoring -> resume -> continued
    epoch, with a machine-readable receipt (VERDICT r4 #1)."""
    from vidsitu_tpu.verify_release import Report, fit_rehearsal

    # pre-seed a stale tracker stream from a "previous rehearsal" in the
    # same work dir: the tracker appends, so --fit must drop it or the
    # epoch-count check reads 3 records (round-5 review fix)
    stale = (tmp_path / "w" / "tmp" / "tracking" / "vsitu_fin_vb_arg"
             / "fit_vb_arg_sfpret_txe_txd_vbarg" / "metrics.jsonl")
    stale.parent.mkdir(parents=True)
    stale.write_text('{"trn_loss": 99.9}\n')

    rep = Report()
    receipt = fit_rehearsal(
        tmp_path / "w", rep, epochs=2,
        tasks=[("vb_arg", "sfpret_txe_txd_vbarg")],
    )
    out = capsys.readouterr().out
    assert not rep.failed, out
    t = receipt["tasks"][0]
    assert t["loss_drop"] > 0
    assert len(t["trn_loss"]) == 2
    # resume loads the BEST checkpoint; an untrained model's cider
    # plateaus at 0.0 so the best save is epoch 1 (strict-improvement
    # semantics, reference trn_utils.py:825)
    assert t["resume_epoch"] >= 1
    assert "cider" in t["val_metrics"]
    assert (tmp_path / "w" / "fit_receipt.json").exists()
    import os

    assert os.path.exists(t["pred_pkl"])
