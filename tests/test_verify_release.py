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
