"""Tokenization tests, incl. bit-parity with HF's pure-Python GPT-2 BPE."""

import pytest

from vidsitu_tpu.tokenization import (
    BPETokenizer,
    Vocabulary,
    build_vidsitu_gpt2_tokenizer,
    make_gpt2_tokenizer,
    make_roberta_tokenizer,
    train_byte_level_bpe,
)

CORPUS = [
    "a man walks in the park",
    "the woman is walking a dog 123!",
    "speak walk open stare gesture",
    "a man in a white shirt holds the bed",
    "scene of the event is in a home, isn't it?",
] * 3


@pytest.fixture(scope="module")
def bpe():
    return train_byte_level_bpe(CORPUS, vocab_size=350)


def test_bpe_roundtrip(bpe):
    tok = make_gpt2_tokenizer(bpe)
    for s in ["a man walks", "héllo wörld", "  spaces  ", "tab\there"]:
        ids = tok(s)["input_ids"]
        assert tok.decode(ids) == s


def test_bpe_matches_hf_slow_tokenizer(bpe, tmp_path):
    """Same vocab/merges -> identical ids vs transformers.GPT2Tokenizer."""
    transformers = pytest.importorskip("transformers")
    d = tmp_path / "voc"
    bpe.save_dir(d)
    hf = transformers.GPT2Tokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    tests = [
        "a man walks",
        "the woman's dog, 42 times!",
        "unicode: héllo wörld",
        "  double  spaces ",
        "newline\ntab\t.",
        "CamelCase MIXED caps",
    ]
    for t in tests:
        ours = bpe.encode_ordinary(t)
        theirs = hf.convert_tokens_to_ids(hf.tokenize(t))
        assert ours == theirs, t


def test_decode_cleanup_matches_hf(bpe, tmp_path):
    """decode applies HF's clean_up_tokenization_spaces by default —
    the reference decodes generated SRL text with the HF default True
    (evl_vsitu.py:203) before parsing, so ' .' collapses to '.'."""
    transformers = pytest.importorskip("transformers")
    d = tmp_path / "voc"
    bpe.save_dir(d)
    hf = transformers.GPT2Tokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    tok = make_gpt2_tokenizer(bpe)
    for s in ["a man walks .", "a dog , a cat .", "so fast !",
              "a man 's dog"]:
        ids = bpe.encode_ordinary(s)
        assert tok.decode(ids) == hf.decode(
            ids, clean_up_tokenization_spaces=True
        ), s
    # the raw byte-exact decode stays available
    ids = bpe.encode_ordinary("a man walks .")
    assert tok.decode(
        ids, clean_up_tokenization_spaces=False
    ) == "a man walks ."


def test_decode_unknown_id_raises(bpe):
    """Out-of-vocab ids fail loudly (wrong vocab dir), never silently
    truncate the hypothesis string."""
    with pytest.raises(KeyError, match="not in this vocab"):
        bpe.decode_ordinary([10 ** 6])


def test_added_tokens_atomic(bpe):
    tok = make_gpt2_tokenizer(bpe)
    tok.add_special_tokens({"additional_special_tokens": ["<Arg0>", "</Arg0>"]})
    tok.add_tokens(["speak.01"])
    s = "speak.01 <Arg0> a man <Arg0>"
    ids = tok(s)["input_ids"]
    assert tok.added_tokens["speak.01"] in ids
    assert tok.decode(ids) == s
    assert tok.decode(ids, skip_special_tokens=True) == "speak.01  a man "


def test_vidsitu_gpt2_tokenizer(bpe, tmp_path):
    verbs = ["speak.01", "walk.01"]
    args = ["Arg0", "Arg1", "AScn"]
    tok = build_vidsitu_gpt2_tokenizer(bpe, verbs, args)
    # verb ids are single tokens (dat_loader.py:249-252 relies on this)
    av = tok.get_added_vocab()
    assert "speak.01" in av and "<EV_SEP>" in av and "<Arg0>" in av
    assert tok.pad_token_id is not None
    assert tok.eos_token_id is not None
    assert tok.pad() == tok.pad_token_id  # fairseq protocol
    # persistence roundtrip
    d = tmp_path / "vidsitu_voc"
    tok.save_dir(d)
    tok2 = BPETokenizer.from_dir(d)
    s = "walk.01 <Arg0> the man <Arg1> a dog"
    assert tok2(s)["input_ids"] == tok(s)["input_ids"]
    assert tok2.pad_token_id == tok.pad_token_id
    # arg separators SURVIVE special-token stripping (the SRL parser
    # splits the decoded string on them, evl_vsitu.py:174-206); only
    # pad/eos are dropped
    ids = tok2(s)["input_ids"] + [tok2.eos_token_id, tok2.pad_token_id]
    assert tok2.decode(ids, skip_special_tokens=True) == s


def test_roberta_flavor(bpe):
    tok = make_roberta_tokenizer(bpe)
    ids = tok("a man walks")["input_ids"]
    assert ids[0] == tok.bos_token_id
    assert ids[-1] == tok.eos_token_id
    assert tok.sep_token == "</s>"
    # pair building as in dat_loader.py:366-368
    pair = tok("a man" + tok.sep_token + "a dog")["input_ids"]
    assert tok.sep_token_id in pair


def test_specials_in_base_vocab_match_atomically(bpe, tmp_path):
    """Official vocab.json files (roberta-base, gpt2) contain the
    special tokens IN the base vocab. They must still match atomically
    during encode — never BPE-split '</s>' into '</','s','>' — and the
    atomic registration must survive a save/load round-trip."""
    from vidsitu_tpu.tokenization.bpe import ByteLevelBPE

    base = dict(bpe.encoder)
    specials = ["<s>", "</s>", "<pad>", "<unk>", "<mask>"]
    for sp in specials:
        base[sp] = len(base)
    bpe2 = ByteLevelBPE(base, list(bpe._merges_list))
    tok = make_roberta_tokenizer(bpe2)
    assert len(tok.added_tokens) == 0  # all specials live in the base
    assert tok.sep_token_id == base["</s>"]

    pair = tok("a man" + tok.sep_token + "a dog",
               add_special_tokens=False)["input_ids"]
    assert pair.count(tok.sep_token_id) == 1
    # the literal '</s>' chars must not appear as subword ids
    assert tok.decode(pair) == "a man</s>a dog"

    tok.save_dir(tmp_path)
    tok2 = BPETokenizer.from_dir(tmp_path)
    assert tok2("x</s>y", add_special_tokens=False)["input_ids"].count(
        tok2.sep_token_id
    ) == 1


def test_trained_bpe_vocab_is_bijective():
    """Two merge paths can produce the same surface string; the vocab
    must stay a bijection (no two tokens sharing one id)."""
    for seed_corpus in (CORPUS, ["aaab aab ab b aaab aaab ab ab"] * 5,
                        ["xyxy xy x y xyx yxy"] * 7):
        b = train_byte_level_bpe(seed_corpus, vocab_size=400)
        ids = list(b.encoder.values())
        assert len(ids) == len(set(ids)), "duplicate token id"
        assert sorted(ids) == list(range(len(ids))), "id gap"


def test_vocabulary():
    v = Vocabulary.from_symbols(["speak.01", "walk.01"])
    assert v.pad_index == 1 and v.unk_index == 3  # fairseq order
    assert v.index("speak.01") == 4
    assert v.index("nope") == v.unk_index
    assert v.symbols[v.index("walk.01")] == "walk.01"
    assert len(v) == 6


def test_vocabulary_json_roundtrip(tmp_path):
    v = Vocabulary.from_symbols(["a.01", "b.02"])
    p = tmp_path / "voc.json"
    v.save_json(p)
    v2 = Vocabulary.load(p)
    assert v2.symbols == v.symbols
    assert v2.indices == v.indices
    assert v2.pad_index == v.pad_index


def test_from_hf_tokenizer_roundtrip(bpe, tmp_path):
    """HF tokenizer object -> our tokenizer: identical ids."""
    transformers = pytest.importorskip("transformers")
    from vidsitu_tpu.tokenization.import_hf import from_hf_tokenizer

    d = tmp_path / "hfvoc"
    bpe.save_dir(d)
    hf = transformers.GPT2Tokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    hf.add_special_tokens(
        {"additional_special_tokens": ["<Arg0>", "<EV_SEP>"],
         "pad_token": "<|pad|>"}
    )
    hf.add_tokens(["speak.01"])
    ours = from_hf_tokenizer(hf)
    for s in ["a man walks", "speak.01 <Arg0> a man", "<EV_SEP> dog"]:
        assert ours(s)["input_ids"] == hf(s)["input_ids"], s
    assert ours.pad_token_id == hf.pad_token_id
    assert ours.get_added_vocab() == hf.get_added_vocab()


def test_vocab_load_pickled_fairseq_like(tmp_path):
    """Pickled Dictionary-like objects load without the source package."""
    import pickle
    import types, sys

    # fabricate a module + class, pickle an instance, then remove the module
    mod = types.ModuleType("fake_fairseq_dict")

    class Dictionary:
        pass

    Dictionary.__module__ = "fake_fairseq_dict"
    Dictionary.__qualname__ = "Dictionary"
    mod.Dictionary = Dictionary
    sys.modules["fake_fairseq_dict"] = mod
    d = Dictionary()
    d.symbols = ["<s>", "<pad>", "</s>", "<unk>", "speak.01"]
    d.indices = {s: i for i, s in enumerate(d.symbols)}
    d.pad_index, d.eos_index, d.unk_index, d.bos_index = 1, 2, 3, 0
    p = tmp_path / "verb_id_vocab.pkl"
    with open(p, "wb") as f:
        pickle.dump(d, f)
    del sys.modules["fake_fairseq_dict"]

    v = Vocabulary.load(p)
    assert v.symbols[4] == "speak.01"
    assert v.index("speak.01") == 4
    assert v.pad() == 1 and v.unk() == 3
