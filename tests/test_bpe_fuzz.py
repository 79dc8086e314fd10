"""Randomized BPE parity fuzz: python core == native C++ core == HF slow.

The hand-case parity tests (test_tokenization.py, test_native_bpe.py)
pin a few strings; this fuzzes hundreds of adversarial inputs — unicode
mixtures, whitespace runs, byte edge cases, contraction patterns (GPT-2's
regex splits 's/'t/'re/..., ref tokenizer behavior via HF slow
GPT2Tokenizer on the same vocab/merges) — so a subtle divergence in the
pair-merge loop, the byte encoder, or the pre-tokenize regex cannot hide
behind friendly fixtures.
"""

import random

import pytest

from vidsitu_tpu.tokenization import train_byte_level_bpe

CORPUS = [
    "a man walks in the park while speaking loudly",
    "the woman is walking a dog 123! isn't she?",
    "speak walk open stare gesture don't can't we're",
    "a man in a white shirt holds the bed 'quoted'",
    "scene of the event is in a home, isn't it?",
    "numbers 0 12 345 6789 and CAPS MiXeD case",
] * 3


@pytest.fixture(scope="module")
def bpe():
    return train_byte_level_bpe(CORPUS, vocab_size=400)


def _random_strings(n=300, seed=7):
    rng = random.Random(seed)
    words = (
        "a man walks the woman dog speak don't isn't we're it's o'clock "
        "CamelCase MIXED lower 123 42nd 0x1f !?.,;:-() [] {} <tag> "
        "héllo wörld naïve café 日本語 emoji😀ok ::-- ''"
    ).split()
    ws = [" ", "  ", "\t", "\n", "\r\n", " \t ", ""]
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        parts = []
        for _ in range(k):
            parts.append(rng.choice(words))
            parts.append(rng.choice(ws))
        # occasionally lead/trail with whitespace or raw unicode
        s = rng.choice(["", " ", "\n"]) + "".join(parts)
        if rng.random() < 0.2:
            s += chr(rng.randint(0x20, 0x2FF))
        out.append(s)
    # fixed nasty cases
    out += [
        "",
        " ",
        "   ",
        "\n\n\t",
        "'s 't 're 've 'm 'll 'd",  # all GPT-2 contraction branches
        "word's word't word're word've word'm word'll word'd",
        "a" * 200,
        " " * 64 + "x",
        "mixed日本語and ascii",
        " nbsp emsp",  # unicode whitespace classes
        "trailing space ",
        "😀😀 double emoji",
    ]
    return out


def test_fuzz_roundtrip_and_native(bpe):
    """encode_ordinary dispatches to the native core when available, so
    the parity assertion must pin the PURE-PYTHON reference against it
    (native.encode(s) == bpe.encode_ordinary(s) would compare the
    native path with itself)."""
    native = bpe._native_core()
    for s in _random_strings():
        ids = bpe.encode_ordinary(s)
        assert bpe.decode_ordinary(ids) == s, repr(s)
        assert bpe._encode_ordinary_py(s) == ids, repr(s)
        if native is not None:
            assert native.encode(s) == ids, repr(s)


def test_fuzz_matches_hf_slow_tokenizer(bpe, tmp_path):
    transformers = pytest.importorskip("transformers")
    d = tmp_path / "voc"
    bpe.save_dir(d)
    hf = transformers.GPT2Tokenizer(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt")
    )
    for s in _random_strings(n=150, seed=11):
        ours = bpe.encode_ordinary(s)
        theirs = hf.convert_tokens_to_ids(hf.tokenize(s))
        assert ours == theirs, repr(s)
