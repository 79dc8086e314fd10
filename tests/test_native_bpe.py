"""C++ BPE core parity: native encode ids == pure-Python encode ids.

The native core (vidsitu_tpu/native/bpe_core.cpp) reimplements GPT-2
pre-tokenization (with \\p{L}/\\p{N}/\\s tables generated from the regex
module) and the ranked merge loop; these tests assert id-identity with
the Python reference path across unicode, whitespace, contraction, and
byte-edge cases, and through the full task tokenizer.
"""

import pytest

from vidsitu_tpu.native import load_bpe_core
from vidsitu_tpu.tokenization import (
    make_gpt2_tokenizer,
    train_byte_level_bpe,
)

pytestmark = pytest.mark.skipif(
    load_bpe_core() is None, reason="no C++ toolchain / native disabled"
)

CORPUS = [
    "a man walks in the park",
    "the woman is walking a dog 123!",
    "speak walk open stare gesture",
    "a man in a white shirt holds the bed",
    "scene of the event is in a home, isn't it?",
] * 3

TRICKY = [
    "",
    "a man walks",
    "hello world",
    "  leading and   multiple   spaces ",
    "trailing spaces   ",
    "\t tabs\tand\nnewlines \n\n",
    "isn't it? we'll see, they're 'quoted'",
    "he's we've I'm you'd she'll",
    "numbers 123 456x7 3.14!",
    "punct!!! ... ---(brackets)[ok]{fine}",
    "héllo wörld naïve café",
    "日本語のテキスト and mixed English",
    "эмодзи 😀😃 test",
    "a",
    " ",
    "   ",
    " nbsp run",
    "word thin spaces",
    "'s standalone contraction start",
    "CAPS MiXeD caSe",
]


@pytest.fixture(scope="module")
def bpe():
    return train_byte_level_bpe(CORPUS, vocab_size=350)


def test_native_matches_python_core(bpe):
    assert bpe._native_core() is not None
    for s in TRICKY + CORPUS:
        native = bpe._native_core().encode(s)
        py = bpe._encode_ordinary_py(s)
        assert native == py, repr(s)


def test_native_through_task_tokenizer(bpe):
    """Added special tokens split around the native core identically."""
    tok = make_gpt2_tokenizer(bpe)
    tok.add_tokens(["<Arg0>", "<Arg1>"])
    for s in ["a man <Arg0> walks <Arg1> the park", "<Arg0><Arg1>"]:
        ids = tok(s)["input_ids"]
        import os

        os.environ["VIDSITU_NO_NATIVE"] = "1"
        try:
            bpe2 = train_byte_level_bpe(CORPUS, vocab_size=350)
            tok2 = make_gpt2_tokenizer(bpe2)
            tok2.add_tokens(["<Arg0>", "<Arg1>"])
            assert tok2(s)["input_ids"] == ids
        finally:
            del os.environ["VIDSITU_NO_NATIVE"]


def test_all_single_bytes(bpe):
    for b in range(256):
        s = bytes([b]).decode("latin-1")
        assert bpe._native_core().encode(s) == bpe._encode_ordinary_py(s), b
