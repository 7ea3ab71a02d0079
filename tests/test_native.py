"""Native C++ WordPiece fast path: build, parity with the pure-Python
tokenizer (which is itself HF-parity-tested), and fallback behavior."""

import numpy as np
import pytest

from mmvqa_tpu.data.tokenizer import (
    WordPieceTokenizer,
    build_vocab_from_corpus,
    write_vocab,
)
from mmvqa_tpu.native import native_available

CORPUS = [
    "Chest X-ray showing bilateral pneumonia with pleural effusion.",
    "CT scan of the abdomen demonstrates a hepatic lesion!",
    "what plane is this image taken in?",
    "ultra-sound image; gall.bladder, suspected...",
    "numbers 123 and mixed a1b2c3 tokens",
]


@pytest.fixture(scope="module")
def tok_pair(tmp_path_factory):
    vocab = build_vocab_from_corpus(CORPUS * 2, max_size=2000)
    path = str(tmp_path_factory.mktemp("nvocab") / "vocab.txt")
    write_vocab(vocab, path)
    fast = WordPieceTokenizer.from_vocab_file(path)       # native-enabled
    slow = WordPieceTokenizer.from_vocab_file(path)
    slow._native_lib = None                                # force python path
    return fast, slow


def test_native_builds():
    assert native_available(), "g++ fast path failed to build"


def test_native_matches_python(tok_pair):
    fast, slow = tok_pair
    assert getattr(fast, "_native_lib", None) is not None
    for text in CORPUS + ["UPPER lower MiXeD", "a" * 150, "  spaces   "]:
        assert fast.tokenize(text) == slow.tokenize(text), text
        assert fast.encode(text) == slow.encode(text), text


def test_non_ascii_falls_back(tok_pair):
    fast, slow = tok_pair
    text = "café au lait 中文"
    assert fast._native_ids(text) is None
    assert fast.tokenize(text) == slow.tokenize(text)


def test_special_token_text_falls_back(tok_pair):
    fast, slow = tok_pair
    assert fast._native_ids("a [MASK] b") is None
    assert fast.tokenize("a [MASK] b") == slow.tokenize("a [MASK] b")


def test_native_is_faster(tok_pair):
    import time

    fast, slow = tok_pair
    text = " ".join(CORPUS) * 4
    for t in (fast, slow):
        t.tokenize(text)  # warm
    t0 = time.perf_counter()
    for _ in range(200):
        fast.tokenize(text)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        slow.tokenize(text)
    t_slow = time.perf_counter() - t0
    assert t_fast < t_slow, (t_fast, t_slow)
