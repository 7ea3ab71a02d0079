"""WordPiece tokenizer parity against transformers.BertTokenizer constructed
from the same vocab file (fully offline), plus text-encoding layout tests
restating roco_utils.py:162-199 / vqamed2019/utils.py:156-170.
"""

import random

import numpy as np
import pytest

from mmvqa_tpu.data.text_encoding import (
    encode_text_mlm,
    encode_text_vqa,
    flatten_keywords,
    mask_word,
)
from mmvqa_tpu.data.tokenizer import (
    WordPieceTokenizer,
    build_vocab_from_corpus,
    write_vocab,
)

CORPUS = [
    "Chest X-ray showing bilateral pneumonia with pleural effusion.",
    "CT scan of the abdomen demonstrates a hepatic lesion.",
    "MRI axial view, T2-weighted, brain tumour in the left lobe!",
    "Ultrasound image of the gallbladder; cholecystitis suspected?",
    "What plane is this image taken in",
    "is there something wrong with the lungs",
    "café au lait spots observed 中文 text",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    vocab = build_vocab_from_corpus(CORPUS * 2, max_size=2000)
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    write_vocab(vocab, str(path))
    return str(path)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file, do_lower_case=True)


class TestHFParity:
    def test_tokenize_matches_hf(self, tok, hf_tok):
        for text in CORPUS + ["weird   spacing\tand\nnewlines", "..."]:
            assert tok.tokenize(text) == hf_tok.tokenize(text), text

    def test_encode_matches_hf(self, tok, hf_tok):
        for text in CORPUS:
            assert tok.encode(text) == hf_tok.encode(text), text

    def test_special_ids_match_hf(self, tok, hf_tok):
        assert tok.cls_token_id == hf_tok.cls_token_id
        assert tok.sep_token_id == hf_tok.sep_token_id
        assert tok.mask_token_id == hf_tok.mask_token_id
        assert tok.pad_token_id == hf_tok.pad_token_id

    def test_unknown_word_is_unk_pieces(self, tok, hf_tok):
        text = "zzgibberishqq ß"
        assert tok.tokenize(text) == hf_tok.tokenize(text)


class TestMLMEncoding:
    MAXLEN, NUM_VIS = 40, 5

    def test_layout(self, tok):
        rng = random.Random(0)
        enc = encode_text_mlm(
            CORPUS[0], tok, set(), self.NUM_VIS, self.MAXLEN, 0.15, rng
        )
        t = enc.tokens
        assert t.shape == (self.MAXLEN,)
        assert t[0] == tok.cls_token_id
        assert (t[1 : 1 + self.NUM_VIS] == 0).all()
        assert t[1 + self.NUM_VIS] == tok.sep_token_id
        n_text = int(enc.input_mask.sum()) - (self.NUM_VIS + 3)
        assert t[self.NUM_VIS + 2 + n_text] == tok.sep_token_id
        # segments: 0 over [CLS]+vis+[SEP], 1 over text+[SEP], 0 over pad
        assert (enc.segment_ids[: self.NUM_VIS + 2] == 0).all()
        assert (enc.segment_ids[self.NUM_VIS + 2 : self.NUM_VIS + 3 + n_text] == 1).all()

    def test_masking_targets_only_keywords(self, tok):
        rng = random.Random(1)
        keywords = {"pneumonia", "effusion"}
        pieces, labels = mask_word(
            "bilateral pneumonia with pleural effusion", tok, keywords, 1.0, rng
        )
        # prob=1 -> every keyword piece masked, labels nonzero exactly there
        plain = tok.tokenize("bilateral pneumonia with pleural effusion")
        key_pieces = tok.tokenize("pneumonia") + tok.tokenize("effusion")
        assert pieces.count("[MASK]") == len(key_pieces)
        assert sum(1 for l in labels if l > 0) == len(key_pieces)
        # non-keyword pieces untouched
        assert len(pieces) == len(plain)

    def test_mask_label_is_isolated_retokenization(self, tok):
        rng = random.Random(2)
        # reference labels with tokenizer.encode(piece)[1] (roco_utils.py:147)
        word = "pneumonia"
        pieces = tok.tokenize(word)
        _, labels = mask_word(word, tok, {word}, 1.0, rng)
        want = [tok.encode(p)[1] for p in pieces]
        assert labels == want

    def test_truncation_budget(self, tok):
        rng = random.Random(0)
        long = " ".join(["pneumonia"] * 100)
        enc = encode_text_mlm(long, tok, set(), 5, 30, 0.0, rng)
        assert enc.tokens.shape == (30,)
        assert int(enc.input_mask.sum()) == 30  # fully used


class TestVQAEncoding:
    def test_layout_hardcodes_five_slots(self, tok):
        enc = encode_text_vqa("what plane is this", tok, 28)
        assert enc.tokens.shape == (28,)
        assert enc.tokens[0] == tok.cls_token_id
        assert (enc.tokens[1:6] == 0).all()
        assert enc.tokens[6] == tok.sep_token_id
        assert (enc.segment_ids[:7] == 0).all()

    def test_budget_is_maxlen_minus_8(self, tok):
        long = " ".join(["lungs"] * 50)
        enc = encode_text_vqa(long, tok, 28)
        # 1 CLS + 5 vis + SEP + 20 text + SEP = 28 used, pad 0: budget 28-8=20
        n_used = int(enc.input_mask.sum())
        assert n_used == 28
        text_ids = enc.tokens[7 : 7 + 20]
        assert (text_ids == tok.encode("lungs")[1]).all()


def test_flatten_keywords_char_extend_quirk():
    kd = {"a": ["pneumonia", "ct"], "b": ["ct"]}
    flat = flatten_keywords(kd)
    assert "pneumonia" in flat and "ct" in flat
    # the reference's extend(word + '.') adds CHARACTERS
    assert "." in flat and "p" in flat and "c" in flat
    assert "pneumonia." not in flat
