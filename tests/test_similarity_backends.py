"""Execute the three model-backed SimilarityCalculator backends against
fake/stub models (the packages' checkpoints are not downloadable here, so
without this the cosine/sentence_transformers/bert_score code paths would
ship unexecuted — VERDICT r1 §2.3 #23).

Each fake reproduces only the API surface the reference consumes
(supcon_utils.py:140-182); the similarity MATH is then pinned against a
numpy oracle.
"""

import sys
import types

import numpy as np
import pytest
import torch

from mmvqa_tpu.similarity.calculators import SimilarityCalculator, build_mask

CAPS = ["chest x ray", "brain mri scan", "left hand"]
AUGS = ["the chest x ray", "mri scan of brain", "right foot"]


# ---------------------------------------------------------------------------
# cosine (ClinicalBERT mean-pool) — supcon_utils.py:140-159
# ---------------------------------------------------------------------------

class _FakeTok:
    model_max_length = 512

    def __call__(self, texts, **kw):
        # deterministic 'encoding': one id per word, padded
        ids = [[hash(w) % 97 + 1 for w in t.split()] for t in texts]
        L = max(len(r) for r in ids)
        ids = [r + [0] * (L - len(r)) for r in ids]
        return {"input_ids": torch.tensor(ids)}


class _FakeBert(torch.nn.Module):
    def __init__(self, hidden=8):
        super().__init__()
        self.emb = torch.nn.Embedding(98, hidden)
        torch.manual_seed(0)

    def forward(self, input_ids):
        out = types.SimpleNamespace()
        out.last_hidden_state = self.emb(input_ids)
        return out


def test_cosine_backend_matches_numpy_oracle(monkeypatch):
    import transformers

    tok, mdl = _FakeTok(), _FakeBert()
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: tok),
    )
    monkeypatch.setattr(
        transformers.AutoModel, "from_pretrained",
        classmethod(lambda cls, *a, **k: mdl),
    )
    calc = SimilarityCalculator("cosine", clinicalbert="fake/clinicalbert")
    got = calc(CAPS, AUGS)

    # numpy oracle: mean-pooled embeddings, L2-normalized, cosine; diag 1
    enc = tok(list(CAPS) + list(AUGS))
    with torch.no_grad():
        emb = mdl(enc["input_ids"]).last_hidden_state.numpy()
    f = emb.mean(1)
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    want = f[:3] @ f[3:].T
    np.fill_diagonal(want, 1.0)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)
    assert got.shape == (3, 3) and got.dtype == np.float32


# ---------------------------------------------------------------------------
# sentence_transformers (all-mpnet-base-v2 cos_sim) — supcon_utils.py:162-168
# ---------------------------------------------------------------------------

def test_sentence_transformers_backend(monkeypatch):
    rng = np.random.default_rng(1)
    table = {t: rng.normal(size=6).astype(np.float32) for t in CAPS + AUGS}

    class _FakeST:
        def __init__(self, name):
            assert name == "all-mpnet-base-v2"  # reference model id

        def encode(self, texts):
            return np.stack([table[t] for t in texts])

    fake_pkg = types.ModuleType("sentence_transformers")
    fake_pkg.SentenceTransformer = _FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake_pkg)

    calc = SimilarityCalculator("sentence_transformers")
    got = calc(CAPS, AUGS)

    e = np.stack([table[t] for t in CAPS + AUGS])
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    want = e[:3] @ e[3:].T
    np.fill_diagonal(want, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# bert_score (per-pair F1) — supcon_utils.py:170-182
# ---------------------------------------------------------------------------

def test_bert_score_backend(monkeypatch):
    calls = []

    class _FakeScorer:
        def __init__(self, **kw):
            self.kw = kw

        def score(self, cands, refs):
            calls.append((cands[0], refs[0]))
            f1 = 0.1 * (len(calls) % 7)
            return None, None, torch.tensor([f1])

    fake_pkg = types.ModuleType("bert_score")
    fake_pkg.BERTScorer = _FakeScorer
    monkeypatch.setitem(sys.modules, "bert_score", fake_pkg)

    calc = SimilarityCalculator("bert_score")
    got = calc(CAPS, AUGS)
    # diagonal forced to 1 without scoring; off-diagonals scored pairwise
    # as (caption_i, aug_j) (supcon_utils.py:175-180)
    assert np.all(np.diag(got) == 1.0)
    assert len(calls) == 6
    assert (CAPS[0], AUGS[1]) in calls and (CAPS[2], AUGS[0]) in calls
    assert (CAPS[1], AUGS[1]) not in calls

    # scibert flavor selects the scibert model type (supcon_utils.py:103-106)
    calc2 = SimilarityCalculator("bert_score", bert_score_model="scibert")
    assert calc2._scorer.kw["model_type"] == "allenai/scibert_scivocab_uncased"


def test_unavailable_backend_raises_clear_error():
    with pytest.raises(RuntimeError, match="cosine similarity needs"):
        SimilarityCalculator("cosine", clinicalbert="/nonexistent/path")


def test_build_mask_none_for_simclr():
    assert build_mask("simclr", CAPS, AUGS, None) is None
