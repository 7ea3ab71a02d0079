"""CI dry-run of the accuracy-parity runbook (tools/parity_run.py).

Runs BASELINE.json configs[4] — the full pipeline: SupCon pretrain →
use_pretrained VQA fine-tune → eval → Grad-CAM — at fixture scale through
the REAL CLI drivers, so the one-command parity runbook can't rot while the
real ROCO/VQA-Med data is unavailable (VERDICT r2 next-round #6).
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools"),
)


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    from mmvqa_tpu.cli import make_fixtures

    out = str(tmp_path_factory.mktemp("parity_fixture"))
    make_fixtures.main(["--out", out, "--image_size", "64",
                        "--n_train", "12", "--n_val", "8", "--n_per_cat", "4"])
    return out


def test_full_pipeline_row_smoke(fixture_tree, tmp_path):
    import parity_run

    save = str(tmp_path / "parity_out")
    parity_run.main([
        "--roco_dir", os.path.join(fixture_tree, "roco"),
        "--vqa_dir", os.path.join(fixture_tree, "vqa"),
        "--save_dir", save,
        "--rows", "supcon-jaccard",
        "--smoke",
    ])
    table = os.path.join(save, "PARITY_RESULTS.md")
    assert os.path.exists(table)
    text = open(table).read()
    assert "supcon-jaccard" in text
    # the row carries real numbers (possibly 0.0 acc at fixture scale,
    # but parsed from the eval sink, not NaN)
    row = [ln for ln in text.splitlines() if "supcon-jaccard" in ln][0]
    assert "nan" not in row.lower()
    # pipeline artifacts: pretrain ckpt, ft ckpt, eval submission, CAM maps
    tagdir = os.path.join(save, "effv2m-realformer-serf-asl-supcon-jaccard")
    assert os.path.isdir(os.path.join(tagdir, "MLM", "pre"))
    assert os.path.isdir(os.path.join(tagdir, "MLM", "ft"))
    assert os.path.exists(os.path.join(tagdir, "ft_res.txt"))
    assert os.path.isdir(os.path.join(tagdir, "cam"))


def test_row_selection_parsing():
    """--rows accepts 'all', 1-based numbers, and tag substrings."""
    import parity_run

    assert len(parity_run.ROWS) == 10  # one per reference README table row
    tags = [r["tag"] for r in parity_run.ROWS]
    assert len(set(tags)) == 10
    # every row's reference numbers match BASELINE.md's table ordering
    assert parity_run.ROWS[0]["ref_acc"] == 58.80
    assert parity_run.ROWS[-1]["ref_acc"] == 62.80
    assert parity_run.ROWS[-1]["counter"] == 80
    assert parity_run.ROWS[-1]["ft_batch"] == 48
    # pretrain flavors cover mlm / simclr / supcon-jaccard / supcon-sbert
    assert {r["pretrain"] for r in parity_run.ROWS} == {
        "mlm", "simclr", "supcon-jaccard", "supcon-sbert"
    }


def test_verify_import_smoke(tmp_path):
    """--verify_import (VERDICT r3 #8): per-stage activation diffs of the
    torch->Flax conversion, smoke-tested with synthetic state_dicts —
    executes unchanged the day real timm/torchvision/HF weights land."""
    import numpy as np
    import torch

    from test_import_torch import (
        TorchBertEmbeddings,
        TorchMiniEffNet,
        TorchMiniResNet,
        _randomize_bn,
    )

    import verify_import

    tm = TorchMiniEffNet()
    _randomize_bn(tm)
    eff = str(tmp_path / "effv2_tiny.pth")
    torch.save(tm.state_dict(), eff)
    tr = TorchMiniResNet((1, 1, 1, 1))
    _randomize_bn(tr)
    res = str(tmp_path / "resnet_tiny.pth")
    torch.save(tr.state_dict(), res)
    tb = TorchBertEmbeddings(vocab=100, hidden=32, max_pos=64)
    bert = str(tmp_path / "bert_tiny.pth")
    torch.save({"embeddings." + k: v for k, v in tb.state_dict().items()},
               bert)

    out = str(tmp_path / "report.json")
    rc = verify_import.main([
        "--cnn_encoder", "auto", "--cnn_checkpoint", eff, "--tiny",
        "--image_size", "64", "--bert_checkpoint", bert, "--out", out,
    ])
    assert rc == 0
    import json
    report = json.load(open(out))
    assert [r["what"] for r in report] == ["cnn:tf_efficientnetv2_m",
                                           "bert_embeddings"]
    assert all(r["ok"] for r in report)
    assert len(report[0]["stages"]) == 7

    rc = verify_import.main([
        "--cnn_encoder", "auto", "--cnn_checkpoint", res, "--tiny",
        "--image_size", "64",
    ])
    assert rc == 0

    # negative control: a CONVERSION bug (perturb one converted leaf —
    # corrupting the checkpoint itself would feed both sides the same
    # values) must make the stage diffs FAIL
    import mmvqa_tpu.models.import_torch as it

    orig_convert = it.convert_effnetv2_m

    def bad_convert(sd, **kw):
        p, s = orig_convert(sd, **kw)
        p["stem_conv"]["kernel"] = p["stem_conv"]["kernel"] + 0.05
        return p, s

    it.convert_effnetv2_m = bad_convert
    try:
        rc = verify_import.main([
            "--cnn_encoder", "auto", "--cnn_checkpoint", eff, "--tiny",
            "--image_size", "64",
        ])
    finally:
        it.convert_effnetv2_m = orig_convert
    assert rc == 1


def test_parity_run_verify_import_wiring(fixture_tree, tmp_path):
    """parity_run --verify_import runs the conversion check BEFORE any
    training and records the JSON report in save_dir."""
    import os

    import torch

    from test_import_torch import TorchMiniEffNet, _randomize_bn

    import parity_run

    tm = TorchMiniEffNet()
    _randomize_bn(tm)
    ckpt = str(tmp_path / "effv2_tiny.pth")
    torch.save(tm.state_dict(), ckpt)

    save = str(tmp_path / "out")
    parity_run.main([
        "--roco_dir", os.path.join(fixture_tree, "roco"),
        "--vqa_dir", os.path.join(fixture_tree, "vqa"),
        "--save_dir", save,
        "--rows", "no-such-row",  # verify wiring only; train nothing
        "--smoke", "--verify_import",
        "--cnn_checkpoint", ckpt,
    ])
    import json
    report = json.load(open(os.path.join(save, "verify_import.json")))
    assert report[0]["ok"]


_COVERED_ELSEWHERE = {
    # row 7: test_full_pipeline_row_smoke (incl. Grad-CAM stage)
    "effv2m-realformer-serf-asl-supcon-jaccard",
    # row 1: test_mlm_ce_row_smoke
    "resnet152-transformer-relu-ce-mlm",
}


def _fake_sbert(monkeypatch):
    """The sentence_transformers package/checkpoint is absent offline
    (SimilarityCalculator raises a clear RuntimeError); substitute the
    deterministic fake of test_similarity_backends so the sbert ROWS'
    config wiring still dry-runs end to end."""
    import hashlib
    import types

    import numpy as np

    class _FakeST:
        def __init__(self, name):
            assert name == "all-mpnet-base-v2"  # reference model id

        def encode(self, texts):
            def vec(t):
                h = hashlib.sha256(t.encode()).digest()
                return (np.frombuffer(h[:24], np.uint8).astype(np.float32)
                        / 255.0 + 0.01)

            return np.stack([vec(t) for t in texts])

    fake_pkg = types.ModuleType("sentence_transformers")
    fake_pkg.SentenceTransformer = _FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake_pkg)


def _remaining_row_tags():
    import parity_run

    return [r["tag"] for r in parity_run.ROWS
            if r["tag"] not in _COVERED_ELSEWHERE]


@pytest.mark.parametrize("tag", _remaining_row_tags())
def test_every_readme_row_smokes(fixture_tree, tmp_path, monkeypatch, tag):
    """EVERY row of the reference README table (README.md:78-87) dry-runs
    pretrain -> use_pretrained fine-tune -> eval -> table-assembly at
    fixture scale (VERDICT r4 item 6): the day real data lands, no row's
    config wiring executes for the first time. Two rows are exercised by
    the dedicated tests above; the remaining eight run here (CAM skipped —
    covered by the jaccard row's test)."""
    import parity_run

    _fake_sbert(monkeypatch)
    save = str(tmp_path / "parity_out")
    parity_run.main([
        "--roco_dir", os.path.join(fixture_tree, "roco"),
        "--vqa_dir", os.path.join(fixture_tree, "vqa"),
        "--save_dir", save,
        "--rows", tag,
        "--smoke", "--no_grad_cam",
    ])
    text = open(os.path.join(save, "PARITY_RESULTS.md")).read()
    row = [ln for ln in text.splitlines() if tag in ln]
    assert row and "nan" not in row[0].lower()
    tagdir = os.path.join(save, tag)
    assert os.path.isdir(os.path.join(tagdir, "MLM", "pre"))
    assert os.path.isdir(os.path.join(tagdir, "MLM", "ft"))
    assert os.path.exists(os.path.join(tagdir, "ft_res.txt"))


def test_mlm_ce_row_smoke(fixture_tree, tmp_path):
    """Row 1 (resnet152 + vanilla transformer + ReLU + CE + plain-MLM
    pretrain) covers every driver/config family the supcon row does NOT:
    roco_train instead of roco_supcon_train, the resnet trunk, the vanilla
    transformer, --use_relu, and the CE criterion at fine-tune/eval."""
    import parity_run

    save = str(tmp_path / "parity_out_mlm")
    parity_run.main([
        "--roco_dir", os.path.join(fixture_tree, "roco"),
        "--vqa_dir", os.path.join(fixture_tree, "vqa"),
        "--save_dir", save,
        "--rows", "resnet152-transformer-relu-ce-mlm",
        "--smoke",
    ])
    text = open(os.path.join(save, "PARITY_RESULTS.md")).read()
    row = [ln for ln in text.splitlines()
           if "resnet152-transformer-relu-ce-mlm" in ln][0]
    assert "nan" not in row.lower()
    tagdir = os.path.join(save, "resnet152-transformer-relu-ce-mlm")
    assert os.path.isdir(os.path.join(tagdir, "MLM", "pre"))
    assert os.path.isdir(os.path.join(tagdir, "MLM", "ft"))
    assert os.path.exists(os.path.join(tagdir, "ft_res.txt"))
