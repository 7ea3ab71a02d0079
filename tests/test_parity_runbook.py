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
