"""Communication-pattern guard over the compiled sharded train step.

The distributed design is declarative (parallel/sharding.py attaches
shardings; XLA inserts collectives), so a bad sharding rule surfaces ONLY
as extra communication in the compiled HLO — e.g. an optimizer state that
stops mirroring its param's layout forces a per-step full-parameter
all-gather, which is silent in Python and a throughput cliff on real ICI.
These tests pin the measured collective fingerprint of the MLM train step
(tools/sharding_audit.py) per mesh shape.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools"),
)

from sharding_audit import audit_hlo, lower_train_step  # noqa: E402


def _audit(dp, tp, cp):
    txt, param_bytes, diag = lower_train_step(dp, tp, cp)
    return audit_hlo(txt), param_bytes, diag


def test_pure_dp_is_allreduce_only_and_grad_sized():
    """8-way DP must compile to NOTHING but all-reduces (gradient/BN-stat/
    metric reductions), and their total payload must be ~= one gradient
    tree (param bytes): a per-step parameter broadcast or optimizer
    resharding would blow the byte budget; a lost gradient sync would
    collapse it."""
    report, param_bytes, diag = _audit(8, 1, 1)
    assert set(report) == {"all-reduce"}, report
    ar = report["all-reduce"]["bytes"]
    assert 0.9 * param_bytes <= ar <= 1.15 * param_bytes, (
        f"all-reduce payload {ar} vs param bytes {param_bytes}"
    )
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]


def test_tp_adds_bounded_small_gathers_no_all_to_all():
    """Megatron-style TP adds row-parallel/vocab-parallel partial-sum
    all-reduces and a few ACTIVATION-sized all-gathers; parameter-sized
    gathers or all-to-alls mean the TP rules regressed."""
    report, param_bytes, diag = _audit(4, 2, 1)
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]
    assert "all-to-all" not in report, report
    assert report["all-reduce"]["count"] >= 28  # >= the pure-DP reductions
    ag = report.get("all-gather", {"bytes": 0})["bytes"]
    assert ag <= 0.01 * param_bytes, (
        f"all-gather payload {ag} is parameter-scale "
        f"(params {param_bytes}) — a weight is being gathered per step"
    )


def test_fsdp_gathers_bounded_and_cheaper_than_dp():
    """--fsdp shards params + Adam moments over 'data' (1/dp state memory,
    pinned by tests/test_fsdp.py). The compiled step must reshard weights
    or activations per use WITHOUT a communication blowup: on the audit
    model GSPMD's chosen pattern costs LESS total collective payload than
    pure DP's param-sized gradient all-reduce (measured round 4:
    ~6.4 MB vs ~33.5 MB — it keeps big conv weights sharded and reshards
    the smaller activations instead of gathering). Pin the invariants,
    not the exact op counts: gathers exist, no single collective exceeds
    param scale, and the total payload beats the pure-DP fingerprint."""
    txt, param_bytes, diag = lower_train_step(8, 1, 1, fsdp=True)
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]
    report = audit_hlo(txt)
    assert report.get("all-gather", {"count": 0})["count"] > 0, report
    total = sum(rec["bytes"] for rec in report.values())
    for op, rec in report.items():
        assert rec["bytes"] <= 1.1 * param_bytes, (op, rec, param_bytes)
    dp_report, _, _ = _audit(8, 1, 1)
    dp_total = sum(rec["bytes"] for rec in dp_report.values())
    assert total <= dp_total, (
        f"FSDP collective payload {total} exceeds pure DP's {dp_total}"
    )


def test_fsdp_tp_cp_triple_has_no_spmd_fallbacks():
    """FSDP x TP x CP (2x2x2) was the ONE composition that tripped GSPMD
    'Involuntary full rematerialization' fallbacks (round-4 MULTICHIP
    artifact; VERDICT r4 item 3): FSDP put 'data' on the embedding
    table's hidden dim, every lookup output came out hidden-sharded, and
    SPMD full-remat'd it against the (data, context) activation layout —
    silent interconnect burn on every step on real hardware. The round-5
    row-dim-only embedding rule (parallel/sharding.py) gives SPMD a legal
    path; this pins zero fallbacks on the exact trigger composition (all
    other compositions are pinned clean by the tests above)."""
    txt, param_bytes, diag = lower_train_step(2, 2, 2, fsdp=True)
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]
    report = audit_hlo(txt)
    # and no collective grew to parameter scale in the process
    for op, rec in report.items():
        assert rec["bytes"] <= 1.1 * param_bytes, (op, rec, param_bytes)


def test_flagship_fsdp_tp_cp_has_no_spmd_fallbacks():
    """Second fallback site, found round 5 in the dryrun artifact tail: the
    RealFormer flagship config (T=24/S=64/vocab=512 — the vanilla audit
    shapes never trip it) under FSDP x TP x CP put 'data' on token_conv
    kernels' IN-channel dim (the largest free dim), and GSPMD full-remat'd
    the gathered weight against the (data, context) activation layout
    inside conv_general_dilated. parallel/sharding.py now FSDP-shards conv
    kernels on the OUT-channel dim only (column-parallel-shaped, legal
    reshard); this pins zero fallbacks on the exact trigger composition."""
    txt, param_bytes, diag = lower_train_step(2, 2, 2, fsdp=True,
                                              flagship=True)
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]
    report = audit_hlo(txt)
    for op, rec in report.items():
        assert rec["bytes"] <= 1.1 * param_bytes, (op, rec, param_bytes)


def test_cp_reshards_activations_not_parameters():
    """On the full 2x2x2 mesh the token axis reshards around attention
    (permutes / all-to-alls are GSPMD's pattern for the 'context' axis) —
    every non-all-reduce collective must stay activation-sized."""
    report, param_bytes, diag = _audit(2, 2, 2)
    assert diag["spmd_fallbacks"] == [], diag["spmd_fallbacks"]
    for op, rec in report.items():
        if op == "all-reduce":
            continue
        assert rec["bytes"] <= 0.01 * param_bytes, (op, rec, param_bytes)
    # and the gradient reduction is still intact
    ar = report["all-reduce"]["bytes"]
    assert ar >= 0.9 * param_bytes
