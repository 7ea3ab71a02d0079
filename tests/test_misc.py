"""Odds and ends: category-filtered answer vocab, xplane wire parser,
config validation, TP sharding rule inference."""

import numpy as np
import pandas as pd
import pytest

import jax


def _df(rows):
    return pd.DataFrame(rows, columns=["img_id", "question", "answer",
                                       "category", "mode"])


def test_build_answer_vocab_category_filter_removes_yes_no():
    from mmvqa_tpu.data.datasets import build_answer_vocab

    train = _df([
        ["a", "q1", "ct", "modality", "train"],
        ["b", "q2", "yes", "modality", "train"],
        ["c", "q3", "mri", "modality", "train"],
        ["d", "q4", "lung", "organ", "train"],
    ])
    val = _df([["e", "q5", "ct", "modality", "val"]])
    test = _df([["f", "q6", "mri", "modality", "test"]])
    tr, va, te, idx2ans, n = build_answer_vocab(
        train, val, test, category="modality"
    )
    # organ row and yes/no rows filtered (train.py:91-99)
    assert set(idx2ans.values()) == {"ct", "mri"}
    assert len(tr) == 2 and len(va) == 1 and len(te) == 1


def test_build_answer_vocab_first_seen_order():
    from mmvqa_tpu.data.datasets import build_answer_vocab

    train = _df([["a", "q", "zeta", "organ", "train"],
                 ["b", "q", "alpha", "organ", "train"]])
    val = _df([["c", "q", "beta", "organ", "val"]])
    test = _df([["d", "q", "alpha", "organ", "test"]])
    _, _, _, idx2ans, n = build_answer_vocab(train, val, test)
    # insertion order over the concatenated union, NOT sorted (train.py:103)
    assert [idx2ans[i] for i in range(n)] == ["zeta", "alpha", "beta"]


def test_xplane_parser_roundtrip(tmp_path):
    """Hand-encode a tiny XSpace proto and check the wire parser."""
    from mmvqa_tpu.utils.xplane import read_xspace

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wire, payload):
        key = varint((num << 3) | wire)
        if wire == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    # XEvent{metadata_id=1: 7, duration_ps=3: 5000}
    event = field(1, 0, varint(7)) + field(3, 0, varint(5000))
    line = field(6, 2, event) + field(6, 2, event)  # two events
    # XEventMetadata{id=1:7, name=2:"matmul"}
    emeta = field(1, 0, varint(7)) + field(2, 2, b"matmul")
    map_entry = field(1, 0, varint(7)) + field(2, 2, emeta)
    plane = (
        field(2, 2, b"/device:TPU:0")
        + field(4, 2, map_entry)
        + field(3, 2, line)
    )
    space = field(1, 2, plane)
    p = tmp_path / "x.xplane.pb"
    p.write_bytes(space)

    planes = read_xspace(str(p))
    assert len(planes) == 1
    name, durs = planes[0]
    assert name == "/device:TPU:0"
    assert durs["matmul"] == 10000  # two 5000ps events summed


def test_config_validation_errors():
    from mmvqa_tpu.core.config import Config

    with pytest.raises(ValueError):
        Config(transformer_model="mamba").validate()
    Config(transformer_model="realformer", hidden_size=64).validate()


def test_tp_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.parallel.sharding import infer_param_shardings

    mesh = make_mesh(dp_size=4, tp_size=2, devices=jax.devices()[:8])
    params = {
        "feedforward_0": {"fc1": {"kernel": np.zeros((8, 16)),
                                  "bias": np.zeros((16,))},
                          "fc2": {"kernel": np.zeros((16, 8))}},
        "norm1": {"scale": np.zeros((8,))},
        "bert_embedding": {"word_embeddings": {"embedding": np.zeros((30, 8))}},
    }
    sh = infer_param_shardings(params, mesh)
    assert sh["feedforward_0"]["fc1"]["kernel"].spec == P(None, "model")
    assert sh["feedforward_0"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["feedforward_0"]["fc1"]["bias"].spec == P()
    assert sh["norm1"]["scale"].spec == P()
    assert sh["bert_embedding"]["word_embeddings"]["embedding"].spec == P("model")


def test_metric_sink_wandb_forwarding(tmp_path, monkeypatch):
    """Exercise the wandb branch against a fake module (the real package is
    absent here): init kwargs, per-log forwarding, finish (VERDICT r1 #6)."""
    import sys
    import types

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda metrics: calls["log"].append(metrics)
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from mmvqa_tpu.utils.logging import MetricSink

    sink = MetricSink("runx", str(tmp_path), use_wandb=True,
                      config={"lr": 1e-3})
    sink.log({"epoch_train_loss": 1.5, "epoch": 0})
    sink.log({"epoch_train_loss": 1.2, "epoch": 1}, step=7)
    sink.finish()

    assert calls["init"] == [
        {"project": "medvqa", "name": "runx", "config": {"lr": 1e-3}}
    ]
    assert [m["epoch"] for m in calls["log"]] == [0, 1]
    assert calls["finish"] == 1
    # JSONL written alongside, with the same keys (+ts/step)
    import json
    lines = [json.loads(l) for l in
             open(tmp_path / "runx_metrics.jsonl").read().splitlines()]
    assert lines[0]["epoch_train_loss"] == 1.5
    assert lines[1]["step"] == 7

    # wandb disabled: fake must not be touched
    sink2 = MetricSink("runy", str(tmp_path), use_wandb=False)
    sink2.log({"a": 1})
    sink2.finish()
    assert len(calls["init"]) == 1


def test_watch_grad_norm_metrics():
    """cfg.watch=True adds per-top-level-module gnorm/* scalars to the train
    metrics and mlm_epoch aggregates them (wandb.watch equivalent)."""
    import jax.numpy as jnp

    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.train import create_train_state, make_mlm_steps, mlm_epoch

    cfg = pretrain_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=64,
        max_position_embeddings=16, image_size=32, tiny_cnn=True,
        batch_size=2, watch=True,
    )
    model = MMBert(cfg)
    r = np.random.default_rng(0)
    B, T, S = 2, 16, 32
    batch = {
        "image": r.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": r.integers(0, 64, (B, T)).astype(np.int32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": r.integers(0, 64, (B, T)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    state = create_train_state(variables, 1e-3)
    train_step, _ = make_mlm_steps(model, cfg)
    state, m = train_step(state, batch, jax.random.PRNGKey(1))
    gkeys = [k for k in m if k.startswith("gnorm/")]
    assert "gnorm/bert_embedding" in gkeys and len(gkeys) >= 4
    assert all(np.isfinite(float(m[k])) and float(m[k]) >= 0 for k in gkeys)

    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    state, em = mlm_epoch(
        train_step, state, [batch], mesh, jax.random.PRNGKey(2), True
    )
    assert any(k.startswith("gnorm/") for k in em)


def test_watch_histograms_metrics_and_sink(tmp_path, monkeypatch):
    """--watch_histograms (VERDICT r3 #5): per-parameter grad/weight
    histograms — device-side binning correctness, step-metrics payload, and
    MetricSink.log_histograms JSONL + wandb.Histogram forwarding."""
    import sys
    import types

    import jax.numpy as jnp

    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.train import create_train_state, make_mlm_steps
    from mmvqa_tpu.train.steps import HIST_BINS, _param_histograms

    # 1) binning correctness on a known tree
    tree = {"a": {"w": jnp.asarray(np.linspace(-1.0, 1.0, 128))},
            "b": jnp.zeros((7,))}
    h = _param_histograms(tree, "whist")
    assert set(h) == {"whist/a/w", "whist/b"}
    counts, lo, hi = h["whist/a/w"]
    assert int(np.asarray(counts).sum()) == 128
    assert float(lo) == -1.0 and float(hi) == 1.0
    # uniform data -> every bin occupied
    assert (np.asarray(counts) > 0).all()

    # 2) the step factory emits ghist/whist per parameter leaf
    cfg = pretrain_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=64,
        max_position_embeddings=16, image_size=32, tiny_cnn=True,
        batch_size=2,
    )
    model = MMBert(cfg)
    r = np.random.default_rng(0)
    B, T, S = 2, 16, 32
    batch = {
        "image": r.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": r.integers(0, 64, (B, T)).astype(np.int32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": r.integers(0, 64, (B, T)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    n_leaves = len(jax.tree.leaves(variables["params"]))
    state = create_train_state(variables, 1e-3)
    train_step, _ = make_mlm_steps(model, cfg, histograms=True)
    _, m = train_step(state, batch, jax.random.PRNGKey(1))
    ghist = {k: v for k, v in m.items() if k.startswith("ghist/")}
    whist = {k: v for k, v in m.items() if k.startswith("whist/")}
    assert len(ghist) == len(whist) == n_leaves
    c, lo, hi = next(iter(whist.values()))
    assert np.asarray(c).shape == (HIST_BINS,)
    assert float(lo) <= float(hi)

    # 3) sink: JSONL payload + wandb.Histogram forwarding (fake module)
    calls = {"log": [], "hist": []}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: None
    fake.log = lambda metrics: calls["log"].append(metrics)
    fake.finish = lambda: None

    class FakeHist:
        def __init__(self, np_histogram=None):
            calls["hist"].append(np_histogram)

    fake.Histogram = FakeHist
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from mmvqa_tpu.utils.logging import MetricSink

    sink = MetricSink("hrun", str(tmp_path), use_wandb=True)
    sink.log_histograms({**ghist, **whist}, step=3)
    sink.finish()

    import json
    rec = json.loads(open(tmp_path / "hrun_metrics.jsonl").read().splitlines()[-1])
    assert rec["step"] == 3
    assert len(rec["histograms"]) == 2 * n_leaves
    some = next(iter(rec["histograms"].values()))
    assert len(some["counts"]) == HIST_BINS and "lo" in some and "hi" in some
    assert len(calls["hist"]) == 2 * n_leaves
    counts0, edges0 = calls["hist"][0]
    assert len(edges0) == len(counts0) + 1


def test_place_state_tp_shards_optimizer_moments():
    """Adam mu/nu leaves must carry the SAME sharding as their params on a
    4x2 dp-tp mesh (VERDICT r1 item 3): replicated moments forfeit TP memory
    scaling and force per-step resharding against TP-sharded params."""
    from jax.sharding import PartitionSpec as P

    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.parallel.sharding import infer_param_shardings, place_state
    from mmvqa_tpu.train.state import create_train_state

    mesh = make_mesh(dp_size=4, tp_size=2, devices=jax.devices()[:8])
    params = {
        "feedforward_0": {"fc1": {"kernel": np.zeros((8, 16), np.float32),
                                  "bias": np.zeros((16,), np.float32)},
                          "fc2": {"kernel": np.zeros((16, 8), np.float32)}},
        "norm1": {"scale": np.zeros((8,), np.float32)},
        "bert_embedding": {"word_embeddings":
                           {"embedding": np.zeros((30, 8), np.float32)}},
    }
    state = create_train_state({"params": params}, 1e-3)
    placed = place_state(state, mesh)

    p_sh = infer_param_shardings(params, mesh)
    p_struct = jax.tree_util.tree_structure(params)

    def params_like(x):
        return jax.tree_util.tree_structure(x) == p_struct

    subtrees = [
        t
        for t in jax.tree_util.tree_flatten(
            placed.opt_state, is_leaf=params_like
        )[0]
        if params_like(t)
    ]
    assert len(subtrees) >= 2, "expected Adam mu and nu param-shaped subtrees"
    for moments in subtrees:
        jax.tree.map(
            lambda x, s: (_ for _ in ()).throw(
                AssertionError(f"{x.sharding} != {s}")
            ) if x.sharding != s else None,
            moments, p_sh,
        )
    # a TP-sharded moment really is distributed (local shard is half-width)
    mu_fc1 = subtrees[0]["feedforward_0"]["fc1"]["kernel"]
    assert mu_fc1.sharding.spec == P(None, "model")
    assert mu_fc1.addressable_shards[0].data.shape == (8, 8)


def test_checkpoint_check_compatible_reports_mismatches():
    """A stale/mismatched checkpoint must fail FAST with a readable error
    naming the offending leaves (not a flax ScopeParamShapeError deep in
    apply) — train/checkpoint.py::check_compatible."""
    import numpy as np
    import pytest

    from mmvqa_tpu.train.checkpoint import check_compatible

    model_vars = {"params": {"emb": np.zeros((106, 8)), "w": np.zeros((4,))}}
    ok = {"params": {"emb": np.zeros((106, 8)), "w": np.zeros((4,))}}
    check_compatible(model_vars, ok)  # no raise

    bad = {"params": {"emb": np.zeros((98, 8)), "extra": np.zeros(1)}}
    with pytest.raises(ValueError) as ei:
        check_compatible(model_vars, bad, what="/tmp/ckpt")
    msg = str(ei.value)
    assert "incompatible" in msg and "/tmp/ckpt" in msg
    assert "(106, 8)" in msg and "(98, 8)" in msg
    assert "missing from checkpoint" in msg and "extra in checkpoint" in msg
