"""FSDP (ZeRO-style) parameter/optimizer sharding over the 'data' axis.

The reference is single-GPU (SURVEY.md §2.9); ``--fsdp`` is a TPU-native
scale-out addition: params and Adam moments shard their largest free dim
over 'data' (parallel/sharding.py FSDP rule), GSPMD all-gathers weights at
use and reduce-scatters gradients. These tests pin the three contracts:

* the LAYOUT rule (largest free dim, TP-composable, threshold-gated,
  graceful on non-divisible shapes) — pure function, no compile;
* the MATH: an FSDP train step's loss equals the unsharded single-device
  loss (this also re-arms the jax-0.9.0 partitioner-miscompile guard of
  tests/test_sharding_guard.py on a new sharding pattern);
* the MEMORY: placed param + moment leaves really are 1/dp per device.

The communication budget is pinned separately in
tests/test_sharding_audit.py (gathers exist, nothing parameter-scale
per collective, total payload at or below the pure-DP fingerprint).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.parallel import sharding
from mmvqa_tpu.parallel.sharding import (
    _with_fsdp,
    infer_param_shardings,
    place_batch,
    place_state,
)
from mmvqa_tpu.train.state import create_train_state
from mmvqa_tpu.train.steps import make_mlm_steps

B, T, S, VOCAB, HIDDEN = 8, 24, 32, 64, 32


def _cfg():
    return pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        tiny_cnn=True,
        hidden_size=HIDDEN,
        n_layers=2,
        vocab_size=VOCAB,
        max_position_embeddings=T,
        image_size=S,
        batch_size=B,
        dropout_override=0.0,  # sharding-invariant comparison
    )


def _batch(rng):
    return {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, VOCAB, (B, T)).astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": (rng.integers(1, VOCAB, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }


def test_fsdp_spec_rule():
    # largest free dim wins
    assert tuple(_with_fsdp(P(), (128, 512), 8)) == (None, "data")
    assert tuple(_with_fsdp(P(), (512, 128), 8)) == ("data",)
    # composes with TP: column-parallel kernel gets the OTHER dim
    assert tuple(_with_fsdp(P(None, "model"), (256, 512), 8)) == (
        "data", "model")
    # no divisible free dim -> unchanged (graceful)
    assert tuple(_with_fsdp(P(), (13, 9), 8)) == ()
    assert tuple(_with_fsdp(P("model"), (16,), 8)) == ("model",)
    # conv kernel: shards the channel dim, never spatial 3s
    assert tuple(_with_fsdp(P(), (3, 3, 64, 128), 8)) == (
        None, None, None, "data")


def test_fsdp_threshold_and_inference():
    spec = make_mesh(dp_size=8, tp_size=1, cp_size=1)
    params = {
        "big": {"kernel": np.zeros((256, 256), np.float32)},   # 65536 elems
        "small": {"kernel": np.zeros((32, 32), np.float32)},
        "bias": {"bias": np.zeros((256,), np.float32)},
    }
    sh = infer_param_shardings(params, spec, fsdp=True)
    assert tuple(sh["big"]["kernel"].spec) == ("data",)
    # below FSDP_MIN_SIZE and 1-D leaves stay replicated
    assert tuple(sh["small"]["kernel"].spec) == ()
    assert tuple(sh["bias"]["bias"].spec) == ()
    # fsdp=False is byte-identical to the old rule
    sh0 = infer_param_shardings(params, spec, fsdp=False)
    assert tuple(sh0["big"]["kernel"].spec) == ()


def test_fsdp_train_step_matches_unsharded(monkeypatch):
    # tiny fixture model: drop the threshold so every 2-D leaf shards
    monkeypatch.setattr(sharding, "FSDP_MIN_SIZE", 0)
    cfg = _cfg()
    from mmvqa_tpu.models import MMBert

    model = MMBert(cfg)
    rng = np.random.default_rng(1)
    b = _batch(rng)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 3), jnp.float32),
        jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
        jnp.asarray(b["input_mask"]),
    )
    train_step, _ = make_mlm_steps(model, cfg)
    key = jax.random.PRNGKey(5)

    spec = make_mesh(dp_size=8, tp_size=1, cp_size=1)
    init2 = jax.tree.map(jnp.copy, init)
    state1 = place_state(create_train_state(init2, cfg.lr), spec, fsdp=True)

    # per-device memory contract: every big 2-D+ param leaf and its Adam
    # moments hold exactly 1/8 of the elements per device. Embedding
    # tables are ROW-dim-only (round-5 rule: a hidden-dim 'data' shard
    # makes every lookup output hidden-sharded and GSPMD full-remats it
    # against the (data, context) activation layout on 3-axis meshes) —
    # they shard iff their row dim divides.
    def expected_shard(leaf, path_names):
        is_emb = path_names[-1] == "embedding"
        if is_emb:
            return (leaf.size // 8 if leaf.shape[0] % 8 == 0
                    else leaf.size)
        if leaf.ndim >= 2 and any(d % 8 == 0 for d in leaf.shape):
            return leaf.size // 8
        return None  # unconstrained here

    n_sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(state1.params)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        want = expected_shard(leaf, names)
        if want is None:
            continue
        shard = np.prod(leaf.sharding.shard_shape(leaf.shape))
        assert shard == want, (names, leaf.shape, leaf.sharding)
        if want < leaf.size:
            n_sharded += 1
    assert n_sharded >= 10  # the rule actually fired across the tree
    adam_states = [
        s for s in jax.tree_util.tree_leaves(
            state1.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")
    ]
    assert adam_states, "no ScaleByAdamState found in opt_state"
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            adam_states[0].mu)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        want = expected_shard(leaf, names)
        if want is None:
            continue
        shard = np.prod(leaf.sharding.shard_shape(leaf.shape))
        assert shard == want, (names, leaf.shape, leaf.sharding)

    # math contract: FSDP loss == unsharded single-device loss
    state0 = create_train_state(init, cfg.lr)
    state0, m0 = train_step(
        state0, {k: jnp.asarray(v) for k, v in b.items()}, key
    )
    loss0 = float(m0["loss"])
    placed = place_batch(b, spec)
    state1, m1 = train_step(state1, placed, key)
    np.testing.assert_allclose(loss0, float(m1["loss"]), rtol=2e-5, atol=2e-5)
    # updated state keeps its sharded layout and stays usable
    state1, m2 = train_step(state1, placed, jax.random.PRNGKey(6))
    assert np.isfinite(float(m2["loss"]))
    big = max(jax.tree.leaves(state1.params), key=lambda x: x.size)
    assert np.prod(big.sharding.shard_shape(big.shape)) == big.size // 8


def test_fsdp_memory_drops_at_production_threshold():
    """The memory claim, made load-bearing (VERDICT r4 item 5): at the
    REAL ``FSDP_MIN_SIZE`` (2^15 — no monkeypatch) and a model whose big
    leaves all clear it (hidden=256, vocab=512: embedding 131k, ff1/ff2
    262k, proj/fc1 65k elements), per-device param+optimizer bytes under
    ``--fsdp`` at dp=2 must be <= 0.6x the pure-DP placement, and the
    COMPILED per-device argument bytes (``compiled.memory_analysis()``,
    the test_scaling_memory.py pattern) must drop accordingly. Temp bytes
    are NOT asserted: GSPMD re-gathers weights at use, so temps may grow —
    the feature trades transient gather buffers for resident state."""
    cfg = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        tiny_cnn=True,
        hidden_size=256,
        n_layers=2,
        vocab_size=512,
        max_position_embeddings=T,
        image_size=S,
        batch_size=B,
        dropout_override=0.0,
        donate=False,  # keep both compilations' buffers alive
    )
    from mmvqa_tpu.models import MMBert

    model = MMBert(cfg)
    rng = np.random.default_rng(4)
    b = _batch(rng)
    b["tokens"] = rng.integers(0, 512, (B, T)).astype(np.int32)
    b["labels"] = (rng.integers(1, 512, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 3), jnp.float32),
        jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
        jnp.asarray(b["input_mask"]),
    )
    # sanity: the dominant leaves really clear the production threshold
    big_elems = sum(x.size for x in jax.tree.leaves(init["params"])
                    if x.size >= sharding.FSDP_MIN_SIZE)
    all_elems = sum(x.size for x in jax.tree.leaves(init["params"]))
    assert big_elems / all_elems > 0.8, (big_elems, all_elems)

    _, _, train_raw, _ = make_mlm_steps(model, cfg, raw=True)
    spec = make_mesh(dp_size=2, tp_size=1, cp_size=1,
                     devices=jax.devices()[:2])

    def per_device_state_bytes(state):
        return sum(
            int(np.prod(x.sharding.shard_shape(x.shape))) * x.dtype.itemsize
            for x in jax.tree.leaves((state.params, state.opt_state))
        )

    def compile_args(fsdp):
        state = place_state(
            create_train_state(jax.tree.map(jnp.copy, init), cfg.lr),
            spec, fsdp=fsdp,
        )
        compiled = (
            jax.jit(train_raw)
            .lower(state, place_batch(b, spec), jax.random.PRNGKey(1))
            .compile()
        )
        return per_device_state_bytes(state), \
            compiled.memory_analysis().argument_size_in_bytes

    state_dp, args_dp = compile_args(fsdp=False)
    state_f, args_f = compile_args(fsdp=True)
    # params + Adam moments: >80% of bytes shard 1/2 -> ratio <= 0.6
    assert state_f <= 0.6 * state_dp, (state_f, state_dp)
    # what XLA actually takes as per-device arguments drops with it
    # (arguments = state + batch + rng; batch/rng are sharding-invariant)
    assert args_f < args_dp, (args_f, args_dp)
    assert (args_f - (args_dp - state_dp)) <= 0.6 * state_dp + 1024, (
        args_f, args_dp, state_dp)


def test_fsdp_composes_with_tp_and_grad_accum(monkeypatch):
    """FSDP x TP on a 4x2 mesh, with --grad_accum 2 (optax.MultiSteps):
    a brand-new sharding pattern on this jax version, so the loss is
    checked against the unsharded run (the jax-0.9.0 partitioner
    miscompile of tests/test_sharding_guard.py surfaced exactly this
    way), and the MultiSteps accumulator tree — params-shaped, so
    place_state mirrors the param layouts onto it — must be 1/4-sharded
    per device like the params and moments."""
    monkeypatch.setattr(sharding, "FSDP_MIN_SIZE", 0)
    cfg = _cfg()
    from mmvqa_tpu.models import MMBert

    model = MMBert(cfg)
    rng = np.random.default_rng(2)
    b = _batch(rng)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 3), jnp.float32),
        jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
        jnp.asarray(b["input_mask"]),
    )
    train_step, _ = make_mlm_steps(model, cfg)
    key = jax.random.PRNGKey(7)

    state0 = create_train_state(
        jax.tree.map(jnp.copy, init), cfg.lr, grad_accum=2
    )
    _, m0 = train_step(
        state0, {k: jnp.asarray(v) for k, v in b.items()}, key
    )

    spec = make_mesh(dp_size=4, tp_size=2, cp_size=1)
    state1 = place_state(
        create_train_state(init, cfg.lr, grad_accum=2), spec, fsdp=True
    )
    acc = [
        s for s in jax.tree_util.tree_leaves(
            state1.opt_state, is_leaf=lambda x: hasattr(x, "acc_grads"))
        if hasattr(s, "acc_grads")
    ]
    assert acc, "no MultiSteps state found in opt_state"
    checked = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            acc[0].acc_grads)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-1] == "embedding":
            # row-dim-only FSDP rule: with TP on the vocab dim the table
            # stays 1/tp (a per-step remat would cost more than the 2x
            # state memory it saves — see parallel/sharding.py)
            continue
        if leaf.ndim >= 2 and any(d % 4 == 0 for d in leaf.shape):
            shard = np.prod(leaf.sharding.shard_shape(leaf.shape))
            assert shard <= leaf.size // 4, (leaf.shape, leaf.sharding)
            checked += 1
    assert checked >= 10
    _, m1 = train_step(state1, place_batch(b, spec), key)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=2e-5, atol=2e-5
    )
