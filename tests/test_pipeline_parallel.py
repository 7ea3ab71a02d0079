"""Pipeline parallelism (parallel/pipeline.py): GPipe over the 'pipe' axis.

The reference is single-device (SURVEY.md §2.9); pipeline parallelism is a
TPU-native scale-out addition. Contracts pinned here:

* stack/unstack converters round-trip a sequential BertEncoder checkpoint;
* the pipelined forward EQUALS the sequential BertEncoder (same param
  values) on a dp2 x pp4 mesh — microbatching the encoder is exact, not an
  approximation (no cross-batch coupling);
* gradients through the GPipe schedule (scan + ppermute + psum) equal the
  sequential path's gradients, stacked;
* the FULL MLM train step with cfg.pp_size=2 on a dp4 x pp2 mesh matches
  the same model's unsharded sequential-fallback step (the
  sharded-vs-unsharded guard pattern of tests/test_sharding_guard.py);
* stacked params place P('pipe') on the leading layer axis (1/pp shards);
* Config.validate rejects unsupported compositions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core import mesh as mesh_module
from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.models.transformer import BertEncoder
from mmvqa_tpu.parallel.pipeline import (
    PipelinedBertEncoder,
    PipelinedRealFormerEncoder,
    _pick_microbatches,
    stack_bert_encoder_params,
    stack_realformer_params,
    unstack_bert_encoder_params,
    unstack_realformer_params,
)
from mmvqa_tpu.parallel.sharding import (
    infer_param_shardings,
    place_batch,
    place_state,
)
from mmvqa_tpu.train.state import create_train_state
from mmvqa_tpu.train.steps import make_mlm_steps

H, L, HEADS, B, T = 32, 4, 4, 8, 12


def _encoders():
    seq = BertEncoder(hidden_size=H, n_layers=L, n_heads=HEADS,
                      dropout_rate=0.0, share="none", norm_pos="pre")
    pipe = PipelinedBertEncoder(hidden_size=H, n_layers=L, n_heads=HEADS,
                                dropout_rate=0.0, norm_pos="pre")
    return seq, pipe


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, T)) > 0.2).astype(np.float32))
    return h, mask


def _pipe_vars(seq_params):
    stacked, n1, n2 = stack_bert_encoder_params(seq_params, L)
    p = {"pp_layers": stacked, "norm1": n1}
    if n2 is not None:  # 'pre' mode has no norm2 params (reference quirk)
        p["norm2"] = n2
    return {"params": p}


def test_stack_unstack_roundtrip():
    seq, _ = _encoders()
    h, mask = _inputs()
    p = seq.init(jax.random.PRNGKey(0), h, mask)["params"]
    stacked, n1, n2 = stack_bert_encoder_params(p, L)
    assert jax.tree.leaves(stacked)[0].shape[0] == L
    back = unstack_bert_encoder_params(stacked, n1, n2)
    a_flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(p)[0]
    }
    b_flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(back)[0]
    }
    assert set(a_flat) == set(b_flat)
    for k in a_flat:
        np.testing.assert_array_equal(a_flat[k], b_flat[k])


def test_pipelined_matches_sequential_fwd_and_grad():
    seq, pipe = _encoders()
    h, mask = _inputs(1)
    p = seq.init(jax.random.PRNGKey(0), h, mask)["params"]
    ref = seq.apply({"params": p}, h, mask, True)

    # sequential fallback (no mesh): identical math by construction
    pv = _pipe_vars(p)
    old = mesh_module.CURRENT
    mesh_module.set_current(None)
    try:
        out0 = pipe.apply(pv, h, mask, True)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

        # GPipe on a dp2 x pp4 mesh (M=pp=4 microbatches of 1)
        spec = make_mesh(dp_size=2, tp_size=1, cp_size=1, pp_size=4)
        mesh_module.set_current(spec)
        out1 = pipe.apply(pv, h, mask, True)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # grads: scalar loss vs a fixed cotangent through both paths
        cot = jnp.asarray(
            np.random.default_rng(2).normal(size=ref.shape).astype(np.float32)
        )

        def loss_seq(params):
            return jnp.sum(seq.apply({"params": params}, h, mask, True) * cot)

        def loss_pipe(v):
            return jnp.sum(pipe.apply(v, h, mask, True) * cot)

        g_seq = jax.grad(loss_seq)(p)
        g_pipe = jax.grad(loss_pipe)(pv)["params"]
        g_seq_stacked, gn1, _ = stack_bert_encoder_params(g_seq, L)
        # f32 reduction-order noise only (psum over 'data'/'pipe' vs one
        # batched matmul): observed max rel diff ~1e-4 on grads of O(30)
        for a, b in zip(
            jax.tree.leaves(g_seq_stacked),
            jax.tree.leaves(g_pipe["pp_layers"]),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-4, atol=1e-4)
        # shared-norm grads accumulate over ALL layers and (in the pipe
        # path) psum over both 'pipe' and 'data'
        np.testing.assert_allclose(
            np.asarray(g_pipe["norm1"]["scale"]),
            np.asarray(gn1["scale"]), rtol=5e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_pipe["norm1"]["bias"]),
            np.asarray(gn1["bias"]), rtol=5e-4, atol=1e-4)
    finally:
        mesh_module.set_current(old)


def test_realformer_stack_unstack_roundtrip():
    from mmvqa_tpu.models.realformer import RealFormerEncoder

    seq = RealFormerEncoder(hidden_size=H, n_layers=L, head_cnt=8,
                            dp1=0.0, dp2=0.0)
    h, mask = _inputs()
    p = seq.init(jax.random.PRNGKey(0), h, mask)["params"]
    stacked = stack_realformer_params(p, L)
    assert jax.tree.leaves(stacked)[0].shape[0] == L
    back = unstack_realformer_params(stacked)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the pipelined module's own init produces the exact same tree layout
    pipe = PipelinedRealFormerEncoder(hidden_size=H, n_layers=L, head_cnt=8,
                                      dp1=0.0, dp2=0.0)
    init = pipe.init(jax.random.PRNGKey(1), h, mask)["params"]["pp_layers"]
    assert (jax.tree_util.tree_structure(init)
            == jax.tree_util.tree_structure(stacked))
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(stacked)):
        assert a.shape == b.shape


def test_pipelined_realformer_matches_sequential_fwd_and_grad():
    """The residual score carry hops stages with the activations: fwd is
    exact (seq fallback bit-identical; GPipe ~1e-6), grads are fp32
    reduction-order noise only — verified by an x64 rerun where the max
    grad diff collapses 600x to 4e-6 (the residual is the intentional
    f32 softmax cast in ops/attention.py)."""
    from mmvqa_tpu.models.realformer import RealFormerEncoder

    seq = RealFormerEncoder(hidden_size=H, n_layers=L, head_cnt=8,
                            dp1=0.0, dp2=0.0)
    pipe = PipelinedRealFormerEncoder(hidden_size=H, n_layers=L, head_cnt=8,
                                      dp1=0.0, dp2=0.0)
    h, mask = _inputs(1)
    p = seq.init(jax.random.PRNGKey(0), h, mask)["params"]
    ref = seq.apply({"params": p}, h, mask, True)
    pv = {"params": {"pp_layers": stack_realformer_params(p, L)}}

    old = mesh_module.CURRENT
    mesh_module.set_current(None)
    try:
        out0 = pipe.apply(pv, h, mask, True)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))

        spec = make_mesh(dp_size=2, tp_size=1, cp_size=1, pp_size=4)
        mesh_module.set_current(spec)
        out1 = pipe.apply(pv, h, mask, True)
        # Masked (padding) query rows carry -10000 in the residual score
        # tensor; f32 ulp at 10000 is ~1e-3, so microbatched-vs-full-batch
        # rounding differences quantize THOSE rows' scores at ~1e-3
        # (the settled round-3 gotcha: softmax shift-invariance does not
        # hold numerically). Real rows stay tight; padding rows get the
        # quantization allowance.
        real = np.asarray(mask) > 0
        np.testing.assert_allclose(np.asarray(out1)[real],
                                   np.asarray(ref)[real],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out1)[~real],
                                   np.asarray(ref)[~real],
                                   rtol=1e-3, atol=5e-4)

        cot = jnp.asarray(
            np.random.default_rng(2).normal(size=ref.shape).astype(np.float32)
        )
        g_seq = jax.grad(
            lambda q: jnp.sum(seq.apply({"params": q}, h, mask, True) * cot)
        )(p)
        g_pipe = jax.grad(
            lambda v: jnp.sum(pipe.apply(v, h, mask, True) * cot)
        )(pv)["params"]["pp_layers"]
        g_seq_stacked = stack_realformer_params(g_seq, L)
        # grads are O(30-70) here (the carried -10000 mask terms inflate
        # the intermediates); observed max abs diff 2.6e-3 = ~7e-5 rel
        for a, b in zip(jax.tree.leaves(g_seq_stacked),
                        jax.tree.leaves(g_pipe)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=5e-3)
    finally:
        mesh_module.set_current(old)


def test_pp_realformer_train_step_matches_unsharded():
    cfg = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        tiny_cnn=True,
        hidden_size=H,
        n_layers=2,
        vocab_size=64,
        max_position_embeddings=T,
        image_size=32,
        batch_size=B,
        pp_size=2,
        dropout_override=0.0,  # sharding-invariant comparison
    )
    from mmvqa_tpu.models import MMBert

    model = MMBert(cfg)
    rng = np.random.default_rng(7)
    b = {
        "image": rng.integers(0, 255, (B, 32, 32, 3), dtype=np.uint8),
        "tokens": rng.integers(0, 64, (B, T)).astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": (rng.integers(1, 64, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    old = mesh_module.CURRENT
    mesh_module.set_current(None)
    try:
        init = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((B, 32, 32, 3), jnp.float32),
            jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
            jnp.asarray(b["input_mask"]),
        )
        assert "pp_layers" in init["params"]["encoder"], (
            "cfg.pp_size>1 + realformer must route to "
            "PipelinedRealFormerEncoder")
        train_step, _ = make_mlm_steps(model, cfg)
        key = jax.random.PRNGKey(5)

        state0 = create_train_state(jax.tree.map(jnp.copy, init), cfg.lr)
        _, m0 = train_step(
            state0, {k: jnp.asarray(v) for k, v in b.items()}, key
        )
        loss0 = float(m0["loss"])

        spec = make_mesh(dp_size=4, tp_size=1, cp_size=1, pp_size=2)
        mesh_module.set_current(spec)
        state1 = place_state(create_train_state(init, cfg.lr), spec)
        enc = state1.params["encoder"]["pp_layers"]
        for leaf in jax.tree.leaves(enc):
            shard = np.prod(leaf.sharding.shard_shape(leaf.shape))
            assert shard == leaf.size // 2, (leaf.shape, leaf.sharding)
        state1, m1 = train_step(state1, place_batch(b, spec), key)
        np.testing.assert_allclose(
            loss0, float(m1["loss"]), rtol=2e-5, atol=2e-5
        )
        state1, m2 = train_step(state1, place_batch(b, spec),
                                jax.random.PRNGKey(6))
        assert np.isfinite(float(m2["loss"]))
    finally:
        mesh_module.set_current(old)


def test_pipelined_dropout_differs_across_data_shards():
    """ADVICE r4 (medium): the rng key enters shard_map replicated, so
    without a data-axis fold every data shard would draw IDENTICAL
    dropout masks for different samples. Feed the SAME rows to every
    sample: with per-shard folding the two data shards' outputs must
    differ; within a shard, identical rows in one microbatch share a
    mask and stay equal (one stage draw covers the microbatch)."""
    pipe = PipelinedBertEncoder(hidden_size=H, n_layers=2, n_heads=HEADS,
                                dropout_rate=0.5, norm_pos="pre")
    rng = np.random.default_rng(9)
    row = rng.normal(size=(1, T, H)).astype(np.float32)
    h = jnp.asarray(np.repeat(row, B, axis=0))  # every sample identical
    mask = jnp.ones((B, T), jnp.float32)
    old = mesh_module.CURRENT
    mesh_module.set_current(None)
    try:
        pv = pipe.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, h, mask, False
        )
        spec = make_mesh(dp_size=2, tp_size=1, cp_size=1, pp_size=2,
                         devices=jax.devices()[:4])
        mesh_module.set_current(spec)
        out = pipe.apply(pv, h, mask, False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        out = np.asarray(out)
        # shard 0 holds rows 0..B/2-1, shard 1 rows B/2..B-1
        assert not np.allclose(out[0], out[B // 2]), (
            "data shards drew identical dropout masks")
    finally:
        mesh_module.set_current(old)


def test_pick_microbatches():
    assert _pick_microbatches(0, 8, 2) == 4    # 2*pp divides
    assert _pick_microbatches(0, 6, 2) == 2    # falls back to pp
    assert _pick_microbatches(3, 6, 2) == 3    # explicit wins
    with pytest.raises(ValueError):
        _pick_microbatches(5, 8, 2)            # non-divisor
    with pytest.raises(ValueError):
        _pick_microbatches(0, 3, 2)            # batch < any valid M


def test_pp_train_step_matches_unsharded():
    cfg = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="transformer",
        tiny_cnn=True,
        hidden_size=H,
        n_layers=2,
        heads=HEADS,
        vocab_size=64,
        max_position_embeddings=T,
        image_size=32,
        batch_size=B,
        pp_size=2,
        dropout_override=0.0,  # sharding-invariant comparison
    )
    from mmvqa_tpu.models import MMBert

    model = MMBert(cfg)
    rng = np.random.default_rng(3)
    b = {
        "image": rng.integers(0, 255, (B, 32, 32, 3), dtype=np.uint8),
        "tokens": rng.integers(0, 64, (B, T)).astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": (rng.integers(1, 64, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    old = mesh_module.CURRENT
    mesh_module.set_current(None)
    try:
        init = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((B, 32, 32, 3), jnp.float32),
            jnp.asarray(b["tokens"]), jnp.asarray(b["segment_ids"]),
            jnp.asarray(b["input_mask"]),
        )
        assert "pp_layers" in init["params"]["encoder"], (
            "cfg.pp_size>1 must route to PipelinedBertEncoder")
        train_step, _ = make_mlm_steps(model, cfg)
        key = jax.random.PRNGKey(5)

        # unsharded baseline: sequential fallback (no mesh installed)
        state0 = create_train_state(jax.tree.map(jnp.copy, init), cfg.lr)
        _, m0 = train_step(
            state0, {k: jnp.asarray(v) for k, v in b.items()}, key
        )
        loss0 = float(m0["loss"])

        spec = make_mesh(dp_size=4, tp_size=1, cp_size=1, pp_size=2)
        mesh_module.set_current(spec)
        state1 = place_state(create_train_state(init, cfg.lr), spec)
        # layout contract: stacked layer leaves hold 1/pp layers per device
        enc = state1.params["encoder"]["pp_layers"]
        for leaf in jax.tree.leaves(enc):
            shard = np.prod(leaf.sharding.shard_shape(leaf.shape))
            assert shard == leaf.size // 2, (leaf.shape, leaf.sharding)
        state1, m1 = train_step(state1, place_batch(b, spec), key)
        np.testing.assert_allclose(
            loss0, float(m1["loss"]), rtol=2e-5, atol=2e-5
        )
        # second step keeps the layout and stays finite
        state1, m2 = train_step(state1, place_batch(b, spec),
                                jax.random.PRNGKey(6))
        assert np.isfinite(float(m2["loss"]))
        leaf = jax.tree.leaves(state1.params["encoder"]["pp_layers"])[0]
        assert np.prod(leaf.sharding.shard_shape(leaf.shape)) \
            == leaf.size // 2
    finally:
        mesh_module.set_current(old)


@pytest.mark.parametrize("tm", ["transformer", "realformer"])
def test_checkpoint_adapts_pp_layout_roundtrip(tmp_path, tm):
    """A checkpoint saved at pp_size=1 restores into a pp_size=2 model
    (and back) through the REAL save/load path: adapt_encoder_layout
    auto-converts the encoder subtree via the stack/unstack converters,
    check_compatible passes, and the restored model computes identical
    logits (ADVICE r4)."""
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.train import checkpoint

    common = dict(
        cnn_encoder="tf_efficientnetv2_m", tiny_cnn=True, hidden_size=H,
        n_layers=2, heads=HEADS, vocab_size=64, max_position_embeddings=T,
        image_size=32, batch_size=B, transformer_model=tm,
        dropout_override=0.0,
    )
    cfg_seq = pretrain_config(**common)
    cfg_pp = pretrain_config(pp_size=2, **common)
    old = mesh_module.CURRENT
    mesh_module.set_current(None)  # sequential fallback: identical math
    try:
        m_seq, m_pp = MMBert(cfg_seq), MMBert(cfg_pp)
        rng = np.random.default_rng(11)
        img = jnp.asarray(
            rng.normal(size=(B, 32, 32, 3)).astype(np.float32))
        tok = jnp.asarray(rng.integers(0, 64, (B, T)).astype(np.int32))
        seg = jnp.zeros((B, T), jnp.int32)
        mask = jnp.ones((B, T), jnp.float32)
        v_seq = m_seq.init(jax.random.PRNGKey(0), img, tok, seg, mask)
        state = create_train_state(v_seq, 1e-3)
        checkpoint.save_weights(str(tmp_path / "w_seq"), state)

        # sequential ckpt -> pp=2 model
        v_pp = m_pp.init(jax.random.PRNGKey(1), img, tok, seg, mask)
        loaded = checkpoint.load_weights(str(tmp_path / "w_seq"))
        loaded = checkpoint.adapt_encoder_layout(v_pp, loaded)
        checkpoint.check_compatible(
            {"params": v_pp["params"], "batch_stats": v_pp["batch_stats"]},
            loaded)
        out_seq = m_seq.apply(v_seq, img, tok, seg, mask)
        out_pp = m_pp.apply(
            {"params": loaded["params"],
             "batch_stats": loaded["batch_stats"]},
            img, tok, seg, mask)
        np.testing.assert_array_equal(np.asarray(out_pp), np.asarray(out_seq))

        # pp=2 ckpt -> sequential model (export direction)
        state_pp = create_train_state(
            {"params": loaded["params"],
             "batch_stats": loaded["batch_stats"]}, 1e-3)
        checkpoint.save_weights(str(tmp_path / "w_pp"), state_pp)
        loaded2 = checkpoint.load_weights(str(tmp_path / "w_pp"))
        loaded2 = checkpoint.adapt_encoder_layout(v_seq, loaded2)
        checkpoint.check_compatible(
            {"params": v_seq["params"],
             "batch_stats": v_seq["batch_stats"]}, loaded2)
        out_back = m_seq.apply(
            {"params": loaded2["params"],
             "batch_stats": loaded2["batch_stats"]},
            img, tok, seg, mask)
        np.testing.assert_array_equal(
            np.asarray(out_back), np.asarray(out_seq))
    finally:
        mesh_module.set_current(old)


def test_pp_config_validation():
    with pytest.raises(ValueError, match="feedback"):
        pretrain_config(
            transformer_model="feedback-transformer", pp_size=2
        ).validate()
    # realformer pipelines since round 5 (score carry hops stages)
    pretrain_config(transformer_model="realformer", pp_size=2,
                    n_layers=4).validate()
    # factories validate at construction (ADVICE r4): programmatic users
    # get the readable error, not a downstream shard_map failure
    with pytest.raises(ValueError, match="feedback"):
        pretrain_config(transformer_model="feedback-transformer", pp_size=2)
    with pytest.raises(ValueError, match="composes"):
        pretrain_config(transformer_model="transformer", pp_size=2,
                        tp_size=2).validate()
    with pytest.raises(ValueError, match="divisible"):
        pretrain_config(transformer_model="transformer", pp_size=3,
                        n_layers=4).validate()
    pretrain_config(transformer_model="transformer", pp_size=2,
                    n_layers=4).validate()


def test_pp_sharding_rule_guards_divisibility():
    spec = make_mesh(dp_size=4, tp_size=1, cp_size=1, pp_size=2)
    params = {
        "encoder": {
            "pp_layers": {"w": np.zeros((4, 8, 8), np.float32)},
            "norm1": {"scale": np.zeros((8,), np.float32)},
        }
    }
    sh = infer_param_shardings(params, spec)
    assert tuple(sh["encoder"]["pp_layers"]["w"].spec) == ("pipe",)
    assert tuple(sh["encoder"]["norm1"]["scale"].spec) == ()
    # non-divisible leading dim stays replicated (graceful)
    params["encoder"]["pp_layers"]["w"] = np.zeros((3, 8, 8), np.float32)
    sh = infer_param_shardings(params, spec)
    assert tuple(sh["encoder"]["pp_layers"]["w"].spec) == ()
