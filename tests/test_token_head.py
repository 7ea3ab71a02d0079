"""Fused visual-token head kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.ops.pallas_token_head import (
    fused_token_head,
    token_head_reference,
)


@pytest.mark.parametrize("act", ["serf", "relu"])
@pytest.mark.parametrize("P", [512, 700])  # aligned + padded tail
def test_forward_matches_reference(rng, act, P):
    B, K, C = 2, 24, 64
    x = jnp.asarray(rng.normal(size=(B, P, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32) * 0.1)
    got = fused_token_head(x, w, act)
    want = token_head_reference(x, w, act)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("act", ["serf", "relu"])
def test_gradients_match_reference(rng, act):
    B, P, K, C = 2, 700, 24, 64
    x = jnp.asarray(rng.normal(size=(B, P, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32) * 0.1)
    g_out = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))

    def loss_fused(x, w):
        return jnp.sum(fused_token_head(x, w, act) * g_out)

    def loss_ref(x, w):
        return jnp.sum(token_head_reference(x, w, act) * g_out)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("cnn", ["resnet152", "tf_efficientnetv2_m"])
def test_cross_impl_param_tree_identical(rng, cnn):
    """Every token-head impl must produce the IDENTICAL param tree
    (token_conv_<i>/kernel), so checkpoints transfer across topologies
    even though 'auto' resolves conv-vs-pallas from runtime topology
    (ADVICE r2: the flat-leaf einsum/pallas path made single-TPU
    checkpoints structurally incompatible with CPU/mesh restores)."""
    from mmvqa_tpu.models.visual_tokens import VisualTokenizer

    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = {}
    for impl in ("conv", "einsum"):  # einsum shares the pallas param path
        tok = VisualTokenizer(
            cnn_encoder=cnn, hidden_size=64, tiny=True, token_head_impl=impl
        )
        variables[impl] = tok.init(jax.random.PRNGKey(0), img)
    conv_v, eins_v = variables["conv"], variables["einsum"]
    assert jax.tree_util.tree_structure(conv_v) == (
        jax.tree_util.tree_structure(eins_v)
    )
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(conv_v),
        jax.tree_util.tree_leaves_with_path(eins_v),
    ):
        assert pa == pb and la.shape == lb.shape
    # a conv-impl checkpoint restores verbatim into the einsum/pallas model
    tok_e = VisualTokenizer(
        cnn_encoder=cnn, hidden_size=64, tiny=True, token_head_impl="einsum"
    )
    tokens, _ = tok_e.apply(conv_v, img)
    assert tokens[0].shape == (1, 64)


def test_bf16_inputs(rng):
    B, P, K, C = 2, 512, 24, 64
    x = jnp.asarray(rng.normal(size=(B, P, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, C)) * 0.1, jnp.bfloat16)
    got = fused_token_head(x, w, "serf")
    want = token_head_reference(x, w, "serf")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sharded_kernel_matches_reference(rng):
    """fused_token_head_sharded (dp x tp shard_map wrap) must match the
    reference path in forward AND gradients — incl. the dW psum over
    'data' that shard_map's transpose inserts for the replicated weight."""
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.ops.pallas_token_head import fused_token_head_sharded

    mesh = make_mesh(dp_size=4, tp_size=2, cp_size=1).mesh
    B, P, K, C = 8, 512, 24, 64
    x = jnp.asarray(rng.normal(size=(B, P, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * g)

    sh = loss(lambda x, w: fused_token_head_sharded(x, w, "serf", mesh))
    ref = loss(lambda x, w: token_head_reference(x, w, "serf"))
    np.testing.assert_allclose(
        np.asarray(fused_token_head_sharded(x, w, "serf", mesh)),
        np.asarray(token_head_reference(x, w, "serf")),
        rtol=2e-5, atol=2e-6,
    )
    for a, b in zip(
        jax.grad(sh, argnums=(0, 1))(x, w),
        jax.grad(ref, argnums=(0, 1))(x, w),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_auto_routing_with_mesh(rng):
    """'auto' on a multi-device mesh routes big/small-K maps to the
    sharded pallas form only when the mesh divides batch and hidden."""
    from mmvqa_tpu.core import mesh as mesh_module
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.models.visual_tokens import VisualTokenizer

    tok = VisualTokenizer(hidden_size=64, token_head_impl="auto")
    feat_big = jnp.zeros((8, 64, 64, 24))
    feat_small = jnp.zeros((8, 8, 8, 24))
    old = mesh_module.CURRENT
    try:
        mesh_module.set_current(make_mesh(dp_size=4, tp_size=2, cp_size=1))
        on_tpu = jax.devices()[0].platform == "tpu"
        want_big = "pallas_sharded" if on_tpu else "conv"
        assert tok._resolve_impl(feat_big) == want_big
        assert tok._resolve_impl(feat_small) == "conv"
        # non-divisible batch falls back to conv
        assert tok._resolve_impl(jnp.zeros((6, 64, 64, 24))) == "conv"
        mesh_module.set_current(None)
        assert tok._resolve_impl(feat_big) == "conv"  # no mesh installed
    finally:
        mesh_module.set_current(old)


def test_sharded_kernel_inside_full_train_step(rng):
    """The multi-device route end to end: a full MLM train step with
    token_head='pallas_sharded' (shard_map nested inside the GSPMD-jitted
    step) on a DP4xTP2 mesh must match the conv-impl loss — the
    integration the op-level test can't cover (shard_map + custom VJP
    under jit with placed state)."""
    from mmvqa_tpu.core import mesh as mesh_module
    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.parallel.sharding import place_batch, place_state
    from mmvqa_tpu.train.state import create_train_state
    from mmvqa_tpu.train.steps import make_mlm_steps

    B, T, S, VOCAB, HIDDEN = 8, 24, 32, 64, 32
    base = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        tiny_cnn=True, hidden_size=HIDDEN, n_layers=2, vocab_size=VOCAB,
        max_position_embeddings=T, image_size=S, batch_size=B,
        dropout_override=0.0,
    )
    batch = {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, VOCAB, (B, T)).astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": (rng.integers(1, VOCAB, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }

    def run(cfg, placed):
        model = MMBert(cfg)
        init = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((B, S, S, 3), jnp.float32),
            jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
            jnp.asarray(batch["input_mask"]),
        )
        train_step, _ = make_mlm_steps(model, cfg)
        spec = make_mesh(dp_size=4, tp_size=2, cp_size=1)
        state = place_state(create_train_state(init, cfg.lr), spec)
        state, m = train_step(state, place_batch(batch, spec),
                              jax.random.PRNGKey(5))
        return float(m["loss"])

    spec = make_mesh(dp_size=4, tp_size=2, cp_size=1)
    old = mesh_module.CURRENT
    try:
        mesh_module.set_current(spec)
        loss_sharded = run(base.replace(token_head="pallas_sharded"), spec)
        loss_conv = run(base.replace(token_head="conv"), spec)
    finally:
        mesh_module.set_current(old)
    np.testing.assert_allclose(loss_sharded, loss_conv, rtol=2e-5, atol=2e-5)
