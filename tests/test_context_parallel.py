"""Context(sequence)-parallel mesh axis (SURVEY.md §5.7).

The reference has no long-context mechanism beyond the FeedbackTransformer's
recurrence; the TPU build promises a 'context' mesh axis that is a strict
no-op at the reference sequence lengths but lets the token axis shard
without API change. These tests pin:

* the 3-axis mesh shape and the no-op degenerate case;
* place_batch sharding sequence fields over ('data', 'context');
* a full DP2 x TP2 x CP2 train step on the 8-device CPU mesh matching the
  single-logical-device loss bit-for-fp32-tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.parallel.sharding import place_batch, place_state
from mmvqa_tpu.train.state import create_train_state
from mmvqa_tpu.train.steps import make_mlm_steps

B, T, S, VOCAB, HIDDEN = 4, 24, 32, 64, 32


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


def test_mesh_axes_and_degenerate_case():
    spec = make_mesh(dp_size=8, tp_size=1, cp_size=1)
    assert spec.mesh.axis_names == ("data", "model", "context", "pipe")
    assert spec.context_size == 1
    spec2 = make_mesh(dp_size=2, tp_size=2, cp_size=2)
    assert (spec2.data_size, spec2.model_size, spec2.context_size) == (2, 2, 2)
    with pytest.raises(ValueError):
        make_mesh(dp_size=8, tp_size=1, cp_size=3)


def test_place_batch_shards_sequence_axis():
    spec = make_mesh(dp_size=2, tp_size=2, cp_size=2)
    rng = np.random.default_rng(0)
    placed = place_batch(_batch(rng), spec)
    tok_spec = placed["tokens"].sharding.spec
    assert tuple(tok_spec) == ("data", "context")
    img_spec = placed["image"].sharding.spec
    assert tuple(img_spec) == ("data",)
    # cp=1 mesh keeps sequence fields batch-sharded only (strict no-op)
    spec1 = make_mesh(dp_size=4, tp_size=2, cp_size=1)
    placed1 = place_batch(_batch(rng), spec1)
    assert tuple(placed1["tokens"].sharding.spec) == ("data",)


def test_cp_train_step_matches_unsharded():
    cfg = _cfg()
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

    # build the sharded state FIRST: train_step donates its state argument,
    # so state0's buffers (the init tree) are deleted after the first call
    spec = make_mesh(dp_size=2, tp_size=2, cp_size=2)
    init2 = jax.tree.map(jnp.copy, init)
    state1 = place_state(create_train_state(init2, cfg.lr), spec)

    # single logical device (1x1x1 mesh on device 0)
    state0 = create_train_state(init, cfg.lr)
    state0, m0 = train_step(state0, {k: jnp.asarray(v) for k, v in b.items()},
                            key)
    loss0 = float(m0["loss"])
    placed = place_batch(b, spec)
    state1, m1 = train_step(state1, placed, key)
    loss1 = float(m1["loss"])

    np.testing.assert_allclose(loss0, loss1, rtol=2e-5, atol=2e-5)
    # one more step to ensure the updated (sharded) state stays usable
    state1, m2 = train_step(state1, placed, jax.random.PRNGKey(6))
    assert np.isfinite(float(m2["loss"]))
