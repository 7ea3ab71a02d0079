"""Guards around the jax-0.9.0 SPMD partitioner miscompile (round 4).

Found when the dryrun's sharded-vs-unsharded loss check tripped at
vocab_size=512 on the 2x2x2 mesh: ``take(table P('model'), ids
P('data','context'))`` feeding a row-parallel matmul computes WRONG values
(0.2-5.0 absolute logit error, deterministic) once the backward is live.
Forward-only and grads-discarded programs are correct; every 2- and
4-device mesh is correct; the full 3-axis mesh is not.

Two tests:
* a strict-xfail CANARY of the 12-line upstream repro — when a jaxlib
  upgrade fixes the partitioner this xfail goes green and the suite FAILS,
  telling us the ``constrain_batch_seq`` workaround
  (parallel/sharding.py) can be dropped;
* the GUARD: the full MLM train step at the trigger configuration
  (vocab 512, TP-sharded embeddings + row-parallel proj, 2x2x2 mesh,
  mesh installed via set_current like the drivers do) must match the
  unsharded loss exactly — proving the workaround covers the model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmvqa_tpu.core import mesh as mesh_module
from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.core.mesh import make_mesh
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.parallel.sharding import place_batch, place_state
from mmvqa_tpu.train import create_train_state, make_mlm_steps

B, T, S, V, H = 8, 24, 32, 512, 32


@pytest.mark.xfail(
    strict=True,
    reason="upstream jax 0.9.0 SPMD partitioner bug — when this XPASSES, "
    "the partitioner is fixed: drop constrain_batch_seq "
    "(parallel/sharding.py) and this canary together",
)
def test_upstream_partitioner_canary():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(V, H)).astype(np.float32) * 0.1
    Wp = rng.normal(size=(H, H)).astype(np.float32) * 0.1
    ids = rng.integers(0, V, (B, T)).astype(np.int32)

    def loss_fn(emb, Wp, ids):
        h = jnp.take(emb, ids, axis=0)
        h = h @ Wp
        return jnp.mean(jnp.square(h)), h

    def step(emb, Wp, ids):
        (l, h), _ = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(emb, Wp, ids)
        return l, h

    f = jax.jit(step)
    l0, h0 = f(emb, Wp, ids)
    mesh = make_mesh(dp_size=2, tp_size=2, cp_size=2).mesh
    l1, h1 = f(
        jax.device_put(emb, NamedSharding(mesh, P("model"))),
        jax.device_put(Wp, NamedSharding(mesh, P("model", None))),
        jax.device_put(ids, NamedSharding(mesh, P("data", "context"))),
    )
    np.testing.assert_allclose(
        np.asarray(h0), np.asarray(h1), rtol=1e-5, atol=1e-5
    )


def test_trigger_config_train_step_matches_unsharded():
    """The exact configuration that exposed the bug, through the real
    train step WITH the workaround armed (mesh installed like the
    drivers do): sharded loss == unsharded loss."""
    cfg = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m", transformer_model="realformer",
        hidden_size=H, n_layers=2, vocab_size=V,
        max_position_embeddings=T, image_size=S, tiny_cnn=True,
        batch_size=B, dropout_override=0.0,
    )
    model = MMBert(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, V, (B, T)).astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": (rng.integers(1, V, (B, T))
                   * (rng.random((B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3), jnp.float32),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    train_step, _ = make_mlm_steps(model, cfg)
    key = jax.random.PRNGKey(1)

    old = mesh_module.CURRENT
    try:
        mesh_module.set_current(None)
        s0 = create_train_state(jax.tree.map(jnp.copy, variables), 1e-3)
        _, m0 = train_step(
            s0, {k: jnp.asarray(v) for k, v in batch.items()}, key
        )
        loss0 = float(m0["loss"])

        spec = make_mesh(dp_size=2, tp_size=2, cp_size=2)
        mesh_module.set_current(spec)
        s1 = place_state(create_train_state(variables, 1e-3), spec)
        _, m1 = train_step(s1, place_batch(batch, spec), key)
        loss1 = float(m1["loss"])
    finally:
        mesh_module.set_current(old)
    np.testing.assert_allclose(loss0, loss1, rtol=2e-5, atol=2e-5)
