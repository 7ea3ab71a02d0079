"""--grad_accum (optax.MultiSteps nested inside inject_hyperparams):
N micro-batches average into ONE optimizer update. No reference
equivalent — a TPU-production addition for when the target batch exceeds
HBM. BN batch stats still update per micro-batch (torch-accum
semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.train import create_train_state, make_mlm_steps

B, T, S, V = 8, 16, 32, 64


def test_multisteps_equals_adam_on_mean_grad():
    v = {"params": {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}}
    s = create_train_state(v, 1e-2, grad_accum=2)
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0]), "b": jnp.asarray([0.5, -0.5])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0]), "b": jnp.asarray([-0.5, 0.5])}
    s1 = s.apply_gradients(g1)
    # first micro-step only accumulates
    assert jnp.allclose(s1.params["w"], s.params["w"])
    s2 = s1.apply_gradients(g2)

    ref = create_train_state(v, 1e-2).apply_gradients(
        jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    )
    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(ref.params["w"]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s2.params["b"]), np.asarray(ref.params["b"]), atol=1e-7
    )
    # plateau-LR mutation still sees top-level hyperparams mid-accumulation
    assert abs(s2.with_lr(5e-3).lr - 5e-3) < 1e-9


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(0)
    cfg = pretrain_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=V,
        max_position_embeddings=T, image_size=S, tiny_cnn=True,
        batch_size=B, mlm_prob=0.5, hidden_dropout_prob=0.0, grad_accum=2,
    )
    model = MMBert(cfg)
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
    return cfg, model, batch, variables


def test_full_train_step_updates_every_k_micro_steps(tiny):
    cfg, model, batch, variables = tiny
    state = create_train_state(
        jax.tree.map(jnp.array, variables), 1e-3, grad_accum=2
    )
    train_step, _ = make_mlm_steps(model, cfg)
    placed = {k: jnp.asarray(v) for k, v in batch.items()}

    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    state, m1 = train_step(state, placed, jax.random.PRNGKey(1))
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    bs1 = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    np.testing.assert_array_equal(p0, p1)  # micro-step 1: accumulate only
    assert np.isfinite(float(m1["loss"]))

    state, _ = train_step(state, placed, jax.random.PRNGKey(2))
    p2 = np.asarray(jax.tree.leaves(state.params)[0])
    bs2 = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    assert not np.array_equal(p1, p2)  # micro-step 2: the real update
    # BN running stats moved BOTH micro-steps (torch-accum semantics)
    assert not np.array_equal(bs1, bs2)


def test_grad_accum_state_places_on_mesh(tiny):
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.parallel.sharding import place_batch, place_state

    cfg, model, batch, variables = tiny
    spec = make_mesh(4, 2, 1)
    state = place_state(
        create_train_state(jax.tree.map(jnp.array, variables), 1e-3,
                           grad_accum=2),
        spec,
    )
    train_step, _ = make_mlm_steps(model, cfg)
    placed = place_batch(batch, spec)
    state, m = train_step(state, placed, jax.random.PRNGKey(1))
    state, m = train_step(state, placed, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2


def test_grad_accum_recorder_roundtrip(tiny, tmp_path):
    """Mid-accumulation resume: the recorder must round-trip the
    MultiStepsState (mini_step counter + accumulator tree), so a run
    killed between micro-steps continues exactly."""
    from mmvqa_tpu.train import ReduceLROnPlateau, checkpoint

    cfg, model, batch, variables = tiny
    state = create_train_state(
        jax.tree.map(jnp.array, variables), 1e-3, grad_accum=2
    )
    train_step, _ = make_mlm_steps(model, cfg)
    placed = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = train_step(state, placed, jax.random.PRNGKey(1))  # mid-accum

    save = str(tmp_path / "ckpt")
    checkpoint.save_recorder(
        save, 3, state, ReduceLROnPlateau(lr=1e-3).state_dict()
    )
    fresh = create_train_state(
        jax.tree.map(jnp.array, variables), 1e-3, grad_accum=2
    )
    restored, sched, epoch = checkpoint.restore_recorder(save, fresh)
    assert epoch == 3

    # both continue with micro-step 2 and must land on identical params
    s_a, _ = train_step(state, placed, jax.random.PRNGKey(2))
    s_b, _ = train_step(restored, placed, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_a.params)[0]),
        np.asarray(jax.tree.leaves(s_b.params)[0]),
        rtol=1e-6, atol=1e-7,
    )
    # and the update actually happened (params differ from pre-step)
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(s_b.params)[0]),
        np.asarray(jax.tree.leaves(restored.params)[0]),
    )
