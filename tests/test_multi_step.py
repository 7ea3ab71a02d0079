"""Super-stepping equivalence: make_multi_step / make_multi_eval_step must
produce the same states and metrics as running the same steps sequentially
with the same keys (tiny model, CPU).

Tolerance note: equality is pinned to fp32 REDUCTION-ORDER noise (rtol
2e-5), not bit-exactness — the MLM loss is a fused streaming logsumexp
(ops/losses.py::streaming_lse) whose vocab-axis accumulation order may tile
differently between the scanned and standalone compilations. The failure
modes this test exists to catch (mis-threaded rng keys, off-by-one batch
slicing, carried-state corruption) produce O(1e-1) divergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import pretrain_config
from mmvqa_tpu.models import MMBert
from mmvqa_tpu.train import create_train_state, make_mlm_steps
from mmvqa_tpu.train.steps import make_multi_eval_step, make_multi_step

K, B, T, S = 3, 4, 16, 32


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(0)
    cfg = pretrain_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=64,
        max_position_embeddings=T, image_size=S, tiny_cnn=True,
        batch_size=B, mlm_prob=0.5, hidden_dropout_prob=0.0,
    )
    model = MMBert(cfg)
    batches = {
        "image": rng.integers(0, 255, (K, B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, 64, (K, B, T)).astype(np.int32),
        "segment_ids": np.zeros((K, B, T), np.int32),
        "input_mask": np.ones((K, B, T), np.float32),
        "labels": (rng.integers(0, 64, (K, B, T))
                   * (rng.random((K, B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((K, B), np.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 3)),
        jnp.asarray(batches["tokens"][0]),
        jnp.asarray(batches["segment_ids"][0]),
        jnp.asarray(batches["input_mask"][0]),
    )
    return cfg, model, batches, variables


def _fresh(variables):
    # donation in the multi-step deletes buffers; copy per test
    return jax.tree.map(lambda x: jnp.array(x), variables)


def test_multi_train_step_equals_sequential(setup):
    cfg, model, batches, variables = setup
    variables = _fresh(variables)
    _, _, train_raw, _ = make_mlm_steps(model, cfg, raw=True)

    rng = jax.random.PRNGKey(42)
    keys = jax.random.split(rng, K)

    # sequential
    state = create_train_state(_fresh(variables), 1e-3)
    seq_losses = []
    for i in range(K):
        b = {k: jnp.asarray(v[i]) for k, v in batches.items()}
        state, m = jax.jit(train_raw)(state, b, keys[i])
        seq_losses.append(float(m["loss"]))
    seq_leaf = np.asarray(jax.tree.leaves(state.params)[0])

    # stacked scan
    state2 = create_train_state(_fresh(variables), 1e-3)
    multi = make_multi_step(train_raw, K)
    stacked = {k: jnp.asarray(v) for k, v in batches.items()}
    state2, m = multi(state2, stacked, rng)
    multi_losses = [float(x) for x in m["loss"]]

    np.testing.assert_allclose(multi_losses, seq_losses, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params)[0]), seq_leaf,
        rtol=2e-5, atol=1e-6,
    )
    assert int(state2.step) == K


def test_multi_eval_step_equals_sequential(setup):
    cfg, model, batches, variables = setup
    _, eval_jit, _, eval_raw = make_mlm_steps(model, cfg, raw=True)
    state = create_train_state(_fresh(variables), 1e-3)

    seq = []
    for i in range(K):
        b = {k: jnp.asarray(v[i]) for k, v in batches.items()}
        seq.append(float(eval_jit(state, b)["loss"]))

    multi = make_multi_eval_step(eval_raw, K)
    stacked = {k: jnp.asarray(v) for k, v in batches.items()}
    m = multi(state, stacked)
    np.testing.assert_allclose([float(x) for x in m["loss"]], seq, rtol=2e-5, atol=2e-5)


def test_multi_step_serves_remainder_group_sizes(setup):
    """ONE make_multi_step function must serve ANY stacked leading dim (it
    specializes per K at trace time) — the trainer round-3 fix routes
    end-of-epoch remainder groups through it instead of per-batch
    dispatches. Dispatching K=3 then a K=2 'remainder' must equal the
    5-step sequential run."""
    cfg, model, batches, variables = setup
    _, _, train_raw, _ = make_mlm_steps(model, cfg, raw=True)
    rng = np.random.default_rng(7)
    five = {
        k: np.concatenate([v, v[:2]]) if k != "weights"
        else np.concatenate([v, np.zeros((2, B), np.float32) + 1])
        for k, v in batches.items()
    }

    key = jax.random.PRNGKey(5)
    k3, k2 = jax.random.split(key)

    # sequential, same key threading as the epoch loop (split per group)
    state = create_train_state(_fresh(variables), 1e-3)
    keys = list(jax.random.split(k3, 3)) + list(jax.random.split(k2, 2))
    for i in range(5):
        b = {k: jnp.asarray(v[i]) for k, v in five.items()}
        state, m = jax.jit(train_raw)(state, b, keys[i])
    seq_leaf = np.asarray(jax.tree.leaves(state.params)[0])

    # grouped: K=3 then remainder K=2 through the SAME function
    state2 = create_train_state(_fresh(variables), 1e-3)
    multi = make_multi_step(train_raw)
    g1 = {k: jnp.asarray(v[:3]) for k, v in five.items()}
    g2 = {k: jnp.asarray(v[3:5]) for k, v in five.items()}
    state2, _ = multi(state2, g1, k3)
    state2, _ = multi(state2, g2, k2)

    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params)[0]), seq_leaf,
        rtol=2e-5, atol=1e-5,
    )
    assert int(state2.step) == 5


def test_mlm_epoch_remainder_uses_scanned_path(setup):
    """mlm_epoch with steps_per_call=2 over 5 batches (one remainder) must
    match the steps_per_call=1 epoch exactly (same key threading: the epoch
    loop splits rng once per dispatch)."""
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.train.trainer import mlm_epoch

    cfg, model, batches, variables = setup
    _, _, train_raw, _ = make_mlm_steps(model, cfg, raw=True)
    mesh_spec = make_mesh(1, 1, 1, devices=jax.devices()[:1])
    loader = [
        {k: np.asarray(v[i % K]) for k, v in batches.items()}
        for i in range(5)
    ]

    state1 = create_train_state(_fresh(variables), 1e-3)
    multi = make_multi_step(train_raw)
    state1, m1 = mlm_epoch(
        jax.jit(train_raw), state1, loader, mesh_spec,
        jax.random.PRNGKey(3), True,
        multi_step_fn=multi, steps_per_call=2,
    )

    # reference: same grouping/key schedule executed sequentially
    state2 = create_train_state(_fresh(variables), 1e-3)
    rng = jax.random.PRNGKey(3)
    losses = []
    for g in ([0, 1], [2, 3], [4]):
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, len(g))
        for j, i in enumerate(g):
            b = {k: jnp.asarray(np.asarray(v[i % K]))
                 for k, v in batches.items()}
            state2, m = jax.jit(train_raw)(state2, b, keys[j])
            losses.append(float(m["loss"]))

    np.testing.assert_allclose(m1["loss"], np.mean(losses), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state1.params)[0]),
        np.asarray(jax.tree.leaves(state2.params)[0]),
        rtol=2e-5, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# masked SupCon super-stepping (round 4): the per-step (B, B) similarity
# masks ride the scan as a stacked batch field
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def supcon_setup():
    from mmvqa_tpu.core.config import supcon_config
    from mmvqa_tpu.train import make_supcon_steps

    rng = np.random.default_rng(1)
    cfg = supcon_config(
        hidden_size=32, n_layers=1, heads=4, vocab_size=64,
        max_position_embeddings=T, image_size=S, tiny_cnn=True,
        batch_size=2 * B, mlm_prob=0.5, hidden_dropout_prob=0.0,
        use_sim_mask=True,
    )
    model = MMBert(cfg)
    batches = {
        "image": rng.integers(0, 255, (K, B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, 64, (K, B, T)).astype(np.int32),
        "aug_tokens": rng.integers(0, 64, (K, B, T)).astype(np.int32),
        "segment_ids": np.zeros((K, B, T), np.int32),
        "input_mask": np.ones((K, B, T), np.float32),
        "labels": (rng.integers(0, 64, (K, B, T))
                   * (rng.random((K, B, T)) < 0.3)).astype(np.int32),
        "aug_labels": (rng.integers(0, 64, (K, B, T))
                       * (rng.random((K, B, T)) < 0.3)).astype(np.int32),
        "weights": np.ones((K, B), np.float32),
    }
    # host similarity masks: diagonal 1, random off-diagonal positives
    masks = (rng.random((K, B, B)) < 0.3).astype(np.float32)
    masks = np.maximum(masks, np.eye(B, dtype=np.float32))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, S, S, 3)),
        jnp.asarray(batches["tokens"][0]),
        jnp.asarray(batches["segment_ids"][0]),
        jnp.asarray(batches["input_mask"][0]),
    )
    _, _, train_raw, _ = make_supcon_steps(model, cfg, raw=True)
    return cfg, train_raw, batches, masks, variables


def test_masked_supcon_multi_step_equals_sequential(supcon_setup):
    """The masked scan body (driver: pop 'sim_mask' from the stacked batch,
    pass it as the 4th train_step arg) must equal dispatching the masked
    step per batch with the same keys."""
    cfg, train_raw, batches, masks, variables = supcon_setup

    rng = jax.random.PRNGKey(11)
    keys = jax.random.split(rng, K)

    state = create_train_state(_fresh(variables), 1e-3)
    seq_losses, seq_cons = [], []
    for i in range(K):
        b = {k: jnp.asarray(v[i]) for k, v in batches.items()}
        state, m = jax.jit(train_raw)(state, b, keys[i], jnp.asarray(masks[i]))
        seq_losses.append(float(m["loss"]))
        seq_cons.append(float(m["supcon_loss"]))
    seq_leaf = np.asarray(jax.tree.leaves(state.params)[0])
    assert any(c != 0.0 for c in seq_cons)

    def masked_body(s, b, k):
        b = dict(b)
        return train_raw(s, b, k, b.pop("sim_mask"))

    state2 = create_train_state(_fresh(variables), 1e-3)
    multi = make_multi_step(masked_body)
    stacked = {k: jnp.asarray(v) for k, v in batches.items()}
    stacked["sim_mask"] = jnp.asarray(masks)
    state2, m = multi(state2, stacked, rng)

    np.testing.assert_allclose(
        [float(x) for x in m["loss"]], seq_losses, rtol=2e-5, atol=2e-5
    )
    # the contrastive term compounds reduction-order noise through the two
    # preceding parameter updates (exp/logsumexp over the 2B x 2B similarity
    # matrix) — step 1 matches to 1e-7, step 3 drifts to ~1e-4
    np.testing.assert_allclose(
        [float(x) for x in m["supcon_loss"]], seq_cons, rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.params)[0]), seq_leaf,
        rtol=2e-5, atol=1e-5,
    )


def test_supcon_epoch_routes_masked_batches_through_scan(supcon_setup):
    """supcon_epoch with sim_mask_fn + masked_multi_step_fn must use the
    scanned path (ONE dispatch for a full group, remainder included) and
    match the sequential masked run under the epoch's group key schedule."""
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.train.trainer import supcon_epoch

    cfg, train_raw, batches, masks, variables = supcon_setup
    mesh_spec = make_mesh(1, 1, 1, devices=jax.devices()[:1])

    # 5 batches -> groups [2, 2, 1] at steps_per_call=2; captions carry the
    # batch index so sim_mask_fn can look the mask up host-side
    loader = []
    for i in range(5):
        b = {k: np.asarray(v[i % K]) for k, v in batches.items()}
        b["caption"] = [f"b{i % K}"] * B
        b["aug_caption"] = [f"b{i % K}"] * B
        loader.append(b)

    def sim_mask_fn(captions, augs):
        return masks[int(captions[0][1:])]

    calls = {"n": 0}

    def masked_body(s, b, k):
        b = dict(b)
        return train_raw(s, b, k, b.pop("sim_mask"))

    inner = make_multi_step(masked_body)

    def counting_multi(s, b, k):
        calls["n"] += 1
        return inner(s, b, k)

    state1 = create_train_state(_fresh(variables), 1e-3)
    state1, m1 = supcon_epoch(
        None, state1, loader, mesh_spec, jax.random.PRNGKey(9),
        sim_mask_fn=sim_mask_fn,
        masked_multi_step_fn=counting_multi, steps_per_call=2,
    )
    assert calls["n"] == 3  # two full groups + one remainder, all scanned

    # reference: same grouping/key schedule executed sequentially
    state2 = create_train_state(_fresh(variables), 1e-3)
    rng = jax.random.PRNGKey(9)
    losses = []
    for g in ([0, 1], [2, 3], [4]):
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, len(g))
        for j, i in enumerate(g):
            b = {k: jnp.asarray(np.asarray(v[i % K]))
                 for k, v in batches.items()}
            state2, m = jax.jit(train_raw)(
                state2, b, keys[j], jnp.asarray(masks[i % K])
            )
            losses.append(float(m["loss"]))

    np.testing.assert_allclose(m1["loss"], np.mean(losses), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state1.params)[0]),
        np.asarray(jax.tree.leaves(state2.params)[0]),
        rtol=2e-5, atol=1e-5,
    )
