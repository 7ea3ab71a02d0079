"""Benchmark: flagship training-step throughput on real TPU hardware.

Measures the FULL ROCO-MLM pretraining step — device-side augmentation,
EfficientNetV2-M + RealFormer forward, masked-NLL loss, backward, Adam
update — in bf16 at batch 128, steady state, and prints one JSON line.

Methodology: N steps are chained inside ONE jit program via lax.scan and
timed around a single host sync. (Per-call host timing through the remote
device tunnel is unreliable: dispatch round-trips cost ~27 ms and
block_until_ready under-reports; the in-jit scan measures pure device time.)

Baseline: the reference publishes no throughput numbers (SURVEY.md §6);
BASELINE.json frames the target as ">=5x A100-baseline images/sec/chip on
v5e". We take 400 img/s as the assumed A100 reference-training throughput
for this model/batch regime (PyTorch AMP, effnetv2_m @224 + 4-layer
transformer), so vs_baseline = images_per_sec / 400 and the north-star
target is vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_IMG_PER_SEC = 400.0
BATCH = 128
# Dispatch+sync through the remote-device tunnel costs ~83 ms per jit CALL
# (measured: 149.1/143.6/142.3 ms-per-step at K=10/30/60 — perfect o/K fit,
# asymptote ~140.8); K=60 leaves <1.5 ms/step of it. Drivers super-step the
# same way (--steps_per_call).
STEPS = 60


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data.images import PRETRAIN_AUG, process_batch
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.ops.losses import masked_mlm_nll
    from mmvqa_tpu.train import create_train_state

    cfg = pretrain_config(
        cnn_encoder="tf_efficientnetv2_m",
        transformer_model="realformer",
        batch_size=BATCH,
        mixed_precision=True,
    )
    model = MMBert(cfg, dtype=jnp.bfloat16)

    B, T, S = BATCH, cfg.max_position_embeddings, cfg.image_size
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    seg = jnp.concatenate(
        [jnp.zeros((B, 7), jnp.int32), jnp.ones((B, T - 7), jnp.int32)], 1
    )
    mask = jnp.ones((B, T), jnp.float32)
    labels = jnp.asarray(
        (rng.integers(0, cfg.vocab_size, (B, T))
         * (rng.random((B, T)) < 0.15)).astype(np.int32)
    )

    img0 = jax.jit(
        lambda x: process_batch(x, jax.random.PRNGKey(0), PRETRAIN_AUG, False)
    )(raw)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, ids, seg, mask)
    state = create_train_state(variables, 2e-5)

    def one_step(state, key):
        k1, k2 = jax.random.split(key)
        img = process_batch(raw, k1, PRETRAIN_AUG, True)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, ids, seg, mask,
                deterministic=False, train_cnn=True,
                rngs={"dropout": k2}, mutable=["batch_stats"],
            )
            return masked_mlm_nll(out, labels), mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        return state, loss

    @jax.jit
    def run(state, key):
        keys = jax.random.split(key, STEPS)
        return jax.lax.scan(one_step, state, keys)

    state, losses = run(state, jax.random.PRNGKey(1))  # compile + warmup
    np.asarray(losses)
    t0 = time.time()
    state, losses = run(state, jax.random.PRNGKey(2))
    np.asarray(losses)  # host sync
    dt = (time.time() - t0) / STEPS

    n_chips = jax.device_count()
    img_per_sec = BATCH / dt / n_chips
    print(json.dumps({
        "metric": "pretrain_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
