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

import functools
import json
import time

import numpy as np

A100_BASELINE_IMG_PER_SEC = 400.0
BATCH = 128
# Chip ceilings for the roofline fields. FLOPs: v5e spec peak is 394
# TFLOP/s bf16; the best fusion observed IN-STEP sustains 187 TFLOP/s (the
# MLM-head matmul, trace r3) — the earlier "measured 118" (CLAUDE.md) was a
# tunnel-benchmark artifact. Bandwidth: v5e spec HBM is 819 GB/s; the
# repo's sweep measured a 510 GB/s large-op asymptote and the big in-step
# fusion buckets sustain 260-660 GB/s effective (tools/trace_bytes.py) —
# layouts and op sizes keep real graphs below spec.
PEAK_BF16_FLOPS = 394e12
PEAK_HBM_BYTES_PER_SEC = 819e9
# Per-step HBM traffic measured from the full compiled-HLO op signatures of
# this exact program (tools/hlo_bytes.py, round-3 trace; S(1) VMEM-resident
# tensors excluded — the hot CNN maps live in the 128 MB VMEM, so real HBM
# traffic is small and the step is COMPUTE-bound, DESIGN.md §7). Re-derive
# after structural changes:
#   python tools/perf.py --variants token_head=auto --profile /tmp/t
#   python tools/hlo_bytes.py /tmp/opt_hlo.txt /tmp/t --steps 30
MEASURED_HBM_GB_PER_STEP = 18.0
# Dispatch+sync through the remote-device tunnel costs ~83 ms per jit CALL
# (measured: 149.1/143.6/142.3 ms-per-step at K=10/30/60 — perfect o/K fit,
# asymptote ~140.8); K=60 leaves <1.5 ms/step of it. Drivers super-step the
# same way (--steps_per_call).
STEPS = 60


def place_for_devices(state, batch: dict):
    """Data-parallel placement when >1 device is visible: build a pure-DP
    ('data','model','context') mesh over every device, install it, shard
    the batch dim over 'data' and replicate the state (TP stays 1 — the
    flagship bench measures DP weak scaling at 128 img/chip). On one
    device this is a no-op. Returns (state, batch, mesh_spec_or_None)."""
    import jax

    if jax.device_count() == 1:
        # commit the batch to the device ONCE — as plain numpy it would
        # re-upload per run() call (19 MB through the ~25 MB/s tunnel
        # ≈ 13 ms/step amortized; measured 881 vs 935+ img/s)
        batch = {k: jax.device_put(v) for k, v in batch.items()}
        return state, batch, None

    from mmvqa_tpu.core import mesh as mesh_module
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.parallel.sharding import place_batch, place_state

    spec = make_mesh(jax.device_count(), 1, 1)
    mesh_module.set_current(spec)
    state = place_state(state, spec)
    batch = place_batch(batch, spec)
    return state, batch, spec


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

    # global batch = 128 per chip (DP weak scaling on multi-chip rigs)
    B = BATCH * jax.device_count()
    T, S = cfg.max_position_embeddings, cfg.image_size
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    seg = np.concatenate(
        [np.zeros((B, 7), np.int32), np.ones((B, T - 7), np.int32)], 1
    )
    mask = np.ones((B, T), np.float32)
    labels = (
        rng.integers(0, cfg.vocab_size, (B, T))
        * (rng.random((B, T)) < 0.15)
    ).astype(np.int32)

    img0 = jax.jit(
        lambda x: process_batch(x, jax.random.PRNGKey(0), PRETRAIN_AUG, False)
    )(jnp.asarray(raw[:BATCH]))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), img0, jnp.asarray(ids[:BATCH]),
        jnp.asarray(seg[:BATCH]), jnp.asarray(mask[:BATCH]),
    )
    state = create_train_state(variables, 2e-5)
    batch = {"image": raw, "tokens": ids, "segment_ids": seg,
             "input_mask": mask, "labels": labels}
    state, batch, _ = place_for_devices(state, batch)

    # the batch is threaded as a jit ARGUMENT (not a Python closure over
    # concrete arrays): closed-over arrays bake into the compile request as
    # constants — 0.5 GB params did exactly that once and the remote
    # compile died with HTTP 413 — and an argument keeps its committed
    # NamedSharding on multi-chip meshes. INSIDE the jit the scan body
    # closes over the batch tracers, making them loop-INVARIANT scan
    # operands. (r4 A/B: carry-threaded vs closure-invariant batch is a
    # WASH — the 880-vs-940 img/s regression seen during the restructure
    # was the batch left as numpy, re-uploading per call; see
    # place_for_devices.)
    def one_step(state, b, key):
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

    # donate the state: matches the drivers' jit(train_step, donate_argnums
    # =(0,)) and lets XLA alias the param/opt buffers in place of copying
    # every leaf at program entry
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, b, key):
        keys = jax.random.split(key, STEPS)
        return jax.lax.scan(
            lambda s, kk: one_step(s, b, kk), state, keys
        )

    state, losses = run(state, batch, jax.random.PRNGKey(1))  # compile+warmup
    np.asarray(losses)

    # Roofline accounting (VERDICT r2 #2). FLOPs are counted analytically by
    # walking the step jaxpr (utils/flops.py) — XLA's cost_analysis is
    # unusable here: TPU conv/dot custom-calls report ZERO flops through the
    # tunnel (it returned 118 GFLOP for a step whose MLM head alone is 1.35
    # TFLOP). Bytes come from the compiled-HLO measurement recorded above.
    flops_step = bytes_step = None
    try:
        from mmvqa_tpu.utils.flops import train_step_flops

        flops_step = train_step_flops(
            one_step, state, batch, jax.random.PRNGKey(1)
        )
        bytes_step = MEASURED_HBM_GB_PER_STEP * 1e9
    except Exception as e:
        print(f"# flop accounting unavailable: {e!r}", flush=True)
    t0 = time.time()
    state, losses = run(state, batch, jax.random.PRNGKey(2))
    np.asarray(losses)  # host sync
    dt = (time.time() - t0) / STEPS

    n_chips = jax.device_count()
    img_per_sec = B / dt / n_chips  # B = BATCH * n_chips (global batch)
    record = {
        "metric": "pretrain_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
    }
    if flops_step is not None:
        # roofline fields are PER CHIP (flops walked the global-batch jaxpr)
        flops_step = flops_step / n_chips
        t_flops = flops_step / PEAK_BF16_FLOPS
        t_bytes = bytes_step / PEAK_HBM_BYTES_PER_SEC
        record.update({
            "achieved_tflops": round(flops_step / dt / 1e12, 2),
            "achieved_gbps": round(bytes_step / dt / 1e9, 1),
            "pct_flops_peak": round(100 * flops_step / dt / PEAK_BF16_FLOPS, 1),
            "pct_hbm_peak": round(
                100 * bytes_step / dt / PEAK_HBM_BYTES_PER_SEC, 1
            ),
            # step-time lower bound = max(compute, bandwidth) at the
            # measured ceilings; the img/s that bound permits
            "roofline_img_per_sec": round(BATCH / max(t_flops, t_bytes), 1),
        })
    print(json.dumps(record))


if __name__ == "__main__":
    main()
