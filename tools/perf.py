"""Same-process A/B + profiling harness for the flagship train step.

Cross-process step-time variance through the axon tunnel is ~±10 ms while
back-to-back in-process variance is ~±0.5 ms (CLAUDE.md), so every perf
decision must come from THIS harness: all variants build, compile and time
inside one process, the first variant is re-timed at the end as a drift
check, and timing uses a K-step lax.scan around a single host sync.

Usage:
  python tools/perf.py --variants token_head=conv token_head=auto
  python tools/perf.py --variants token_head=conv --profile /tmp/trace --top 60

Variant syntax: comma-separated Config overrides, e.g.
  "token_head=auto,steps_per_call=8"  (values parsed as python literals when
  possible, else kept as strings).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
STEPS = 10


def parse_variant(spec: str) -> dict:
    out = {}
    if not spec:
        return out
    for item in spec.split(","):
        k, v = item.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def build_run(overrides: dict, batch: int, steps: int):
    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.data.images import PRETRAIN_AUG, process_batch
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.ops.losses import masked_mlm_nll
    from mmvqa_tpu.train import create_train_state

    overrides = dict(overrides)
    donate = bool(overrides.pop("donate", True))  # probe: copy-bucket source
    opt = overrides.pop("opt", "adam")  # probe knob: 'adam' | 'sgd'
    unroll = overrides.pop("unroll", False)  # probe: python-unrolled steps
    batch = int(overrides.pop("batch", batch))  # per-variant batch size
    task = overrides.pop("task", "mlm")  # 'mlm'|'vqa'|'supcon'
    mode = overrides.pop("mode", "train")  # 'train' | 'eval' (fwd-only)
    pallas_min_p = overrides.pop("pallas_min_p", None)
    if pallas_min_p is not None:
        from mmvqa_tpu.models import visual_tokens

        visual_tokens.PALLAS_MIN_POSITIONS = int(pallas_min_p)
    bn_f32 = overrides.pop("bn_f32_stats", None)
    if bn_f32 is not None:
        from mmvqa_tpu.models import effnetv2

        effnetv2.BN_F32_STATS = bool(bn_f32)
    pw_as_dot = overrides.pop("pw_as_dot", None)
    if pw_as_dot is not None:
        from mmvqa_tpu.models import effnetv2

        effnetv2.PW_AS_DOT = bool(pw_as_dot)
    dw_pallas = overrides.pop("dw_pallas", None)
    if dw_pallas is not None:
        from mmvqa_tpu.models import effnetv2

        effnetv2.DW_PALLAS = dw_pallas
    gact_mm = overrides.pop("gact_mm", None)
    if gact_mm is not None:
        from mmvqa_tpu.ops import pallas_token_head

        pallas_token_head.GACT_MM = gact_mm
    fb_unroll = overrides.pop("feedback_unroll", None)
    if fb_unroll is not None:
        from mmvqa_tpu.models import feedback

        feedback.SCAN_UNROLL = int(fb_unroll)

    if task == "supcon":
        # MLM+SupCon joint step (roco_supcon_train.py regime): the loader
        # feeds batch//2 rows, TwoCrop restores the full batch; img/s here
        # counts the CONCATENATED model batch for comparability
        cfg = pretrain_config(
            **{"cnn_encoder": "tf_efficientnetv2_m",
               "transformer_model": "realformer",
               "supcon": True, "con_task": "supcon",
               "batch_size": batch, "mixed_precision": True,
               **overrides},
        )
    elif task == "vqa":
        # fine-tune regime (vqamed2019/train.py defaults: T=28, ~332-answer
        # head, CE) at the same flagship width/batch
        from mmvqa_tpu.core.config import vqa_config

        cfg = vqa_config(
            **{"cnn_encoder": "tf_efficientnetv2_m",
               "transformer_model": "realformer",
               "hidden_size": 768, "num_classes": 332,
               "batch_size": batch, "mixed_precision": True,
               **overrides},
        )
    else:
        cfg = pretrain_config(
            **{"cnn_encoder": "tf_efficientnetv2_m",
               "transformer_model": "realformer",
               "batch_size": batch, "mixed_precision": True,
               **overrides},
        )
    model = MMBert(cfg, dtype=jnp.bfloat16)

    B, T, S = batch, cfg.max_position_embeddings, cfg.image_size
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
    if opt == "sgd":  # optimizer-cost probe: moment-free update
        import optax

        from mmvqa_tpu.train.state import TrainState

        tx = optax.sgd(2e-5)
        state = TrainState(
            step=state.step, params=state.params,
            batch_stats=state.batch_stats, opt_state=tx.init(state.params),
            tx=tx,
        )

    answers = jnp.asarray(
        rng.integers(0, max(cfg.num_classes, 2), (B,)), jnp.int32
    )

    if task == "supcon":
        from mmvqa_tpu.train.steps import make_supcon_steps

        _, _, train_raw, _ = make_supcon_steps(model, cfg, raw=True)
        B2 = B // 2
        sc_batch = {
            "image": raw[:B2],
            "tokens": ids[:B2],
            "aug_tokens": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (B2, T)), jnp.int32),
            "segment_ids": seg[:B2],
            "input_mask": mask[:B2],
            "labels": labels[:B2],
            "aug_labels": jnp.asarray(
                (rng.integers(0, cfg.vocab_size, (B2, T))
                 * (rng.random((B2, T)) < 0.15)).astype(np.int32)),
            "weights": jnp.ones((B2,), jnp.float32),
        }

        def one_step(state, key):
            state, metrics = train_raw(state, sc_batch, key, None)
            return state, metrics["loss"]

        import functools

        jit = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
               else jax.jit)

        @jit
        def run(state, key):
            keys = jax.random.split(key, steps)
            return jax.lax.scan(one_step, state, keys)

        return run, state, B

    if mode == "eval":
        # forward-only inference/eval regime (vqa_eval + the fine-tune
        # driver's per-epoch test sweep): deterministic augment, no grads.
        # The carried scalar feeds back into the input so the loop body
        # can't be hoisted out of the scan (the dw_probe de-hoisting trap).
        @jax.jit
        def run(st, key):
            # st must come in through the jit ARGUMENT: closing over the
            # train state bakes ~0.5 GB of parameter constants into the
            # program and the remote-compile request 413s.
            def eval_one(s, _):
                img = process_batch(raw, jax.random.PRNGKey(0),
                                    PRETRAIN_AUG, False)
                img = img + (s * 1e-30).astype(img.dtype)
                out = model.apply(
                    {"params": st.params, "batch_stats": st.batch_stats},
                    img, ids, seg, mask,
                    deterministic=True, train_cnn=False,
                )
                if isinstance(out, tuple):  # supcon model: (logits, feat)
                    out = out[0]
                return jnp.sum(out.astype(jnp.float32)), ()

            s, _ = jax.lax.scan(
                eval_one, jnp.zeros((), jnp.float32), None, length=steps)
            return st, s[None]

        return run, state, batch

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
            if task == "vqa":
                logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                loss = -jnp.mean(
                    jnp.take_along_axis(logp, answers[:, None], axis=-1)
                )
            else:
                loss = masked_mlm_nll(out, labels)
            return loss, mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        return state, loss

    import functools

    jit = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
           else jax.jit)
    if unroll:
        @jit
        def run(state, key):
            keys = jax.random.split(key, steps)
            losses = []
            for i in range(steps):
                state, loss = one_step(state, keys[i])
                losses.append(loss)
            return state, jnp.stack(losses)
    else:
        @jit
        def run(state, key):
            keys = jax.random.split(key, steps)
            return jax.lax.scan(one_step, state, keys)

    return run, state, batch


def time_variant(run, state, steps: int, reps: int = 2):
    import jax

    state, losses = run(state, jax.random.PRNGKey(1))  # compile + warmup
    float(losses[-1])
    times = []
    for r in range(reps):
        t0 = time.time()
        state, losses = run(state, jax.random.PRNGKey(2 + r))
        float(losses[-1])  # host pull sync (block_until_ready under-reports)
        times.append((time.time() - t0) / steps * 1e3)
    # return the live state: the input state buffers were DONATED on the
    # first call and must not be reused by the caller
    return min(times), times, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["token_head=conv"])
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--profile", default="", help="trace dir for variant 0")
    ap.add_argument("--top", type=int, default=50)
    args = ap.parse_args()

    import jax

    results = []
    specs = list(args.variants)
    if len(specs) > 1:
        specs.append(specs[0])  # drift check: re-time the first variant last

    # module-global knobs (pallas_min_p / bn_f32_stats / pw_as_dot) must not
    # leak from one variant into the next (round-3 bug: the drift check
    # silently re-ran with the PREVIOUS variant's PALLAS_MIN_POSITIONS)
    from mmvqa_tpu.models import effnetv2, feedback, visual_tokens

    knob_defaults = [
        (feedback, "SCAN_UNROLL", feedback.SCAN_UNROLL),
        (visual_tokens, "PALLAS_MIN_POSITIONS",
         visual_tokens.PALLAS_MIN_POSITIONS),
        (visual_tokens, "PALLAS_MAX_CHANNELS",
         visual_tokens.PALLAS_MAX_CHANNELS),
        (effnetv2, "BN_F32_STATS", effnetv2.BN_F32_STATS),
        (effnetv2, "PW_AS_DOT", effnetv2.PW_AS_DOT),
        (effnetv2, "DW_PALLAS", effnetv2.DW_PALLAS),
    ]
    from mmvqa_tpu.ops import pallas_token_head

    knob_defaults += [
        (pallas_token_head, "GACT_MM", pallas_token_head.GACT_MM),
    ]
    for i, spec in enumerate(specs):
        for mod, attr, val in knob_defaults:
            setattr(mod, attr, val)
        run, state, vb = build_run(parse_variant(spec), args.batch, args.steps)
        ms, times, state = time_variant(run, state, args.steps, args.reps)
        tag = spec + (" [drift-check]" if i == len(specs) - 1 and i > 0 else "")
        print(json.dumps({"variant": tag, "ms_per_step": round(ms, 2),
                          "all": [round(t, 2) for t in times],
                          "img_per_sec": round(vb / ms * 1e3, 1)}),
              flush=True)
        results.append((tag, ms))
        if i == 0 and args.profile:
            jax.profiler.start_trace(args.profile)
            _, losses = run(state, jax.random.PRNGKey(99))
            float(losses[-1])
            jax.profiler.stop_trace()
        del run, state
        jax.clear_caches()  # drop compiled programs + their HBM scratch
        import gc

        gc.collect()

    if args.profile:
        from mmvqa_tpu.utils.xplane import top_ops

        print(f"== top ops for variant 0 ({specs[0]}), "
              f"{args.steps} steps traced ==", flush=True)
        top_ops(args.profile, k=args.top)


if __name__ == "__main__":
    main()
