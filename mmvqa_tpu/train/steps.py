"""jit-compiled train/eval steps for every objective.

Each factory closes over the model and config and returns jitted functions
with STATIC shapes: device-side augmentation, forward, loss, grad, Adam
update and metric counters all fuse into one XLA program per step. Batches
carry a ``weights`` vector (1 real / 0 padding) so the final partial batch
of an epoch reuses the same program (mmvqa_tpu.data.loader).

Parallelism: inputs are placed with a batch-sharded NamedSharding and params
replicated (or TP-sharded via mmvqa_tpu.parallel) — jit + the mesh handle DP
gradient all-reduce and, for SupCon, the global-batch contrastive
denominator automatically (the jitted program sees the global batch).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mmvqa_tpu.core.config import Config
from mmvqa_tpu.data.images import (
    FINETUNE_AUG,
    PRETRAIN_AUG,
    AugmentSpec,
    process_batch,
)
from mmvqa_tpu.ops.supcon import split_two_views, supcon_loss
from mmvqa_tpu.train.state import TrainState


def _weighted_token_nll(logits, targets, w):
    """masked_mlm_nll with per-sample weights (padding-batch exact).
    streaming_lse form: never materializes any (B, T, V) fp32 tensor
    (ops/losses.py::streaming_lse)."""
    from mmvqa_tpu.ops.losses import streaming_lse

    lse = streaming_lse(logits)
    picked = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.float32)
    per_sample = jnp.mean(lse - picked, axis=-1)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _weighted_mean(per_sample, w):
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _apply(model, params, batch_stats, img, ids, seg, mask, rng, train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = model.apply(
            variables, img, ids, seg, mask,
            deterministic=False, train_cnn=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]
    out = model.apply(variables, img, ids, seg, mask, deterministic=True)
    return out, batch_stats


def _mlm_metrics(logits, labels, w):
    pred = jnp.argmax(logits, axis=-1)
    masked = (labels > 0) & (w[:, None] > 0)
    correct = jnp.sum(jnp.where(masked, pred == labels, False))
    return correct, jnp.sum(masked)


def _grad_norms(grads) -> dict:
    """Per-top-level-module gradient L2 norms — the cheap device-side
    equivalent of the reference's ``wandb.watch(model, log='all')``
    (roco_train.py:80 logs per-parameter grad/weight histograms; here one
    scalar per module group keeps the step fully compiled)."""
    out = {}
    for key, sub in grads.items():
        sq = sum(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
            for leaf in jax.tree_util.tree_leaves(sub)
        )
        out[f"gnorm/{key}"] = jnp.sqrt(sq)
    return out


HIST_BINS = 64


def _param_histograms(tree, prefix: str, bins: int = HIST_BINS) -> dict:
    """Per-parameter histograms computed ON DEVICE: one (counts[bins], lo,
    hi) triple per leaf — the pull is ~bins ints per parameter instead of
    the parameter itself (a full grad-tree pull is impossible through the
    0.4 MB/s tunnel D2H). Together with the weight histograms this is the
    full-fidelity equivalent of ``wandb.watch(model, log='all')``
    (roco_train.py:80), emitted at epoch end (--watch_histograms) at zero
    per-step cost."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        x = leaf.astype(jnp.float32).ravel()
        lo, hi = jnp.min(x), jnp.max(x)
        width = jnp.maximum(hi - lo, 1e-12)
        idx = jnp.clip(((x - lo) / width * bins).astype(jnp.int32),
                       0, bins - 1)
        counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
        out[f"{prefix}/{name}"] = (counts, lo, hi)
    return out


def grad_weight_histograms(grads, params) -> dict:
    return {**_param_histograms(grads, "ghist"),
            **_param_histograms(params, "whist")}


def make_multi_step(train_step_raw, steps_per_call: int = 0):
    """Chain K train steps into ONE jitted program via lax.scan over
    stacked batches (leading axis = step). Metrics come back stacked per
    inner step. K is taken from the stacked batch's leading dimension at
    trace time, so ONE returned function serves every group size —
    including the end-of-epoch remainder — at one cached compile per
    distinct K (``steps_per_call`` is kept for signature compatibility but
    unused).

    This is not just an optimization here: per-dispatch execution through
    the remote device tunnel measures SECONDS per step while the identical
    program inside a lax.scan runs at device speed (~170 ms) — so the
    drivers super-step by default (--steps_per_call). No reference
    equivalent (the reference dispatches per batch).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def step_k(state: TrainState, stacked_batches, rng):
        k = jax.tree_util.tree_leaves(stacked_batches)[0].shape[0]
        keys = jax.random.split(rng, k)

        def body(s, xs):
            b, kk = xs
            return train_step_raw(s, b, kk)

        return jax.lax.scan(body, state, (stacked_batches, keys))

    return step_k


def make_multi_eval_step(eval_step_raw, steps_per_call: int = 0):
    """Scan K eval steps in one dispatch (see make_multi_step: K comes
    from the stacked leading dim; remainder groups reuse this path)."""

    @jax.jit
    def step_k(state: TrainState, stacked_batches):
        def body(_, b):
            return None, eval_step_raw(state, b)

        _, metrics = jax.lax.scan(body, None, stacked_batches)
        return metrics

    return step_k


# ---------------------------------------------------------------------------
# MLM pretraining (roco_train.py / roco_utils.py:207-372)
# ---------------------------------------------------------------------------

def make_mlm_steps(
    model, cfg: Config, aug: AugmentSpec = PRETRAIN_AUG, raw: bool = False,
    histograms: bool = False,
):
    def train_step(state: TrainState, batch, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        img = process_batch(batch["image"], aug_rng, aug, True)
        w = batch["weights"]

        def loss_fn(params):
            out, bstats = _apply(
                model, params, state.batch_stats, img,
                batch["tokens"], batch["segment_ids"], batch["input_mask"],
                drop_rng, True,
            )
            loss = _weighted_token_nll(out, batch["labels"], w)
            return loss, (out, bstats)

        (loss, (logits, bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        pre_update_params = state.params
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        correct, total = _mlm_metrics(logits, batch["labels"], w)
        metrics = {"loss": loss, "correct": correct, "total": total}
        if cfg.watch:
            metrics.update(_grad_norms(grads))
        if histograms:
            # histograms describe the params the gradients were taken AT
            # (the state being monitored/checkpointed) — post-update params
            # include one extra step on the pinned batch and never exist in
            # the real training state
            metrics.update(grad_weight_histograms(grads, pre_update_params))
        return state, metrics

    def eval_step(state: TrainState, batch):
        img = process_batch(batch["image"], jax.random.PRNGKey(0), aug, False)
        w = batch["weights"]
        out, _ = _apply(
            model, state.params, state.batch_stats, img, batch["tokens"],
            batch["segment_ids"], batch["input_mask"], None, False,
        )
        loss = _weighted_token_nll(out, batch["labels"], w)
        correct, total = _mlm_metrics(out, batch["labels"], w)
        return {"loss": loss, "correct": correct, "total": total}

    if raw:
        return (
            jax.jit(train_step, donate_argnums=(0,)),
            jax.jit(eval_step),
            train_step,
            eval_step,
        )
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


# ---------------------------------------------------------------------------
# distillation pretraining (roco_train.py:94-95)
# ---------------------------------------------------------------------------

def make_distill_steps(model, cfg: Config, aug: AugmentSpec = PRETRAIN_AUG,
                       histograms: bool = False, raw: bool = False):
    def train_step(state: TrainState, batch, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        img = process_batch(batch["image"], aug_rng, aug, True)
        w = batch["weights"]

        def loss_fn(params):
            out, bstats = _apply(
                model, params, state.batch_stats, img,
                batch["tokens"], batch["segment_ids"], batch["input_mask"],
                drop_rng, True,
            )
            per_sample = jnp.mean(
                jnp.square(
                    out.astype(jnp.float32)
                    - batch["labels"].astype(jnp.float32)
                ),
                axis=(1, 2),
            )
            return _weighted_mean(per_sample, w), bstats

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        pre_update_params = state.params
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        metrics = {"loss": loss}
        if histograms:
            # histograms describe the params the gradients were taken AT
            # (the state being monitored/checkpointed) — post-update params
            # include one extra step on the pinned batch and never exist in
            # the real training state
            metrics.update(grad_weight_histograms(grads, pre_update_params))
        return state, metrics

    def eval_step(state: TrainState, batch):
        img = process_batch(batch["image"], jax.random.PRNGKey(0), aug, False)
        out, _ = _apply(
            model, state.params, state.batch_stats, img, batch["tokens"],
            batch["segment_ids"], batch["input_mask"], None, False,
        )
        per_sample = jnp.mean(
            jnp.square(
                out.astype(jnp.float32) - batch["labels"].astype(jnp.float32)
            ),
            axis=(1, 2),
        )
        return {"loss": _weighted_mean(per_sample, batch["weights"])}

    if raw:
        return (
            jax.jit(train_step, donate_argnums=(0,)),
            jax.jit(eval_step),
            train_step,
            eval_step,
        )
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


# ---------------------------------------------------------------------------
# MLM + SupCon/SimCLR joint pretraining (supcon_utils.py:263-323)
# ---------------------------------------------------------------------------

def make_supcon_steps(
    model, cfg: Config, aug: AugmentSpec = PRETRAIN_AUG, raw: bool = False,
    histograms: bool = False,
):
    """Two augmented views of each image (TwoCropTransform,
    supcon_utils.py:26-32) + caption/back-translation token views,
    concatenated along batch (process_tensors, :253-256). The similarity
    mask is an optional input; the reference's live path does NOT pass it
    (:287) — pass mask=None for parity, or set cfg.use_sim_mask.
    """

    def train_step(state: TrainState, batch, rng, sim_mask=None):
        a1, a2, drop_rng = jax.random.split(rng, 3)
        img1 = process_batch(batch["image"], a1, aug, True)
        img2 = process_batch(batch["image"], a2, aug, True)
        img = jnp.concatenate([img1, img2], axis=0)
        ids = jnp.concatenate([batch["tokens"], batch["aug_tokens"]], axis=0)
        seg = jnp.concatenate([batch["segment_ids"]] * 2, axis=0)
        mask = jnp.concatenate([batch["input_mask"]] * 2, axis=0)
        labels = jnp.concatenate([batch["labels"], batch["aug_labels"]], axis=0)
        w = jnp.concatenate([batch["weights"]] * 2, axis=0)

        def loss_fn(params):
            (logits, feat), bstats = _apply(
                model, params, state.batch_stats, img, ids, seg, mask,
                drop_rng, True,
            )
            nll = _weighted_token_nll(logits, labels, w)
            feats = split_two_views(feat)
            con = supcon_loss(feats, mask=sim_mask)
            return nll + con, (logits, bstats, nll, con)

        (loss, (logits, bstats, nll, con)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        pre_update_params = state.params
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        correct, total = _mlm_metrics(logits, labels, w)
        metrics = {
            "loss": loss, "mlm_loss": nll, "supcon_loss": con,
            "correct": correct, "total": total,
        }
        if histograms:
            # histograms describe the params the gradients were taken AT
            # (the state being monitored/checkpointed) — post-update params
            # include one extra step on the pinned batch and never exist in
            # the real training state
            metrics.update(grad_weight_histograms(grads, pre_update_params))
        return state, metrics

    # validation is plain MLM (roco_supcon_train.py:174) on the supcon model,
    # whose forward returns (logits, feat)
    def eval_step(state: TrainState, batch):
        img = process_batch(batch["image"], jax.random.PRNGKey(0), aug, False)
        w = batch["weights"]
        (logits, _), _ = _apply(
            model, state.params, state.batch_stats, img, batch["tokens"],
            batch["segment_ids"], batch["input_mask"], None, False,
        )
        loss = _weighted_token_nll(logits, batch["labels"], w)
        correct, total = _mlm_metrics(logits, batch["labels"], w)
        return {"loss": loss, "correct": correct, "total": total}

    if raw:
        return (
            jax.jit(train_step, donate_argnums=(0,)),
            jax.jit(eval_step),
            train_step,
            eval_step,
        )
    return (
        jax.jit(train_step, donate_argnums=(0,)),
        jax.jit(eval_step),
    )


# ---------------------------------------------------------------------------
# VQA fine-tuning (vqamed2019/utils.py:625-843)
# ---------------------------------------------------------------------------

def make_vqa_steps(
    model,
    cfg: Config,
    aug: AugmentSpec = FINETUNE_AUG,
    category_smoothing_table: Optional[jnp.ndarray] = None,
    raw: bool = False,
    histograms: bool = False,
):
    """criterion select (train.py:163-173, smoothing takes precedence):
    LabelSmoothByCategory (when cfg.smoothing) | CE | ASLSingleLabel.

    Eval-time criterion: the reference's validate/test pass val/test logits
    through the SAME criterion object (vqamed2019/utils.py:690-711 — ``loss
    = criterion(logits, target)`` with ``criterion.eval()`` but no eval
    branch in asl_singlelabel.py:23-53), so under ``--loss ASLSingleLabel``
    the monitored val/test loss IS the ASL loss — it drives the plateau LR
    schedule and the best-val-loss checkpoint. Only the smoothing criteria
    branch on ``self.training``: LabelSmoothing (utils.py:196-200) and
    LabelSmoothByCategory (utils.py:1261-1264) fall back to plain CE.
    """
    use_smoothing = cfg.smoothing is not None and category_smoothing_table is not None
    smoothing = cfg.smoothing if cfg.smoothing else 0.1
    if use_smoothing:
        category_smoothing_table = jnp.asarray(category_smoothing_table)

    def _asl_per_sample(logits32, answers):
        # per-sample form of asl_single_label (asl_singlelabel.py:23-53,
        # gamma_pos=0 gamma_neg=4 eps=0.1) for weighted reduction
        num_classes = logits32.shape[-1]
        logp = jax.nn.log_softmax(logits32, axis=-1)
        one_hot = jax.nn.one_hot(answers, num_classes, dtype=logp.dtype)
        anti = 1.0 - one_hot
        p = jnp.exp(logp)
        wgt = jnp.power(
            1.0 - p * one_hot - (1.0 - p) * anti, 4.0 * anti
        )
        soft = one_hot * 0.9 + 0.1 / num_classes
        return jnp.sum(-soft * (logp * wgt), axis=-1)

    def criterion(logits, answers, categories):
        logits32 = logits.astype(jnp.float32)
        if use_smoothing:
            soft = category_smoothing_table[categories]
            bidx = jnp.arange(logits.shape[0])
            soft = soft.at[bidx, answers].set(1.0 - smoothing)
            logp = jax.nn.log_softmax(logits32, axis=-1)
            return jnp.sum(-soft * logp, axis=-1)
        if cfg.loss == "ASLSingleLabel":
            return _asl_per_sample(logits32, answers)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        return -jnp.take_along_axis(logp, answers[:, None], axis=-1)[:, 0]

    def eval_criterion(logits, answers):
        logits32 = logits.astype(jnp.float32)
        if cfg.loss == "ASLSingleLabel" and not use_smoothing:
            return _asl_per_sample(logits32, answers)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        return -jnp.take_along_axis(logp, answers[:, None], axis=-1)[:, 0]

    def train_step(state: TrainState, batch, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        img = process_batch(batch["image"], aug_rng, aug, True)
        w = batch["weights"]
        answers = batch["answer"].astype(jnp.int32)
        cats = batch.get("category", jnp.zeros_like(answers)).astype(jnp.int32)

        def loss_fn(params):
            logits, bstats = _apply(
                model, params, state.batch_stats, img,
                batch["tokens"], batch["segment_ids"], batch["input_mask"],
                drop_rng, True,
            )
            per_sample = criterion(logits, answers, cats)
            return _weighted_mean(per_sample, w), (logits, bstats)

        (loss, (logits, bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        pre_update_params = state.params
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        preds = jnp.argmax(logits, axis=-1)
        metrics = {"loss": loss, "preds": preds}
        if histograms:
            # histograms describe the params the gradients were taken AT
            # (the state being monitored/checkpointed) — post-update params
            # include one extra step on the pinned batch and never exist in
            # the real training state
            metrics.update(grad_weight_histograms(grads, pre_update_params))
        return state, metrics

    def eval_step(state: TrainState, batch):
        img = process_batch(batch["image"], jax.random.PRNGKey(0), aug, False)
        w = batch["weights"]
        answers = batch["answer"].astype(jnp.int32)
        logits, _ = _apply(
            model, state.params, state.batch_stats, img, batch["tokens"],
            batch["segment_ids"], batch["input_mask"], None, False,
        )
        loss = _weighted_mean(eval_criterion(logits, answers), w)
        return {"loss": loss, "preds": jnp.argmax(logits, axis=-1),
                "logits": logits}

    if raw:
        return (
            jax.jit(train_step, donate_argnums=(0,)),
            jax.jit(eval_step),
            train_step,
            eval_step,
        )
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


# ---------------------------------------------------------------------------
# image-only auxiliary baselines (vqamed2019/utils.py:960-1232)
# ---------------------------------------------------------------------------

def make_img_only_steps(model, cfg: Config, aug: AugmentSpec = FINETUNE_AUG):
    """Train/eval steps for ImageOnlyClassifier (optional keyword pathway);
    plain CE like the reference's img-only/binary loops."""

    def _forward(params, batch_stats, img, keyword, rng, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mut = model.apply(
                variables, img, keyword, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng} if rng is not None else {},
            )
            return out, mut["batch_stats"]
        return model.apply(variables, img, keyword, train=False), batch_stats

    def train_step(state: TrainState, batch, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        img = process_batch(batch["image"], aug_rng, aug, True)
        w = batch["weights"]
        answers = batch["answer"].astype(jnp.int32)
        keyword = batch.get("keyword")

        def loss_fn(params):
            logits, bstats = _forward(
                params, state.batch_stats, img, keyword, drop_rng, True
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            per = -jnp.take_along_axis(logp, answers[:, None], axis=-1)[:, 0]
            return _weighted_mean(per, w), (logits, bstats)

        (loss, (logits, bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        pre_update_params = state.params
        state = state.apply_gradients(grads).replace(batch_stats=bstats)
        return state, {"loss": loss, "preds": jnp.argmax(logits, -1)}

    def eval_step(state: TrainState, batch):
        img = process_batch(batch["image"], jax.random.PRNGKey(0), aug, False)
        w = batch["weights"]
        answers = batch["answer"].astype(jnp.int32)
        logits, _ = _forward(
            state.params, state.batch_stats, img, batch.get("keyword"),
            None, False,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        per = -jnp.take_along_axis(logp, answers[:, None], axis=-1)[:, 0]
        return {"loss": _weighted_mean(per, w),
                "preds": jnp.argmax(logits, -1), "logits": logits}

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)
