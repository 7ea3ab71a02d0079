"""Epoch loops: host control flow around the jitted steps.

Metric aggregation matches the reference: epoch loss = mean of per-batch
means (roco_utils.py:267-290); MLM accuracy = global over all masked tokens
(roco_utils.py:280-285 concat-then-mean, done here with device counters);
VQA collects per-sample predictions for host-side per-category metrics.

Super-stepping: with ``steps_per_call > 1`` the loop stacks K batches and
dispatches ONE scanned program (mmvqa_tpu.train.steps.make_multi_step /
make_multi_eval_step); per-dispatch execution through the remote device
tunnel costs seconds per step, the scanned program runs at device speed.
The remainder (< K batches) falls back to the single-step program.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from mmvqa_tpu.core.mesh import MeshSpec
from mmvqa_tpu.parallel.sharding import place_batch


def _mean(xs) -> float:
    return float(np.mean([np.asarray(x) for x in xs])) if xs else float("nan")


def _stack_batches(batches):
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def _grouped(loader, k: int):
    """Yield (stacked_group or None, leftover_batches list)."""
    pending = []
    for batch in loader:
        pending.append(batch)
        if len(pending) == k:
            yield pending, True
            pending = []
    if pending:
        yield pending, False


def mlm_epoch(
    step_fn,
    state,
    loader,
    mesh_spec: MeshSpec,
    rng: jax.Array,
    train: bool,
    multi_step_fn=None,
    steps_per_call: int = 1,
) -> Tuple[object, Dict[str, float]]:
    losses, corrects, totals = [], [], []
    gnorms: Dict[str, list] = {}
    n_items = 0
    t0 = time.time()

    def note_gnorms(m, many=False):
        for k, v in m.items():
            if k.startswith("gnorm/"):
                gnorms.setdefault(k, []).extend(
                    list(v) if many else [v]
                )

    def run_single(batch):
        nonlocal state, rng
        placed = place_batch(batch, mesh_spec)
        if train:
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, placed, sub)
        else:
            m = step_fn(state, placed)
        losses.append(m["loss"])
        note_gnorms(m)
        if "correct" in m:
            corrects.append(m["correct"])
            totals.append(m["total"])

    use_multi = multi_step_fn is not None and steps_per_call > 1
    if use_multi:
        for group, full in _grouped(loader, steps_per_call):
            n_items += int(sum(b["weights"].sum() for b in group))
            if full:
                stacked = place_batch(
                    _stack_batches(group), mesh_spec, stacked=True
                )
                if train:
                    rng, sub = jax.random.split(rng)
                    state, m = multi_step_fn(state, stacked, sub)
                else:
                    m = multi_step_fn(state, stacked)
                losses.extend(list(m["loss"]))
                note_gnorms(m, many=True)
                if "correct" in m:
                    corrects.extend(list(m["correct"]))
                    totals.extend(list(m["total"]))
            else:
                for b in group:
                    run_single(b)
    else:
        for batch in loader:
            n_items += int(batch["weights"].sum())
            run_single(batch)

    dt = time.time() - t0
    metrics = {"loss": _mean(losses), "items_per_sec": n_items / max(dt, 1e-9)}
    if corrects:
        tot = float(np.sum([np.asarray(t) for t in totals]))
        cor = float(np.sum([np.asarray(c) for c in corrects]))
        metrics["acc"] = 100.0 * cor / max(tot, 1.0)
    for k, vs in gnorms.items():
        metrics[k] = _mean(vs)
    return state, metrics


def supcon_epoch(
    step_fn,
    state,
    loader,
    mesh_spec: MeshSpec,
    rng: jax.Array,
    sim_mask_fn=None,
    multi_step_fn=None,
    steps_per_call: int = 1,
) -> Tuple[object, Dict[str, float]]:
    """Train epoch for joint MLM+SupCon. ``sim_mask_fn(captions, augs)``
    builds the host-side similarity mask; None reproduces the reference's
    live path (mask computed but unused, supcon_utils.py:286-287).
    Super-stepping applies only to the mask-less path (the mask rides the
    host, so masked batches dispatch singly)."""
    losses, mlms, cons, corrects, totals = [], [], [], [], []
    n_items = 0
    t0 = time.time()

    def strip_text(b):
        b = dict(b)
        return b.pop("caption", None), b.pop("aug_caption", None), b

    def record(m, many=False):
        if many:
            losses.extend(list(m["loss"]))
            mlms.extend(list(m["mlm_loss"]))
            cons.extend(list(m["supcon_loss"]))
            corrects.extend(list(m["correct"]))
            totals.extend(list(m["total"]))
        else:
            losses.append(m["loss"])
            mlms.append(m["mlm_loss"])
            cons.append(m["supcon_loss"])
            corrects.append(m["correct"])
            totals.append(m["total"])

    use_multi = (
        multi_step_fn is not None and steps_per_call > 1
        and sim_mask_fn is None
    )
    if use_multi:
        for group, full in _grouped(loader, steps_per_call):
            n_items += int(sum(b["weights"].sum() for b in group)) * 2
            group = [strip_text(b)[2] for b in group]
            if full:
                stacked = place_batch(
                    _stack_batches(group), mesh_spec, stacked=True
                )
                rng, sub = jax.random.split(rng)
                state, m = multi_step_fn(state, stacked, sub)
                record(m, many=True)
            else:
                for b in group:
                    placed = place_batch(b, mesh_spec)
                    rng, sub = jax.random.split(rng)
                    state, m = step_fn(state, placed, sub, None)
                    record(m)
    else:
        for batch in loader:
            n_items += int(batch["weights"].sum()) * 2
            captions, augs, batch = strip_text(batch)
            sim_mask = None
            if sim_mask_fn is not None and captions is not None:
                sim_mask = sim_mask_fn(captions, augs)
            batch = place_batch(batch, mesh_spec)
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, batch, sub, sim_mask)
            record(m)
    dt = time.time() - t0
    tot = float(np.sum([np.asarray(t) for t in totals]))
    cor = float(np.sum([np.asarray(c) for c in corrects]))
    return state, {
        "loss": _mean(losses),
        "mlm_loss": _mean(mlms),
        "supcon_loss": _mean(cons),
        "acc": 100.0 * cor / max(tot, 1.0),
        "items_per_sec": n_items / max(dt, 1e-9),
    }


def vqa_epoch(
    step_fn,
    state,
    loader,
    mesh_spec: MeshSpec,
    rng: Optional[jax.Array],
    train: bool,
    collect_logits: bool = False,
    multi_step_fn=None,
    steps_per_call: int = 1,
) -> Tuple[object, Dict]:
    """Returns (state, {'loss', 'preds', 'targets', ['logits'],
    'items_per_sec'}) with preds/targets filtered to real (non-pad) rows in
    dataset order."""
    losses, preds, targets, weights, logits = [], [], [], [], []
    n_items = 0
    t0 = time.time()

    def note_batch(batch):
        nonlocal n_items
        n_items += int(batch["weights"].sum())
        weights.append(np.asarray(batch["weights"]).copy())
        targets.append(np.asarray(batch["answer"]).copy())

    def run_single(batch):
        nonlocal state, rng
        note_batch(batch)
        placed = place_batch(batch, mesh_spec)
        if train:
            rng, sub = jax.random.split(rng)
            state, m = step_fn(state, placed, sub)
        else:
            m = step_fn(state, placed)
            if collect_logits:
                logits.append(m["logits"])
        losses.append(m["loss"])
        preds.append(m["preds"])

    use_multi = multi_step_fn is not None and steps_per_call > 1
    if use_multi:
        for group, full in _grouped(loader, steps_per_call):
            if not full:
                for b in group:
                    run_single(b)
                continue
            for b in group:
                note_batch(b)
            stacked = place_batch(_stack_batches(group), mesh_spec, stacked=True)
            if train:
                rng, sub = jax.random.split(rng)
                state, m = multi_step_fn(state, stacked, sub)
            else:
                m = multi_step_fn(state, stacked)
                if collect_logits:
                    logits.extend(list(m["logits"]))
            losses.extend(list(m["loss"]))
            preds.extend(list(m["preds"]))
    else:
        for batch in loader:
            run_single(batch)

    dt = time.time() - t0
    w = np.concatenate(weights) > 0
    out = {
        "loss": _mean(losses),
        "preds": np.concatenate([np.asarray(p) for p in preds])[w],
        "targets": np.concatenate(targets)[w],
        "items_per_sec": n_items / max(dt, 1e-9),
    }
    if collect_logits and logits:
        out["logits"] = np.concatenate([np.asarray(l) for l in logits])[w]
    return state, out
