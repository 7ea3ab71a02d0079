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


def _flat(xs) -> np.ndarray:
    """Concatenate a mix of device/host scalars and (K,) stacked metric
    arrays into one host vector. Conversion happens HERE, at epoch end:
    pulling metrics eagerly per dispatch (worse, element-by-element via
    ``list(device_array)``) costs a ~27 ms tunnel round-trip per value AND
    forces a sync that serializes host batch-prep against device compute."""
    if not xs:
        return np.asarray([float("nan")])
    return np.concatenate([np.atleast_1d(np.asarray(x)) for x in xs])


def _mean(xs) -> float:
    return float(_flat(xs).mean())


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

    def note_gnorms(m):
        for k, v in m.items():
            if k.startswith("gnorm/"):
                gnorms.setdefault(k, []).append(v)

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
        # remainder groups (< K batches) go through the SAME scanned
        # program — make_multi_step specializes on the stacked leading dim,
        # so the tail costs one extra cached compile instead of per-batch
        # dispatches (seconds each through the tunnel)
        for group, _full in _grouped(loader, steps_per_call):
            n_items += int(sum(b["weights"].sum() for b in group))
            stacked = place_batch(
                _stack_batches(group), mesh_spec, stacked=True
            )
            if train:
                rng, sub = jax.random.split(rng)
                state, m = multi_step_fn(state, stacked, sub)
            else:
                m = multi_step_fn(state, stacked)
            losses.append(m["loss"])
            note_gnorms(m)
            if "correct" in m:
                corrects.append(m["correct"])
                totals.append(m["total"])
    else:
        for batch in loader:
            n_items += int(batch["weights"].sum())
            run_single(batch)

    # pull all deferred device metrics (syncs on the last dispatch) BEFORE
    # stopping the clock, so items_per_sec covers the full epoch
    flat_losses = _flat(losses)
    flat_tot = _flat(totals) if corrects else None
    flat_cor = _flat(corrects) if corrects else None
    flat_gnorms = {k: _flat(vs) for k, vs in gnorms.items()}
    dt = time.time() - t0
    metrics = {"loss": float(flat_losses.mean()),
               "items_per_sec": n_items / max(dt, 1e-9)}
    if corrects:
        metrics["acc"] = (
            100.0 * float(flat_cor.sum()) / max(float(flat_tot.sum()), 1.0)
        )
    for k, vs in flat_gnorms.items():
        metrics[k] = float(vs.mean())
    return state, metrics


def supcon_epoch(
    step_fn,
    state,
    loader,
    mesh_spec: MeshSpec,
    rng: jax.Array,
    sim_mask_fn=None,
    multi_step_fn=None,
    masked_multi_step_fn=None,
    steps_per_call: int = 1,
) -> Tuple[object, Dict[str, float]]:
    """Train epoch for joint MLM+SupCon. ``sim_mask_fn(captions, augs)``
    builds the host-side similarity mask; None reproduces the reference's
    live path (mask computed but unused, supcon_utils.py:286-287).

    Super-stepping covers BOTH paths: the mask-less scanned program
    (``multi_step_fn``) and, when ``--use_sim_mask`` is on, a variant that
    threads the per-step (B, B) similarity masks through the scan as a
    stacked batch field (``masked_multi_step_fn``) — the masks are host
    arrays like every other batch field, so they stack and shard the same
    way (dispatching masked batches singly cost ~83 ms/step of tunnel
    overhead for no reason)."""
    losses, mlms, cons, corrects, totals = [], [], [], [], []
    n_items = 0
    t0 = time.time()

    def strip_text(b):
        b = dict(b)
        return b.pop("caption", None), b.pop("aug_caption", None), b

    def record(m):
        losses.append(m["loss"])
        mlms.append(m["mlm_loss"])
        cons.append(m["supcon_loss"])
        corrects.append(m["correct"])
        totals.append(m["total"])

    use_multi = (
        multi_step_fn is not None and steps_per_call > 1
        and sim_mask_fn is None
    )
    use_multi_masked = (
        masked_multi_step_fn is not None and steps_per_call > 1
        and sim_mask_fn is not None
    )
    if use_multi:
        for group, _full in _grouped(loader, steps_per_call):
            n_items += int(sum(b["weights"].sum() for b in group)) * 2
            group = [strip_text(b)[2] for b in group]
            stacked = place_batch(
                _stack_batches(group), mesh_spec, stacked=True
            )
            rng, sub = jax.random.split(rng)
            state, m = multi_step_fn(state, stacked, sub)
            record(m)
    elif use_multi_masked:
        for group, _full in _grouped(loader, steps_per_call):
            n_items += int(sum(b["weights"].sum() for b in group)) * 2
            proc = []
            for b in group:
                captions, augs, b2 = strip_text(b)
                b2["sim_mask"] = np.asarray(
                    sim_mask_fn(captions, augs), np.float32
                )
                proc.append(b2)
            stacked = place_batch(
                _stack_batches(proc), mesh_spec, stacked=True
            )
            rng, sub = jax.random.split(rng)
            state, m = masked_multi_step_fn(state, stacked, sub)
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
    flat = {k: _flat(v) for k, v in
            (("loss", losses), ("mlm", mlms), ("con", cons),
             ("cor", corrects), ("tot", totals))}
    dt = time.time() - t0
    return state, {
        "loss": float(flat["loss"].mean()),
        "mlm_loss": float(flat["mlm"].mean()),
        "supcon_loss": float(flat["con"].mean()),
        "acc": 100.0 * float(flat["cor"].sum())
        / max(float(flat["tot"].sum()), 1.0),
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
        for group, _full in _grouped(loader, steps_per_call):
            for b in group:
                note_batch(b)
            stacked = place_batch(_stack_batches(group), mesh_spec, stacked=True)
            if train:
                rng, sub = jax.random.split(rng)
                state, m = multi_step_fn(state, stacked, sub)
            else:
                m = multi_step_fn(state, stacked)
                if collect_logits:
                    logits.append(m["logits"])
            losses.append(m["loss"])
            preds.append(m["preds"])
    else:
        for batch in loader:
            run_single(batch)

    # one deferred pull per collected array (see _flat), then stop the clock
    flat_losses = _flat(losses)
    host_preds = np.concatenate(
        [np.asarray(p).reshape(-1) for p in preds]
    )
    host_logits = None
    if collect_logits and logits:
        host_logits = np.concatenate(
            [np.asarray(l).reshape(-1, np.asarray(l).shape[-1])
             for l in logits]
        )
    dt = time.time() - t0
    w = np.concatenate(weights) > 0
    out = {
        "loss": float(flat_losses.mean()),
        "preds": host_preds[w],
        "targets": np.concatenate(targets)[w],
        "items_per_sec": n_items / max(dt, 1e-9),
    }
    if host_logits is not None:
        out["logits"] = host_logits[w]
    return state, out
