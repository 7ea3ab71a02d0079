"""Orbax checkpointing: recorder + best-metric weights + cross-stage transfer.

Reference checkpoint species (SURVEY.md §5.4):
1. recorder — full train state (epoch, optimizer, scheduler, model) every 5
   epochs -> <save_dir>/recorder_2 (roco_train.py:164-171);
2. best-metric weights -> <save_dir>/<task>/<run_name>[(_loss)]
   (roco_train.py:194-197, train.py:265-283);
3. cross-stage transfer: fine-tune loads pretrain weights with key filtering
   and swaps the classifier output layer (train.py:125-137) —
   ``filtered_restore`` drops mismatching leaves (classifier_2 etc.).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(*parts: str) -> str:
    return os.path.abspath(os.path.join(*parts))


def save_pytree(path: str, tree: Any) -> None:
    path = _path(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    if like is None:
        return ckptr.restore(_path(path))
    return ckptr.restore(
        _path(path), args=ocp.args.PyTreeRestore(jax.tree.map(np.asarray, like))
    )


def save_recorder(
    save_dir: str,
    epoch: int,
    state,
    scheduler_state: Dict,
) -> None:
    """Full-state recorder (epoch, opt, scheduler, model) — recorder_2."""
    tree = {
        "epoch": epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "scheduler": dict(scheduler_state),
    }
    save_pytree(os.path.join(save_dir, "recorder_2"), tree)


def restore_recorder(save_dir: str, state) -> Tuple[Any, Dict, int]:
    """Returns (state, scheduler_state, epoch)."""
    from mmvqa_tpu.train.plateau import ReduceLROnPlateau

    like = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "scheduler": ReduceLROnPlateau(lr=0.0).state_dict(),
    }
    tree = restore_pytree(os.path.join(save_dir, "recorder_2"), like)
    state = state.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        step=tree["step"],
    )
    return state, tree["scheduler"], int(tree["epoch"])


def save_weights(path: str, state) -> None:
    """Model-only checkpoint (params + batch_stats), the reference's
    ``torch.save(model.state_dict())``."""
    save_pytree(path, {"params": state.params, "batch_stats": state.batch_stats})


def load_weights(path: str) -> Dict:
    return restore_pytree(path)


def filtered_restore(model_vars: Dict, loaded: Dict) -> Tuple[Dict, int, int]:
    """Cross-stage weight transfer with key filtering (train.py:128-137):
    keep every loaded leaf whose path exists in the target with the same
    shape (the classifier head, sized to the answer vocab, stays freshly
    initialized). Returns (merged, n_loaded, n_total)."""
    flat_target = dict(
        jax.tree_util.tree_flatten_with_path(model_vars)[0]
    )
    flat_loaded = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    n_loaded = 0
    merged = {}
    for path, leaf in flat_target.items():
        src = flat_loaded.get(path)
        if src is not None and np.shape(src) == np.shape(leaf):
            merged[path] = np.asarray(src)
            n_loaded += 1
        else:
            merged[path] = leaf
    # rebuild tree
    treedef = jax.tree_util.tree_structure(model_vars)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(model_vars)[0]]
    leaves = [merged[p] for p in paths]
    return (
        jax.tree_util.tree_unflatten(treedef, leaves),
        n_loaded,
        len(paths),
    )


def check_compatible(model_vars: Dict, loaded: Dict, what: str = "") -> None:
    """Fail FAST with a readable message when a checkpoint's parameter
    shapes don't match the constructed model (otherwise the mismatch
    surfaces as a cryptic flax ScopeParamShapeError or an XLA shape error
    deep inside apply). Typical causes: a different --cnn_encoder /
    --transformer_model / --hidden_size than the checkpoint was trained
    with, or a vocab file of a different size."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(model_vars)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    problems = []
    for path in sorted(set(flat_t) | set(flat_l), key=str):
        a, b = flat_t.get(path), flat_l.get(path)
        if a is None:
            problems.append(f"  extra in checkpoint: {path}")
        elif b is None:
            problems.append(f"  missing from checkpoint: {path}")
        elif np.shape(a) != np.shape(b):
            problems.append(
                f"  {path}: model {np.shape(a)} vs checkpoint {np.shape(b)}"
            )
    if problems:
        head = "\n".join(problems[:12])
        more = f"\n  ... and {len(problems) - 12} more" if len(problems) > 12 else ""
        raise ValueError(
            f"checkpoint{' ' + what if what else ''} is incompatible with "
            f"the constructed model ({len(problems)} mismatches):\n{head}{more}\n"
            "Check --cnn_encoder/--transformer_model/--hidden_size/"
            "--vocab_file against the values the checkpoint was trained with."
        )
