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
    try:
        tree = restore_pytree(os.path.join(save_dir, "recorder_2"), like)
    except Exception as e:  # noqa: BLE001 — re-raise with a layout hint
        raise RuntimeError(
            f"{e}\n[mmvqa] recorder restore failed. If --pp_size differs "
            "from the value the recorder was saved with, the encoder param "
            "layout (stacked 'pp_layers' vs per-layer modules) and the "
            "mirrored Adam moments no longer match: resume with the "
            "original --pp_size, or convert a weights-only checkpoint via "
            "train.checkpoint.adapt_encoder_layout (stack/unstack "
            "converters in parallel/pipeline.py)."
        ) from e
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


def _convert_encoder(enc_target: Dict, enc_loaded: Dict) -> Tuple[Dict, bool]:
    """Convert an encoder param subtree between the sequential and the
    pipeline-stacked layouts to match ``enc_target``. Returns
    (converted_subtree, changed)."""
    from mmvqa_tpu.parallel import pipeline as pl

    t_stacked = "pp_layers" in enc_target
    l_stacked = "pp_layers" in enc_loaded
    if t_stacked == l_stacked:
        return enc_loaded, False
    if t_stacked:
        # sequential checkpoint -> pipeline-stacked model
        if "block_0" in enc_loaded:  # RealFormer
            n = sum(1 for k in enc_loaded if str(k).startswith("block_"))
            return {
                "pp_layers": pl.stack_realformer_params(enc_loaded, n)
            }, True
        if "attention_0" in enc_loaded:  # vanilla BertEncoder
            n = sum(
                1 for k in enc_loaded if str(k).startswith("attention_")
            )
            stacked, n1, n2 = pl.stack_bert_encoder_params(enc_loaded, n)
            out = {"pp_layers": stacked, "norm1": n1}
            if n2 is not None:
                out["norm2"] = n2
            return out, True
        return enc_loaded, False
    # pipeline-stacked checkpoint -> sequential model
    st = enc_loaded["pp_layers"]
    if "kqv" in st:  # RealFormer
        return pl.unstack_realformer_params(st), True
    if "attention_0" in st:  # vanilla BertEncoder
        return pl.unstack_bert_encoder_params(
            st, enc_loaded["norm1"], enc_loaded.get("norm2")
        ), True
    return enc_loaded, False


def adapt_encoder_layout(model_vars: Dict, loaded: Dict) -> Dict:
    """Auto-convert a weights checkpoint between the sequential and the
    pipeline-stacked encoder layouts (parallel/pipeline.py).

    ``--pp_size > 1`` swaps the encoder's param tree to a stacked
    ``pp_layers`` layout; a checkpoint saved at a different pp_size would
    otherwise fail restore with a raw pytree mismatch. The conversion is
    exact (stack/unstack round-trips bit-for-bit,
    tests/test_pipeline_parallel.py). No-op when the layouts already
    agree. Both arguments are ``{'params': ..., 'batch_stats': ...}``
    variable dicts (or bare params dicts)."""
    tp = model_vars.get("params", model_vars)
    lp = loaded.get("params", loaded)
    enc_t = tp.get("encoder") if isinstance(tp, dict) else None
    enc_l = lp.get("encoder") if isinstance(lp, dict) else None
    if not isinstance(enc_t, dict) or not isinstance(enc_l, dict):
        return loaded
    enc_new, changed = _convert_encoder(enc_t, enc_l)
    if not changed:
        return loaded
    lp = dict(lp)
    lp["encoder"] = enc_new
    if "params" in loaded:
        out = dict(loaded)
        out["params"] = lp
        return out
    return lp


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
