"""Collective-communication audit of the compiled sharded train step.

The framework's whole distributed design is declarative: shardings are
attached to params/batches (parallel/sharding.py) and XLA's SPMD
partitioner inserts the ICI collectives. That makes the COMPILED
communication pattern the ground truth — a bad sharding rule shows up as
extra collectives (e.g. a per-step full-parameter all-gather from a
mis-sharded optimizer state, or all-to-alls from a layout conflict), not
as a Python-visible error, and on real hardware it would silently burn
interconnect bandwidth.

This tool jits the full MLM train step (tiny model) over a chosen
('data','model','context') mesh, parses ``compiled.as_text()`` for
collective ops, and reports count + payload bytes per collective type.
Measured fingerprint on jax 0.9.0 (pinned by tests/test_sharding_audit.py):

* pure DP (8,1,1): ALL-REDUCE ONLY (gradient/BN-stat/metric reductions) —
  no all-gather, no all-to-all, no collective-permute. Per-step
  all-reduce payload ~= grad bytes (params f32) + BN batch stats +
  scalar metrics.
* DP x TP (4,2,1): + row-parallel partial-sum and vocab-parallel logit
  all-reduces and a BOUNDED number of small all-gathers.
* DP x TP x CP (2,2,2): + collective-permutes / all-to-alls from the
  token-axis resharding around attention (GSPMD's chosen pattern for the
  'context' axis; ring attention replaces them with explicit ppermute
  when enabled).

Usage: python tools/sharding_audit.py [--dp 8 --tp 1 --cp 1]
(self-provisions an 8-device virtual CPU mesh; run standalone, not under
an initialized TPU backend).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)
# `%name = <shape> <op>(` — shape is a tuple `(f32[..], ...)` or one array
_OP_RE = re.compile(
    r"=\s+(\([^)]*\)|\S+)\s+(" + "|".join(COLLECTIVES) + r")(-start)?\("
)
_ARR_RE = re.compile(r"(pred|[a-z]+\d+)\[([\d,]*)\]")
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _ARR_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


def audit_hlo(hlo_text: str) -> dict:
    """{collective: {'count': n, 'bytes': payload}} over one HLO module."""
    out = {}
    for m in _OP_RE.finditer(hlo_text):
        shape, op = m.group(1), m.group(2)
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += _shape_bytes(shape)
    return out


@contextlib.contextmanager
def capture_compile_diagnostics(sink: dict):
    """Capture GSPMD partitioner diagnostics emitted during a compile.

    XLA's SPMD fallback warnings ("[SPMD] Involuntary full
    rematerialization ... SPMD will replicate the tensor") are written by
    C++ abseil logging straight to FD 2 — invisible to sys.stderr hooks —
    so this redirects the file descriptor around the compile and parses
    the text back out. ``sink`` gains:

    * ``spmd_fallbacks``: one record per involuntary-remat warning with
      the offending HLO op and (when present) the jax op_name;
    * ``stderr``: the full captured text (for anything new).

    The round-4 MULTICHIP artifact showed two such fallbacks that nothing
    audited (VERDICT r4 item 3); this makes them a pinned, testable
    quantity.
    """
    saved = os.dup(2)
    tmp = tempfile.TemporaryFile(mode="w+b")
    os.dup2(tmp.fileno(), 2)
    try:
        yield sink
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)
        os.close(saved)
        tmp.seek(0)
        text = tmp.read().decode(errors="replace")
        tmp.close()
    sink["stderr"] = text
    fallbacks = []
    for chunk in re.finditer(
        r"Involuntary full rematerialization.*?(?=\n[WIEF]\d{4}|\Z)",
        text, re.S,
    ):
        body = chunk.group(0)
        op = re.search(r"HLO operation %(\S+) =", body) or re.search(
            r"HLO operation %(\S+)", body)
        opname = re.search(r'op_name="([^"]*)"', body)
        fallbacks.append({
            "hlo_op": op.group(1).rstrip(",") if op else "?",
            "op_name": opname.group(1) if opname else "",
        })
    sink["spmd_fallbacks"] = fallbacks


def lower_train_step(
    dp: int, tp: int, cp: int, vocab: int = 128, fsdp: bool = False,
    flagship: bool = False,
):
    """Compiled HLO text of the full (tiny-CNN) MLM train step on a
    dp x tp x cp mesh, plus the fp32 parameter byte count. ``fsdp``
    additionally ZeRO-shards params/moments over 'data' (threshold
    dropped to 0 so the tiny audit model exercises the layout — the
    fingerprint under test is the communication pattern, not the
    real-scale threshold). ``flagship`` switches to the RealFormer
    encoder at the dryrun_multichip shapes (T=24, S=64, vocab=512) — the
    composition that exposed the round-5 conv-kernel FSDP fallback (the
    vanilla-transformer audit shapes never trip it)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core import mesh as mesh_module
    from mmvqa_tpu.core.config import pretrain_config
    from mmvqa_tpu.core.mesh import make_mesh
    from mmvqa_tpu.models import MMBert
    from mmvqa_tpu.parallel import sharding as sharding_module
    from mmvqa_tpu.parallel.sharding import place_batch, place_state
    from mmvqa_tpu.train import create_train_state, make_mlm_steps

    if flagship:
        B, T, S, vocab = 8, 24, 64, 512
        cfg = pretrain_config(
            cnn_encoder="tf_efficientnetv2_m",
            transformer_model="realformer",
            hidden_size=64, n_layers=2, vocab_size=vocab,
            max_position_embeddings=T, image_size=S, tiny_cnn=True,
            batch_size=B, mlm_prob=0.5, hidden_dropout_prob=0.0,
        )
    else:
        B, T, S = 8, 16, 32
        cfg = pretrain_config(
            hidden_size=64, n_layers=1, heads=4, vocab_size=vocab,
            max_position_embeddings=T, image_size=S, tiny_cnn=True,
            batch_size=B, mlm_prob=0.5, hidden_dropout_prob=0.0,
        )
    model = MMBert(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8),
        "tokens": rng.integers(0, vocab, (B, T)).astype(np.int32),
        "segment_ids": np.zeros((B, T), np.int32),
        "input_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(0, vocab, (B, T)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3)),
        jnp.asarray(batch["tokens"]), jnp.asarray(batch["segment_ids"]),
        jnp.asarray(batch["input_mask"]),
    )
    param_bytes = sum(
        x.size * 4 for x in jax.tree.leaves(variables["params"])
    )
    spec = make_mesh(dp, tp, cp)
    old = mesh_module.CURRENT
    old_min = sharding_module.FSDP_MIN_SIZE
    try:
        mesh_module.set_current(spec)  # arms the activation constraints
        if fsdp:
            sharding_module.FSDP_MIN_SIZE = 0
        state = place_state(
            create_train_state(variables, 1e-3), spec, fsdp=fsdp
        )
        placed = place_batch(batch, spec)
        train_step, _ = make_mlm_steps(model, cfg)  # already jitted
        diag = {}
        with capture_compile_diagnostics(diag):
            txt = (
                train_step.lower(state, placed, jax.random.PRNGKey(1))
                .compile()
                .as_text()
            )
    finally:
        mesh_module.set_current(old)
        sharding_module.FSDP_MIN_SIZE = old_min
    return txt, param_bytes, diag


def main(argv=None) -> None:
    os.environ.pop("JAX_PLATFORMS", None)
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--dp", type=int, default=8)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--cp", type=int, default=1)
    p.add_argument("--fsdp", action="store_true", default=False)
    p.add_argument("--flagship", action="store_true", default=False,
                   help="RealFormer at the dryrun shapes (round-5 "
                        "conv-kernel FSDP fallback trigger)")
    args = p.parse_args(argv)

    txt, param_bytes, diag = lower_train_step(
        args.dp, args.tp, args.cp, fsdp=args.fsdp, flagship=args.flagship
    )
    report = audit_hlo(txt)
    print(json.dumps({
        "mesh": {"data": args.dp, "model": args.tp, "context": args.cp},
        "fsdp": args.fsdp,
        "flagship": args.flagship,
        "param_bytes": param_bytes,
        "collectives": report,
        "spmd_fallbacks": diag.get("spmd_fallbacks", []),
    }))


if __name__ == "__main__":
    main()
