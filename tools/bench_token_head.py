"""Micro-benchmark: fused token-head kernel vs XLA reference, fwd+bwd,
at the flagship stage shapes. Fast compile (~1 min) for kernel iteration;
confirm any win with the full-step A/B (tools/perf.py) before adopting.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [  # (tag, B, P, K)
    ("stage0", 128, 112 * 112, 24),
    ("stage1", 128, 56 * 56, 48),
    ("resnet_stem", 128, 112 * 112, 64),  # resnet.py shallowest tap
]
STEPS = 30


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--row_block", type=int, default=0,
                    help="override ROW_BLOCK (0 = module default)")
    ap.add_argument("--tile", type=int, default=0,
                    help="override max TILE_P (0 = module default)")
    ap.add_argument("--shapes", nargs="*", default=[],
                    help="subset of shape tags to run")
    ap.add_argument("--act", default="serf_fast",
                    help="activation (relu isolates the VPU act cost)")
    ap.add_argument("--impls", nargs="*", default=["pallas", "xla"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.ops import pallas_token_head as pth
    from mmvqa_tpu.ops.pallas_token_head import (
        fused_token_head,
        token_head_reference,
    )

    if args.row_block:
        pth.ROW_BLOCK = args.row_block
    if args.tile:
        pth.TILE_P = args.tile
        pth._pick_tile.cache_clear()

    for tag, B, P, K in SHAPES:
        if args.shapes and tag not in args.shapes:
            continue
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, P, K)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, 768)) * 0.05, jnp.bfloat16)

        for name, fn in (("pallas", fused_token_head),
                         ("xla", token_head_reference)):
            if name not in args.impls:
                continue

            def value(w_, x_):
                return jnp.sum(fn(x_, w_, args.act).astype(jnp.float32))

            grad = jax.grad(value, argnums=(0, 1))

            @jax.jit
            def run(w_, x_):
                def body(c, _):
                    dw, dx = grad(c, x_)
                    return c + 1e-6 * dw, jnp.sum(dx.astype(jnp.float32))

                return jax.lax.scan(body, w_, None, length=STEPS)

            out, s = run(w, x)  # compile+warm
            float(s[-1])
            t0 = time.time()
            out, s = run(w, x)
            float(s[-1])
            dt = (time.time() - t0) / STEPS * 1e3
            print(json.dumps({"shape": tag, "impl": name,
                              "fwd_bwd_ms": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
