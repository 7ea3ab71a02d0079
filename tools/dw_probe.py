"""Bound the depthwise-conv lever: what does XLA's dw conv actually cost?

The round-3 trace folds conv custom-call time into adjacent fusions, so the
per-op cost of the 44 depthwise 3x3 convs (MBConv stages 3-6) is invisible.
This times each dw-conv shape in isolation (fwd and fwd+bwd, scanned) and
compares against the VPU/HBM ideal (9 FMA/elem fwd, ~27 ops/elem total
bwd; 2 bytes/elem in+out at ~700 GB/s). If XLA is already within ~2x of
ideal, a Pallas NHWC depthwise kernel (the "layout lever", DESIGN.md §7)
cannot win enough to matter and stays unbuilt.

Usage: python tools/dw_probe.py [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, H, C, stride, reps) at B=128 — mid channels of MBConv stages 3-6
SHAPES = [
    ("stage3_dw", 14, 320, 1, 6),   # 7 blocks, first is s2 (28->14)
    ("stage4_dw", 14, 960, 1, 14),
    ("stage5_dw", 7, 1056, 1, 17),  # 18 blocks, first is s2
    ("stage6_dw", 7, 1824, 1, 5),
]
B = 128


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    for tag, H, C, stride, reps in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.1, jnp.bfloat16)

        def dw(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, window_strides=(stride, stride), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            )

        def fwd_loss(x_, w_):
            y = dw(x_, w_).astype(jnp.float32)
            return jnp.sum(y * y)  # nonlinear: bwd must run the real chain

        grad = jax.grad(fwd_loss, argnums=(0, 1))
        eps = jnp.asarray(1e-4, jnp.bfloat16)

        # carry the MAP itself so consecutive convs are data-dependent and
        # nothing hoists out of the scan (stride-1 dw keeps x's shape)
        def body_fwd(xc):
            y = dw(xc, w)
            return (xc + eps * y).astype(jnp.bfloat16), jnp.sum(
                y.astype(jnp.float32))

        def body_bwd(xc):
            gx, gw = grad(xc, w)
            return (xc + eps * gx.astype(jnp.bfloat16)), jnp.sum(
                gw.astype(jnp.float32))

        for name, body in (("fwd", body_fwd), ("fwd+bwd", body_bwd)):
            @jax.jit
            def run(x0):
                def step(c, _):
                    for _ in range(reps):
                        c, s = body(c)
                    return c, s

                return jax.lax.scan(step, x0, None, length=args.steps)

            c, s = run(x)
            float(s[-1])
            t0 = time.time()
            c, s = run(x + eps)
            float(s[-1])
            ms = (time.time() - t0) / args.steps * 1e3
            elems = B * (H // stride) * (H // stride) * C
            print(json.dumps({
                "shape": tag, "mode": name, "reps": reps,
                "ms_per_step": round(ms, 3),
                "us_per_conv": round(ms / reps * 1e3, 1),
                "bytes_ideal_us": round(
                    elems * 2 * (2 if name == "fwd" else 5) / 700e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
