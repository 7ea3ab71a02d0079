"""Probe: fused conv1x1+BN-stat kernel vs XLA's separate stat pass.

VERDICT r2 #1 decision probe. Emulates the trunk's fwd structure at the
heaviest pointwise-conv+BN shapes: XLA baseline materializes y = x @ W
(like the conv custom-call) then reads it again for the f32 stat sums (the
convert_reduce fwd fusions); the fused kernel emits stats in the y pass.
Both run in a lax.scan over `reps` block-shapes with y forced to
materialize (it feeds the BN normalize in the real model).

Usage: python tools/convbn_probe.py [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, N=B*H*W, Cin, Cout, reps) — per-family fwd maps at B=128/224px:
# stage4 pw_exp 14 blocks (25088,160->960); stage5 pw_exp 18 blocks
# (6272,176->1056); stage6 pw_exp 5 blocks (6272,304->1824);
# stage4 pw_proj (25088,960->176).
SHAPES = [
    ("stage4_pw_exp", 128 * 14 * 14, 160, 960, 14),
    ("stage5_pw_exp", 128 * 7 * 7, 176, 1056, 18),
    ("stage6_pw_exp", 128 * 7 * 7, 304, 1824, 5),
    ("stage4_pw_proj", 128 * 14 * 14, 960, 176, 14),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.ops.pallas_conv_bn import (
        conv1x1_stats,
        conv1x1_stats_reference,
    )

    total = {"pallas": 0.0, "xla": 0.0}
    for tag, N, K, C, reps in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(N, K)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, C)) * 0.05, jnp.bfloat16)

        for name, fn in (("pallas", conv1x1_stats),
                         ("xla", conv1x1_stats_reference)):

            @jax.jit
            def run(x0, w0):
                def body(carry, _):
                    xc, acc = carry
                    for _ in range(reps):
                        y, s = fn(xc, w0)
                        # y must materialize (BN normalize consumes it in
                        # the real model); fold one lane back into the
                        # carry so nothing is dead
                        acc = acc + s[0, 0] + s[1, 0] + y[0, 0].astype(
                            jnp.float32)
                    return (xc, acc), acc

                return jax.lax.scan(body, (x0, 0.0), None, length=args.steps)

            (xo, acc), hist = run(x, w)  # compile+warm
            float(acc)
            t0 = time.time()
            (xo, acc), hist = run(x, w)
            float(acc)
            dt = (time.time() - t0) / args.steps * 1e3
            total[name] += dt
            print(json.dumps({"shape": tag, "impl": name,
                              "ms_per_step": round(dt, 3),
                              "reps": reps}), flush=True)

    print(json.dumps({"total_pallas_ms": round(total["pallas"], 2),
                      "total_xla_ms": round(total["xla"], 2),
                      "fwd_stat_pass_win_ms": round(
                          total["xla"] - total["pallas"], 2)}))


if __name__ == "__main__":
    main()
