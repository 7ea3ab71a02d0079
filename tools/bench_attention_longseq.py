"""Long-sequence attention bench: pallas vs xla realformer cores.

The Pallas attention kernel (ops/pallas_attention.py) was demoted at the
reference's T=75 (12.2 vs 7.8 ms in-step, DESIGN.md §3) with the claim
that its fused form "pays off only at long sequence". This measures that
claim on the real chip: fwd+bwd over a lax.scan at growing T, single
chip, B scaled down to keep the (B, T, T, H) score tensor in memory.

Usage: python tools/bench_attention_longseq.py [--seqs 512 1024 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, E = 8, 96  # flagship head geometry (hidden 768, 8 heads)
STEPS = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", nargs="*", type=int, default=[512, 1024, 2048])
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = auto (keep B*T*T*H ~ 2^31 bytes bf16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.ops.attention import realformer_attention

    for T in args.seqs:
        B = args.batch or max(1, (1 << 30) // (T * T * H * 2))
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, T, H, E)), jnp.bfloat16)
            for _ in range(3)
        )
        prev = jnp.asarray(rng.normal(size=(B, T, T, H)) * 0.1, jnp.bfloat16)
        mask = jnp.asarray((rng.random((B, T)) < 0.95).astype(np.float32))

        for impl in ("xla", "pallas"):
            def step(c, _):
                qc, pc = c

                def loss(qc, pc):
                    ctx, sc = realformer_attention(
                        qc, k, v, pc, mask, impl=impl)
                    return (jnp.sum(ctx.astype(jnp.float32))
                            + 1e-6 * jnp.sum(sc.astype(jnp.float32)))

                dq, dp = jax.grad(loss, argnums=(0, 1))(qc, pc)
                return (qc + 1e-6 * dq, pc + 1e-6 * dp), jnp.sum(dq)

            @jax.jit
            def run(q, prev):
                (qf, pf), s = jax.lax.scan(step, (q, prev), None,
                                           length=STEPS)
                return s

            try:
                s = run(q, prev)
                float(s[-1])
                t0 = time.time()
                s = run(q, prev)
                float(s[-1])
                ms = (time.time() - t0) / STEPS * 1e3
                print(json.dumps({"T": T, "B": B, "impl": impl,
                                  "fwd_bwd_ms": round(ms, 2)}), flush=True)
            except Exception as e:  # OOM at the big shapes is data too
                print(json.dumps({"T": T, "B": B, "impl": impl,
                                  "error": type(e).__name__,
                                  "msg": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
