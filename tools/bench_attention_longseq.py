"""Long-sequence attention bench: pallas vs xla realformer cores.

The Pallas attention kernel (ops/pallas_attention.py) was demoted at the
reference's T=75 (12.2 vs 7.8 ms in-step, DESIGN.md §3) with the claim
that its fused form "pays off only at long sequence". This measures that
claim on the real chip: two CHAINED attention layers (layer 0 produces
the residual-score carry layer 1 consumes — the carry layout is
impl-private, so chaining is the only layout-correct way to bench both
impls), fwd+bwd under lax.scan, B scaled down with T to keep the
(B, H, T, T) score tensors in HBM.

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
                    help="0 = auto (keep B*H*T*T bf16 ~ 0.25 GB)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.ops.attention import realformer_attention

    for T in args.seqs:
        B = args.batch or max(1, (1 << 28) // (T * T * H * 2))
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, T, H, E)), jnp.bfloat16)
            for _ in range(3)
        )
        mask = jnp.asarray((rng.random((B, T)) < 0.95).astype(np.float32))

        for impl in ("xla", "pallas"):
            def step(qc, _):
                def loss(qc):
                    ctx0, sc = realformer_attention(
                        qc, k, v, None, mask, impl=impl)
                    ctx1, _ = realformer_attention(
                        ctx0, k, v, sc, mask, impl=impl)
                    return jnp.sum(ctx1.astype(jnp.float32))

                dq = jax.grad(loss)(qc)
                return qc + 1e-6 * dq, jnp.sum(dq.astype(jnp.float32))

            @jax.jit
            def run(q):
                qf, s = jax.lax.scan(step, q, None, length=STEPS)
                return s

            try:
                s = run(q)
                float(s[-1])
                t0 = time.time()
                s = run(q)
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
