"""One-shot TPU correctness check of ops/pallas_depthwise at a real
MBConv shape (fwd + vjp vs the XLA conv path). Usage:

  python tools/dw_check.py B H W C
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mmvqa_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from mmvqa_tpu.ops.pallas_depthwise import (
        depthwise3x3,
        depthwise3x3_reference,
    )

    B, H, W, C = (int(a) for a in sys.argv[1:5])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C)).astype(np.float32) * 0.2,
                    jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                    jnp.bfloat16)

    def vg(f):
        def loss(x, w):
            return jnp.sum(f(x, w).astype(jnp.float32)
                           * g.astype(jnp.float32))
        return jax.jit(lambda x, w: jax.value_and_grad(
            loss, argnums=(0, 1))(x, w))

    lp, (gxp, gwp) = vg(depthwise3x3)(x, w)
    print("pallas compiled+ran", flush=True)
    lr, (gxr, gwr) = vg(depthwise3x3_reference)(x, w)
    gxe = float(jnp.max(jnp.abs(gxp.astype(jnp.float32)
                                - gxr.astype(jnp.float32))))
    gwe = float(jnp.max(jnp.abs(gwp.astype(jnp.float32)
                                - gwr.astype(jnp.float32)))
                / jnp.max(jnp.abs(gwr.astype(jnp.float32))))
    print(f"shape={(B, H, W, C)} loss {float(lp):.4f} vs {float(lr):.4f} "
          f"gx_maxerr {gxe:.5f} gw_relerr {gwe:.5f}", flush=True)
    assert abs(float(lp) - float(lr)) < 1e-2 * max(1.0, abs(float(lr)))
    assert gxe < 0.1 and gwe < 0.02
    print("OK", flush=True)


if __name__ == "__main__":
    main()
