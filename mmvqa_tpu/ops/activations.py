"""Activation functions.

SERF — ``x * erf(log1p(exp(x)))`` — is the activation used throughout the
reference model (models/serf.py:23-24, with an overflow clamp at +50).
It is a pure VPU elementwise op; XLA fuses it into the surrounding matmul
epilogues, so no Pallas kernel is needed for it in isolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SERF_CLAMP = 50.0


def serf(x: jax.Array, thresh: float = SERF_CLAMP) -> jax.Array:
    """SERF activation, numerically matching models/serf.py:23-24.

    ``x * erf(log1p(exp(min(x, thresh))))``. The clamp guards ``exp``
    overflow; for x >= ~20, erf(log1p(e^x)) == 1 in fp32 anyway.
    """
    y = jnp.log1p(jnp.exp(jnp.minimum(x, jnp.asarray(thresh, x.dtype))))
    return x * jax.lax.erf(y)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU as used by the reference FFN (transformer.py:7-8)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype))))
