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

# bf16 fast path: SERF's gate g(z) = erf(softplus(z)) has a logit that is
# asymptotically linear on the left and polynomial on the right, so
# g(z) ~= sigmoid(p5(z)) with a degree-5 odd-headed polynomial fits it to
# max |z*sigmoid(p5) - serf(z)| = 1.1e-3 over ALL reals (the sigmoid form
# reproduces the exact e^z left-tail decay and the ->1 right tail). That
# error is ~7x below bf16's quantization at unit scale (ulp(1) = 2^-7), so
# in the bf16 compute path the approximation is numerically invisible while
# costing ~14 VPU ops/element instead of ~35 (exp + log1p + erf). Profiled
# on v5e: the stage-0 token-head GAP fusion is pure serf VPU time, 10.6 ms
# of a 166 ms train step, before this.
FAST_SERF_BF16 = True
_SERF_P5 = (
    4.743144768698157e-04,
    9.427917061937980e-03,
    7.255023041520858e-02,
    2.832661920672991e-01,
    1.605305418315285e+00,
    7.293287033146151e-01,
)


def _serf_fast(x: jax.Array) -> jax.Array:
    z = x.astype(jnp.float32)
    q = jnp.asarray(_SERF_P5[0], jnp.float32)
    for c in _SERF_P5[1:]:
        q = q * z + c
    return (z * jax.nn.sigmoid(q)).astype(x.dtype)


def serf(x: jax.Array, thresh: float = SERF_CLAMP) -> jax.Array:
    """SERF activation, numerically matching models/serf.py:23-24.

    ``x * erf(log1p(exp(min(x, thresh))))``. The clamp guards ``exp``
    overflow; for x >= ~20, erf(log1p(e^x)) == 1 in fp32 anyway.

    bf16 inputs take the sigmoid-gate approximation (see FAST_SERF_BF16):
    sub-bf16-ulp accurate, ~2.5x fewer VPU ops — f32 callers (golden parity
    tests, loss-critical paths) always get the exact form.
    """
    if FAST_SERF_BF16 and x.dtype == jnp.bfloat16:
        return _serf_fast(x)
    y = jnp.log1p(jnp.exp(jnp.minimum(x, jnp.asarray(thresh, x.dtype))))
    return x * jax.lax.erf(y)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU as used by the reference FFN (transformer.py:7-8)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype))))
