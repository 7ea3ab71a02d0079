"""Fused 1x1-conv (matmul) + BatchNorm-statistics Pallas kernel.

VERDICT r2 #1 ("pull the pass-count lever"): in the EffNetV2 trunk every
MBConv pointwise conv (pw_exp / pw_proj, effnetv2.py) is followed by a
BatchNorm whose TRAINING-mode batch statistics force XLA into a separate
full read of the conv output map (the `convert_reduce` fwd fusions — 16.4
ms/step of pure map re-reads in the round-3 trace; the conv custom-call
itself cannot host a reduce epilogue). This kernel computes

    y = x @ W        (the 1x1 conv, MXU, f32 accumulate)
    s1 = sum_n y     (per output channel, f32)
    s2 = sum_n y^2

in ONE pass: the stat partials accumulate in VMEM scratch while the y tiles
stream out, eliminating the stat read entirely. mean/var derive outside as
s1/N and s2/N - mean^2 (flax _compute_stats formula, batch-sum order
differs — documented fp deviation, bounded by tests).

The BACKWARD is deliberately NOT a Pallas kernel: the bwd BN-stat sums are
already multi-output-fused with the dx producers by XLA (trace: 3x f32[C]
sums + the dx map in one fusion), so a custom bwd could only tie. The
custom_vjp below re-states the conv+stat backward in plain jnp and lets XLA
fuse it exactly as it does today; only the forward changes.

Replaces the stat pass of: flax BatchNorm stats over nn.Conv 1x1 outputs
(reference: timm BN inside tf_efficientnetv2_m blocks, image_encoding.py:26).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


# Rows (positions) per program. 512 f32 rows x Cout<=1824 lanes of y-tile
# stays ~3.7 MB VMEM incl. double buffering.
TILE_N = 512


def _fwd_kernel(x_ref, w_ref, y_ref, s_ref, acc_ref, *, n_tiles: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[:] = y.astype(y_ref.dtype)
    # stat partials ride along in VMEM — the pass-count saving. Padded rows
    # hold x=0 => y=0 => contribute 0 to both sums: no masking needed.
    acc_ref[0, :] = acc_ref[0, :] + jnp.sum(y, axis=0)
    acc_ref[1, :] = acc_ref[1, :] + jnp.sum(y * y, axis=0)

    @pl.when(t == n_tiles - 1)
    def _():
        s_ref[:] = acc_ref[:]


def _fwd_call(x: jax.Array, w: jax.Array):
    N, K = x.shape
    C = w.shape[1]
    n_tiles = -(-N // TILE_N)
    pad = n_tiles * TILE_N - N
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    kernel = functools.partial(_fwd_kernel, n_tiles=n_tiles)
    y, s = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, K), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, C), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE_N, C), x.dtype),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=_interpret(),
    )(xp, w)
    return y[:N], s


@jax.custom_vjp
def conv1x1_stats(x: jax.Array, w: jax.Array):
    """x: (N, K) flattened NHWC map; w: (K, C) 1x1-conv kernel.

    Returns (y, stats): y = x @ w in x.dtype, stats = f32 (2, C) holding
    [sum_n y, sum_n y^2] computed in the same pass over the map.
    """
    return _fwd_call(x, w)


def _ref_stats(y):
    yf = y.astype(jnp.float32)
    return jnp.stack([jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)])


def conv1x1_stats_reference(x, w):
    """XLA reference path (separate stat pass) for tests/CPU."""
    y = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y, _ref_stats(y)


def _vjp_fwd(x, w):
    y, s = _fwd_call(x, w)
    return (y, s), (x, w, y)


def _vjp_bwd(res, cts):
    x, w, y = res
    dy, ds = cts
    # stats cotangent: d(s1)/dy = 1, d(s2)/dy = 2y — flax stops gradients
    # through running stats so ds is normally zero, but the true VJP is kept
    # for correctness (plain jnp: XLA fuses it like today's graph)
    dy = dy.astype(jnp.float32)
    dy = dy + ds[0][None, :] + 2.0 * y.astype(jnp.float32) * ds[1][None, :]
    dx = jax.lax.dot_general(
        dy, w.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x.astype(jnp.float32), dy,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


conv1x1_stats.defvjp(_vjp_fwd, _vjp_bwd)
