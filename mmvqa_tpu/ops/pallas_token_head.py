"""Fused visual-token head kernel: GAP(act(conv1x1(x))) without the
full-resolution intermediate.

The reference's Transfer modules project each CNN stage to hidden_size with
a 1x1 conv, apply SERF/ReLU, then global-average-pool
(image_encoding.py:100-115). At stage 0 that materializes a
(B, 112, 112, 768) tensor — 2.5 GB bf16 at B=128 — only to reduce it to
(B, 768): profiled at ~30 ms/step of HBM traffic across stages on v5e.

Kernel design: inputs are fed CHANNEL-MAJOR (B, K, P) so the position axis
rides the 128-lane dimension (K is as small as 24; a (P, K) layout pads
every lane tile 5x). Each program computes s = W^T x_tile on the MXU (fp32),
applies the activation on the VPU, and accumulates lane-wise partial sums in
a VMEM scratch written back once per batch row. The custom VJP recomputes
the projection per tile (dW, dx) instead of saving it.

erf inside kernels uses the Abramowitz & Stegun 7.1.26 rational
approximation (max abs err 1.5e-7 — fp32-noise level) since Mosaic has no
erf primitive.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _erf_approx(x):
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act(name: str, x, erf_fn=None):
    erf_fn = erf_fn or jax.lax.erf
    if name == "serf":
        y = jnp.log1p(jnp.exp(jnp.minimum(x, 50.0)))
        return x * erf_fn(y)
    return jnp.maximum(x, 0.0)  # relu


def _act_grad(name: str, x, erf_fn=None):
    erf_fn = erf_fn or jax.lax.erf
    if name == "serf":
        y = jnp.log1p(jnp.exp(jnp.minimum(x, 50.0)))
        erf_y = erf_fn(y)
        dy = jax.nn.sigmoid(x)
        return erf_y + x * (2.0 / math.sqrt(math.pi)) * jnp.exp(-y * y) * dy
    return (x > 0).astype(x.dtype)


TILE_P = 2048


def _pos_mask(t, shape, n_pos: int):
    pos = t * TILE_P + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return pos < n_pos


def _fwd_kernel(x_ref, w_ref, out_ref, acc_ref, *, act: str, n_pos: int,
                n_tiles: int):
    # blocks: x (1, K, TILE_P); w (K, C); out (1, 1, C); acc (C, 128) scratch
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(  # (C, TILE_P) = (K, C)^T (K, TILE_P)
        w_ref[:], x_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = jnp.where(_pos_mask(t, s.shape, n_pos), _act(act, s, _erf_approx), 0.0)
    C = a.shape[0]
    acc_ref[:] = acc_ref[:] + jnp.sum(
        a.reshape(C, TILE_P // 128, 128), axis=1
    )

    @pl.when(t == n_tiles - 1)
    def _():
        total = jnp.sum(acc_ref[:], axis=1) / n_pos  # (C,)
        out_ref[0] = total[None, :].astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, *, act: str,
                n_pos: int, n_tiles: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    s = jax.lax.dot_general(  # (C, TILE_P)
        w_ref[:], x_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g_col = jnp.transpose(g_ref[0]) / n_pos  # (C, 1)
    gact = _act_grad(act, s, _erf_approx) * g_col
    gact = jnp.where(_pos_mask(t, s.shape, n_pos), gact, 0.0)
    # dx (K, TILE_P) = W (K, C) @ gact (C, TILE_P)
    dx_ref[0] = jax.lax.dot_general(
        w_ref[:].astype(jnp.float32), gact,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    # dW (K, C) += x (K, TILE_P) @ gact^T (TILE_P, C)
    dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
        x_ref[0], gact,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_positions_t(xt):
    B, K, P = xt.shape
    n_tiles = -(-P // TILE_P)
    pad = n_tiles * TILE_P - P
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad)))
    return xt, n_tiles, P


def _fwd_call(x, w, act: str):
    B, P, K = x.shape
    C = w.shape[1]
    xt, n_tiles, n_pos = _pad_positions_t(jnp.swapaxes(x, 1, 2))
    kernel = functools.partial(
        _fwd_kernel, act=act, n_pos=n_pos, n_tiles=n_tiles
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, K, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((C, 128), jnp.float32)],
        interpret=_interpret(),
    )(xt, w)
    return out[:, 0]


def _bwd_call(x, w, g, act: str):
    B, P, K = x.shape
    C = w.shape[1]
    xt, n_tiles, n_pos = _pad_positions_t(jnp.swapaxes(x, 1, 2))
    kernel = functools.partial(
        _bwd_kernel, act=act, n_pos=n_pos, n_tiles=n_tiles
    )
    dxt, dw = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, K, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, x.dtype),
            jax.ShapeDtypeStruct((K, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(xt, w, g.reshape(B, 1, C))
    return jnp.swapaxes(dxt[:, :, :P], 1, 2), dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_token_head(x: jax.Array, w: jax.Array, act: str = "serf"):
    """x: (B, P, K) flattened feature map; w: (K, C). Returns
    mean_p(act(x @ w)): (B, C)."""
    return _fwd_call(x, w, act)


def _vjp_fwd(x, w, act):
    return _fwd_call(x, w, act), (x, w)


def _vjp_bwd(act, res, g):
    x, w = res
    dx, dw = _bwd_call(x, w, g.astype(jnp.float32), act)
    return dx, dw.astype(w.dtype)


fused_token_head.defvjp(_vjp_fwd, _vjp_bwd)


def token_head_reference(x, w, act: str = "serf"):
    """XLA reference path (materializes (B, P, C)) for tests/fallback."""
    s = jnp.einsum("bpk,kc->bpc", x, w).astype(jnp.float32)
    a = _act(act, s)
    return jnp.mean(a, axis=1).astype(x.dtype)
