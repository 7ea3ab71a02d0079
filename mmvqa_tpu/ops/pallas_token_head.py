"""Fused visual-token head kernel: GAP(act(conv1x1(x))) without the
full-resolution intermediate.

The reference's Transfer modules project each CNN stage to hidden_size with
a 1x1 conv, apply SERF/ReLU, then global-average-pool
(image_encoding.py:100-115). At stage 0 that materializes a
(B, 112, 112, 768) tensor — 2.5 GB bf16 at B=128 — whose fwd fusion, serf
backward and dW/dx consumers profile at ~32 ms/step on v5e.

Kernel design: inputs are fed CHANNEL-MAJOR (B, K, P) so the position axis
rides the 128-lane dimension (K is as small as 24; a (P, K) layout pads
every lane tile 5x). Each program handles ROW_BLOCK batch rows x one
position tile: s = W^T x on the MXU (fp32), activation on the VPU, and
lane-wise partial sums accumulated in VMEM scratch written back once per
row block. The custom VJP recomputes the projection per tile (dW, dx)
instead of saving it.

Measured kernel rules (v5e, B=128 stage-0 112x112x24):
* NO position masking anywhere: position padding is zero-filled, and
  serf(0) = relu(0) = 0 kills padded GAP/dW contributions exactly (dx at
  padded columns is garbage and sliced off on return);
* the partial-sum reduce is STATIC strided lane-slice adds — a
  reshape(C, P//128, 128) + sum(axis=1) forces a cross-lane relayout;
* the upstream grad enters pre-shaped (B, C, 1): transposing (1, C) to
  (C, 1) inside the kernel is a sublane<->lane relayout per program;
* ROW_BLOCK=4 batch rows per program amortize per-program overhead
  (896 -> 224 programs at stage 0).

erf inside kernels uses the Abramowitz & Stegun 7.1.26 rational
approximation (max abs err 1.5e-7 — fp32-noise level) since Mosaic has no
erf primitive; the bf16 path uses the FAST_SERF_BF16 sigmoid-gate
polynomial ('serf_fast') matching ops.activations.
"""

from __future__ import annotations

import functools
import math

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


def _p5(x):
    from mmvqa_tpu.ops.activations import _SERF_P5

    q = jnp.asarray(_SERF_P5[0], jnp.float32)
    for c in _SERF_P5[1:]:
        q = q * x + c
    return q


def _p5_prime(x):
    from mmvqa_tpu.ops.activations import _SERF_P5

    n = len(_SERF_P5) - 1  # degree
    d = jnp.asarray(n * _SERF_P5[0], jnp.float32)
    for i, c in enumerate(_SERF_P5[1:-1], start=1):
        d = d * x + (n - i) * c
    return d


def _act(name: str, x, erf_fn=None):
    erf_fn = erf_fn or jax.lax.erf
    if name == "serf":
        y = jnp.log1p(jnp.exp(jnp.minimum(x, 50.0)))
        return x * erf_fn(y)
    if name == "serf_fast":
        # sigmoid-gate polynomial (ops.activations.FAST_SERF_BF16): matches
        # the bf16 conv-path numerics, ~2.5x fewer VPU ops than exact serf
        return x * jax.nn.sigmoid(_p5(x))
    return jnp.maximum(x, 0.0)  # relu


def _act_grad(name: str, x, erf_fn=None):
    erf_fn = erf_fn or jax.lax.erf
    if name == "serf":
        y = jnp.log1p(jnp.exp(jnp.minimum(x, 50.0)))
        erf_y = erf_fn(y)
        dy = jax.nn.sigmoid(x)
        return erf_y + x * (2.0 / math.sqrt(math.pi)) * jnp.exp(-y * y) * dy
    if name == "serf_fast":
        s = jax.nn.sigmoid(_p5(x))
        return s + x * s * (1.0 - s) * _p5_prime(x)
    return (x > 0).astype(x.dtype)


TILE_P = 2048  # max lane-tile width; see _pick_tile
ROW_BLOCK = 4
# Dtype fed to the dx/dW grad matmuls: "input" casts gact to the input
# dtype (bf16 in the flagship — v5e MXU runs f32 contractions at a
# fraction of the bf16 rate; measured stage-0 micro 13.6 -> 11.2 ms),
# "f32" keeps the old full-precision operands (A/B knob, tools/perf.py).
GACT_MM = "input"


@functools.lru_cache(maxsize=None)
def _pick_tile(P: int, itemsize: int = 2) -> int:
    """Position-tile width: the multiple of 128 (lane tile) minimizing total
    padded positions, preferring wider tiles on ties (fewer programs), capped
    at TILE_P (the (C, tile) f32 intermediate must stay ~<=6 MB of VMEM).

    Stage 0 (112*112 = 12544 = 7 * 1792) tiles EXACTLY at 1792 where the old
    fixed 2048 padded every pass by 14% (7 tiles * 2048 = 14336) — measured
    as pure waste since padding multiplies into all three MXU passes and the
    activation VPU work.

    f32 inputs (mixed_precision off) halve the cap: at tile 1792 the fwd
    program's scoped stack measures 20.9 MB > the 16 MB limit (Mosaic
    compile error, caught by a real-chip f32 CLI smoke); stage 0 still
    tiles exactly at 896 (12544 = 14 * 896)."""
    cap = TILE_P if itemsize <= 2 else TILE_P // 2
    best = cap
    best_pad = (-(-P // cap)) * cap - P
    for t in range(128, cap + 1, 128):
        pad = (-(-P // t)) * t - P
        if pad < best_pad or (pad == best_pad and t > best):
            best, best_pad = t, pad
    return best


def _lane_fold(a):
    """(C, TILE_P) -> (C, 128) by summing static lane slices (no relayout)."""
    parts = a[:, 0:128]
    for i in range(1, a.shape[1] // 128):
        parts = parts + a[:, i * 128:(i + 1) * 128]
    return parts


def _fwd_kernel(x_ref, w_ref, out_ref, acc_ref, *, act: str, n_pos: int,
                n_tiles: int, rb: int):
    # blocks: x (rb, K, TILE_P); w (K, C); out (1, rb, C); acc (rb*C, 128)
    t = pl.program_id(1)
    C = w_ref.shape[1]

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for r in range(rb):
        s = jax.lax.dot_general(  # (C, TILE_P) = (K, C)^T (K, TILE_P)
            w_ref[:], x_ref[r],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # padded positions hold x=0 => s=0 => act(s)=0: no mask needed
        a = _act(act, s, _erf_approx)
        acc_ref[r * C:(r + 1) * C, :] = (
            acc_ref[r * C:(r + 1) * C, :] + _lane_fold(a)
        )

    @pl.when(t == n_tiles - 1)
    def _():
        total = jnp.sum(
            acc_ref[:].reshape(rb, C, 128), axis=2
        ) / n_pos  # (rb, C)
        out_ref[0] = total.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, *, act: str,
                n_pos: int, n_tiles: int, rb: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw = dw_ref[:]
    for r in range(rb):
        s = jax.lax.dot_general(  # (C, TILE_P)
            w_ref[:], x_ref[r],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # g arrives pre-shaped (C, 1): broadcasts along lanes sublane-wise
        gact = _act_grad(act, s, _erf_approx) * (g_ref[r] / n_pos)
        # Feed the grad matmuls in the INPUT dtype: on v5e the MXU runs
        # f32 contractions at ~1/4 the bf16 rate, and the old f32 gact /
        # f32-cast W made dx+dW the two slowest ops in the step (bf16
        # rounding of gact is the same precision the XLA conv path's bf16
        # grads carry; accumulation stays f32).
        gact_mm = gact.astype(x_ref.dtype) if GACT_MM == "input" else gact
        # dx (K, TILE_P) = W (K, C) @ gact (C, TILE_P); padded columns give
        # garbage that the caller slices off
        w_dx = w_ref[:] if GACT_MM == "input" else w_ref[:].astype(jnp.float32)
        dx_ref[r] = jax.lax.dot_general(
            w_dx, gact_mm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)
        # dW (K, C) += x (K, TILE_P) @ gact^T; padded columns have x=0
        dw = dw + jax.lax.dot_general(
            x_ref[r], gact_mm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dw_ref[:] = dw


def _row_block(B: int) -> int:
    rb = ROW_BLOCK
    while B % rb:
        rb //= 2
    return max(rb, 1)


def _pad_positions_t(xt):
    B, K, P = xt.shape
    tile = _pick_tile(P, xt.dtype.itemsize)
    n_tiles = -(-P // tile)
    pad = n_tiles * tile - P
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad)))
    return xt, tile, n_tiles, P


def _fwd_call(x, w, act: str):
    B, P, K = x.shape
    C = w.shape[1]
    rb = _row_block(B)
    xt, tile, n_tiles, n_pos = _pad_positions_t(jnp.swapaxes(x, 1, 2))
    kernel = functools.partial(
        _fwd_kernel, act=act, n_pos=n_pos, n_tiles=n_tiles, rb=rb
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // rb, n_tiles),
        in_specs=[
            pl.BlockSpec((rb, K, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // rb, rb, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((rb * C, 128), jnp.float32)],
        interpret=_interpret(),
    )(xt, w)
    return out.reshape(B, C)


def _bwd_call(x, w, g, act: str):
    B, P, K = x.shape
    C = w.shape[1]
    rb = _row_block(B)
    xt, tile, n_tiles, n_pos = _pad_positions_t(jnp.swapaxes(x, 1, 2))
    kernel = functools.partial(
        _bwd_kernel, act=act, n_pos=n_pos, n_tiles=n_tiles, rb=rb
    )
    dxt, dw = pl.pallas_call(
        kernel,
        grid=(B // rb, n_tiles),
        in_specs=[
            pl.BlockSpec((rb, K, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, K, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, x.dtype),
            jax.ShapeDtypeStruct((K, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(xt, w, g.reshape(B, C, 1))
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


def fused_token_head_sharded(x: jax.Array, w: jax.Array, act: str, mesh):
    """Multi-device form: partition the kernel batch-wise over 'data' and
    output-channel-wise over 'model' with shard_map, so scale-out keeps
    the fused kernel instead of falling back to the conv form. Each shard
    runs the identical single-device program on its (B/dp, P, K) x
    (K, C/tp) block — GAP and the custom VJP are per-batch/per-channel
    local, and shard_map's transpose inserts the dW psum over 'data'
    (w is replicated there). Requires B % dp == 0 and C % tp == 0
    (checked by the 'auto' router)."""
    from jax.sharding import PartitionSpec as P

    from mmvqa_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

    return jax.shard_map(
        lambda xs, ws: fused_token_head(xs, ws, act),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(None, MODEL_AXIS)),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,
    )(x, w)


def token_head_reference(x, w, act: str = "serf"):
    """XLA reference path (materializes (B, P, C)) for tests/fallback."""
    s = jnp.einsum("bpk,kc->bpc", x, w).astype(jnp.float32)
    a = _act(act, s)
    return jnp.mean(a, axis=1).astype(x.dtype)
