"""Pallas depthwise 3x3 conv (stride 1, SAME) with fused backward.

The 42 stride-1 depthwise convs in EffNetV2-M's MBConv stages 3-6
(models/effnetv2.py, mirroring timm tf_efficientnetv2_m — reference
image_encoding.py:26) are VPU work XLA lowers through conv custom-calls
that anchor batch-minor layouts on their operands (DESIGN.md §7). This
kernel is the "layout lever" probe: the same math on natural
(row, position, channel) tiles, measured IN-STEP via tools/perf.py
(per-op conv micro-benches are unreliable through the tunnel — CLAUDE.md).

VERDICT (round 3, settled negative — effnetv2.DW_PALLAS stays False):
in-step flagship A/B at B=128 bf16: 191.1 ms/step (pallas) vs 144.1 (XLA),
47 ms worse despite correct math (gx/gw parity on all four stage shapes,
tools/dw_check.py). Root cause: the hot CNN maps are S(1) VMEM-resident in
the XLA step (DESIGN.md §7), and a pallas_call is an opaque custom-call —
its operands/results must round-trip HBM, adding ~x/dy/dx/y traffic of
tens of MB per site x 42 sites. The depthwise ALU work was never the cost;
the residency it breaks was. Any winning kernel here must fuse the whole
MBConv chain (= reimplementing the conv stack), already rejected in the
conv+BN probe (tools/convbn_probe.py).

Layout: x (B, H, W, C) is flattened to (B, P=H*W, C) so channels ride the
128-lane axis and positions the sublane axis. Each program owns RB batch
rows and the full (P, C) plane; the 9 taps are cyclic sublane rolls of the
plane with boundary masks (the flattened roll wraps across image rows;
row/col masks zero the wrapped lanes), multiplied by the per-channel tap
weight and accumulated in fp32.

Backward shares the tap rolls of dy between the two gradients:
  dx[p]      = sum_o dy[p - o] * k_o          (conv with the flipped taps)
  dW[o, c]   = sum_{b,p} x[p, c] * dy[p - o, c]
so one masked roll of dy per tap feeds both the dx FMA and the dW
reduce. dW partials accumulate in fp32 across the sequential batch grid
into a single (9, C) output block (grid-invariant index map).

RB (batch rows per program) is chosen per shape to keep the working set
under ~10 MB of VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1))


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _row_block(B: int, P: int, C: int, n_bufs: int) -> int:
    """Largest power-of-two batch rows per program with the fp32 working
    set (n_bufs full planes) under ~10 MB."""
    # Mosaic's scoped-VMEM stack limit is 16 MB and the concat/cast
    # temporaries roughly double the accounted planes: a 10 MB budget
    # OOM'd at 16.6 MB on the (196, 1056) stage-4 shape.
    budget = 6 * 1024 * 1024
    per_row = P * C * 4 * n_bufs
    rb = 8
    while rb > 1 and (B % rb or rb * per_row > budget):
        rb //= 2
    return rb


def _masks(H: int, W: int):
    P = H * W
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) // W
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % W
    return rows, cols


def _masked_roll(a, di: int, dj: int, rows, cols, H: int, W: int):
    """out[p] = a[p + di*W + dj] where (row+di, col+dj) is in-bounds, else 0.

    a: (RB, P, C); the roll is cyclic along the sublane (P) axis and the
    mask kills both the image border taps and the cross-row wraps of the
    flattened layout."""
    o = di * W + dj
    P = a.shape[1]
    if o:
        # static-shift cyclic roll as slice+concat: Mosaic's tpu.dynamic_
        # rotate only handles 32-bit element types, and these shifts are
        # compile-time constants anyway.
        s = o % P  # concat([a[s:], a[:s]])[i] == a[(i + s) % P]
        r = jnp.concatenate([a[:, s:], a[:, :s]], axis=1)
    else:
        r = a
    valid = (
        (rows + di >= 0) & (rows + di < H)
        & (cols + dj >= 0) & (cols + dj < W)
    )
    return jnp.where(valid[None], r, jnp.zeros_like(r))


def _fwd_kernel(x_ref, w_ref, y_ref, *, H: int, W: int):
    rows, cols = _masks(H, W)
    x = x_ref[:]
    acc = x.astype(jnp.float32) * w_ref[4].astype(jnp.float32)  # (0,0) tap
    for t, (di, dj) in enumerate(_TAPS):
        if (di, dj) == (0, 0):
            continue
        xs = _masked_roll(x, di, dj, rows, cols, H, W)
        acc = acc + xs.astype(jnp.float32) * w_ref[t].astype(jnp.float32)
    y_ref[:] = acc.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref, *, H: int, W: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    rows, cols = _masks(H, W)
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:]
    acc = None
    taps = []  # per-tap (1, C) partial sums; stacked below (no scatter —
    # Mosaic has no scatter-add lowering)
    for t, (di, dj) in enumerate(_TAPS):
        ds = _masked_roll(dy, -di, -dj, rows, cols, H, W).astype(jnp.float32)
        term = ds * w_ref[t].astype(jnp.float32)
        acc = term if acc is None else acc + term
        taps.append(
            jnp.sum(x * ds, axis=(0, 1), keepdims=True).reshape(1, -1)
        )
    dx_ref[:] = acc.astype(dx_ref.dtype)
    dw_ref[:] = dw_ref[:] + jnp.concatenate(taps, axis=0)


def _fwd_call(x, w):
    B, H, W, C = x.shape
    P = H * W
    xt = x.reshape(B, P, C)
    rb = _row_block(B, P, C, n_bufs=3)
    kernel = functools.partial(_fwd_kernel, H=H, W=W)
    y = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, P, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), x.dtype),
        interpret=_interpret(),
    )(xt, w.reshape(9, C))
    return y.reshape(B, H, W, C)


def _bwd_call(x, w, dy):
    B, H, W, C = x.shape
    P = H * W
    rb = _row_block(B, P, C, n_bufs=5)
    kernel = functools.partial(_bwd_kernel, H=H, W=W)
    dx, dw = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, P, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P, C), x.dtype),
            jax.ShapeDtypeStruct((9, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(x.reshape(B, P, C), dy.reshape(B, P, C), w.reshape(9, C))
    return dx.reshape(B, H, W, C), dw.reshape(3, 3, C)


@jax.custom_vjp
def depthwise3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise 3x3 conv, stride 1, SAME. x: (B, H, W, C); w: (3, 3, C).

    fp32 accumulation, output in x.dtype — matching
    lax.conv_general_dilated(feature_group_count=C) numerics on TPU."""
    return _fwd_call(x, w)


def _vjp_fwd(x, w):
    return _fwd_call(x, w), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    dx, dw = _bwd_call(x, w, g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


depthwise3x3.defvjp(_vjp_fwd, _vjp_bwd)


def depthwise3x3_reference(x, w):
    """XLA path (lax conv custom-call) for tests/fallback."""
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, -1), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
