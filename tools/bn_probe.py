"""Probe: can Pallas beat XLA's BN-backward reduce fusion at stage-1 shape?
XLA in-step: ~0.95 ms for (128,56,56,48) -> (s1, s2) + a bf16 map output.
"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 128, 56, 56, 48
N = B * H * W

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
dy = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
mean = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
inv = jnp.asarray(1.0 + rng.random((C,)), jnp.float32)

def xla_sums(x, dy, mean, inv):
    xhat = (x.astype(jnp.float32) - mean) * inv
    d = dy.astype(jnp.float32)
    return jnp.sum(d, axis=(0,1,2)), jnp.sum(d * xhat, axis=(0,1,2))

def scan_time(fn, args, iters=50):
    @jax.jit
    def run(args):
        def body(c, _):
            outs = fn(*args)
            s = sum(jnp.sum(o) for o in outs)
            return c + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return acc
    r = run(args); float(r)
    t0 = time.time(); r = run(args); float(r)
    return (time.time() - t0) / iters * 1e3

ms = scan_time(xla_sums, (x, dy, mean, inv))
traffic_gb = (2 * B*H*W*C * 2) / 1e9
print(f"XLA sums: {ms:.3f} ms  ({traffic_gb/ms*1e3:.0f} GB/s)")

# -- Pallas: channel-sublane, batch-lane layout mirror; grid over (H*W) tiles
# reshape to (B, HW, C) -> transpose to (HW, C, B)? Reads must be contiguous.
# Simplest competitive layout: flatten to (N, C) with N in tiles of 1024 rows;
# lanes = C(48 padded to 128)?? That wastes lanes. Use (C, N) channel-major.
xt = jnp.reshape(x, (N, C)).T  # (C, N) - relayout OUTSIDE the timed region
dyt = jnp.reshape(dy, (N, C)).T

TILE = 8192
def _kern(x_ref, dy_ref, mean_ref, inv_ref, s1_ref, s2_ref, acc_ref, *, n_tiles):
    t = pl.program_id(0)
    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    d = dy_ref[:].astype(jnp.float32)          # (C, TILE)
    xh = (x_ref[:].astype(jnp.float32) - mean_ref[:]) * inv_ref[:]
    p1 = d
    p2 = d * xh
    def fold(a):
        out = a[:, 0:128]
        for i in range(1, a.shape[1]//128):
            out = out + a[:, i*128:(i+1)*128]
        return out
    acc_ref[0:C, :] = acc_ref[0:C, :] + fold(p1)
    acc_ref[C:2*C, :] = acc_ref[C:2*C, :] + fold(p2)
    @pl.when(t == n_tiles - 1)
    def _():
        s1_ref[:] = jnp.sum(acc_ref[0:C, :], axis=1)[None]
        s2_ref[:] = jnp.sum(acc_ref[C:2*C, :], axis=1)[None]

def pallas_sums(xt, dyt, mean, inv):
    n_tiles = N // TILE
    kern = functools.partial(_kern, n_tiles=n_tiles)
    s1, s2 = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((C, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, C), lambda t: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2*C, 128), jnp.float32)],
    )(xt, dyt, mean.reshape(C,1), inv.reshape(C,1))
    return s1[0], s2[0]

# correctness
s1x, s2x = jax.jit(xla_sums)(x, dy, mean, inv)
s1p, s2p = jax.jit(pallas_sums)(xt, dyt, mean, inv)
np.testing.assert_allclose(np.asarray(s1x), np.asarray(s1p), rtol=2e-2)
np.testing.assert_allclose(np.asarray(s2x), np.asarray(s2p), rtol=2e-2)
print("pallas correct")
ms_p = scan_time(pallas_sums, (xt, dyt, mean, inv))
print(f"Pallas sums (channel-major pre-transposed): {ms_p:.3f} ms  ({traffic_gb/ms_p*1e3:.0f} GB/s)")
