"""VMEM-resident tiled warp kernel — gather-free trilinear/nearest warps
for volumes that fit on-chip.

Companion to ops/pallas_warp.py (same math: per-tile corners + separable
hat/indicator weights + MXU z-contraction). This variant sidesteps the
relay's broken sliced-DMA path (make_async_copy of a `.at[...]`-sliced ref
and Element-indexed blocks both crash the Mosaic backend here, measured
2026-08-16) by holding the ENTIRE source volume in VMEM as a regular
pipeline input and reading each tile's patch with the three ops the
backend does support:

  - dynamic leading-dim ref slice  (x corner)
  - dynamic sublane-dim ref slice  (y corner)
  - dynamic lane roll + static slice (z corner, pltpu.roll)

Fits v5e VMEM (~16 MB) for fp32 volumes <= ~144^3 and bf16 <= ~176^3 per
channel; callers route larger volumes to the XLA gather path
(ops/interp.py) or chunk channels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_warp import _block, _unblock

__all__ = ["warp_resident", "resident_vmem_bytes"]


def resident_vmem_bytes(shape, dtype_bytes=4):
    d, h, w = shape[:3]
    return d * h * w * dtype_bytes


def _kernel(corner_ref, dflt_ref, ii_ref, jj_ref, kk_ref, vol_ref,
            out_ref, of_ref, *, dims, trim, N, mode, cdt):
    D, H, W = dims
    PA, PB, PC = trim
    f32 = jnp.float32

    cx = corner_ref[0, 0, 0]
    cy = corner_ref[0, 0, 1]
    cz = corner_ref[0, 0, 2]

    ii = ii_ref[0]
    jj = jj_ref[0]
    kk = kk_ref[0]

    ok = (ii > 0.0) & (jj > 0.0) & (kk > 0.0) & \
         (ii <= D - 1.0) & (jj <= H - 1.0) & (kk <= W - 1.0)

    def local(v, hi, c, P):
        vc = jnp.clip(v, 0.0, hi - 1.0)
        if mode == "nearest":
            # round in GLOBAL coords (half-to-even is not shift-invariant,
            # parity: nearest3d's jnp.round, Generator/utils.py:124-138)
            vc = jnp.round(vc)
        return vc - c.astype(f32)

    xl = local(ii, D, cx, PA)
    yl = local(jj, H, cy, PB)
    zl = local(kk, W, cz, PC)
    of = (xl < 0.0) | (xl > PA - 1.0) | (yl < 0.0) | (yl > PB - 1.0) | \
         (zl < 0.0) | (zl > PC - 1.0)
    of_ref[0, 0, 0] = jnp.sum(of.astype(jnp.int32))
    xl = jnp.clip(xl, 0.0, PA - 1.0)
    yl = jnp.clip(yl, 0.0, PB - 1.0)
    zl = jnp.clip(zl, 0.0, PC - 1.0)

    def weights(sup, loc, dt):
        k = jax.lax.broadcasted_iota(jnp.int32, (sup, N), 0).astype(f32)
        if mode == "nearest":
            w = (k == loc).astype(f32)
        else:
            w = jnp.maximum(0.0, 1.0 - jnp.abs(k - loc))
        return w.astype(dt)

    wx = weights(PA, xl, f32)
    wy = weights(PB, yl, f32)
    wz = weights(PC, zl, cdt)

    # patch: dynamic x (leading) + y (sublane) ref slices, full-W lanes;
    # cast out of the compact storage dtype before the lane roll
    patch = vol_ref[pl.ds(cx, PA), pl.ds(cy, PB), :]       # (PA, PB, W)
    # z-trim: dynamic lane roll + static slice
    p2 = pltpu.roll(patch.astype(cdt).reshape(PA * PB, W),
                (W - cz) % W, 1)[:, :PC]

    t1 = jax.lax.dot_general(
        p2, wz, (((1,), (0,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST if cdt == f32 else None),
        preferred_element_type=f32)                        # (PA*PB, N)
    t2 = jnp.sum(t1.reshape(PA, PB, N) * wy[None], axis=1)  # (PA, N)
    o = jnp.sum(t2 * wx, axis=0, keepdims=True)             # (1, N)
    if mode != "nearest":
        o = jnp.where(ok, o, dflt_ref[0, 0, 0])
    out_ref[0, 0, :] = o[0]


@partial(jax.jit, static_argnames=("tile", "trim", "mode", "compute_dtype",
                                   "storage_dtype", "interpret"))
def warp_resident(vol, ii, jj, kk, default=0.0, tile=(8, 8, 16),
                  trim=(40, 40, 48), mode="linear",
                  compute_dtype=jnp.float32, storage_dtype=None,
                  interpret=False):
    """Single-channel tiled warp with the volume VMEM-resident.

    vol: (D,H,W); coords (Do,Ho,Wo). Returns (out, overflow_count).
    compute_dtype bf16 runs the z-contraction on the MXU at full rate
    (values quantized to bf16); float32 uses HIGHEST precision (exact).
    storage_dtype sets the resident copy's dtype (None: compute dtype for
    floats, the input dtype for 1-byte integer labels) — uint8 labels at
    192^3 occupy 7 MB of VMEM instead of 28.
    """
    if vol.ndim != 3:
        raise ValueError("warp_resident is single-channel — loop channels")
    in_dtype = vol.dtype
    if storage_dtype is None:
        if in_dtype.itemsize == 1 and jnp.issubdtype(in_dtype, jnp.integer):
            storage_dtype = in_dtype
        else:
            storage_dtype = compute_dtype
    volf = vol.astype(jnp.float32)
    D, H, W = volf.shape
    PA, PB, PC = trim
    ta, tb, tc = tile
    N = ta * tb * tc
    if N % 128:
        raise ValueError("tile voxel count must be a multiple of 128")
    if D < PA or H < PB or W < PC:
        raise ValueError("volume smaller than trim — use trilinear3d")

    orig = ii.shape
    iib, padded = _block(ii.astype(jnp.float32), tile)
    jjb, _ = _block(jj.astype(jnp.float32), tile)
    kkb, _ = _block(kk.astype(jnp.float32), tile)
    T = iib.shape[0]

    def corner(cb, hi, P):
        cc = jnp.clip(cb, 0.0, hi - 1.0)
        return jnp.clip(jnp.floor(jnp.min(cc, axis=1)).astype(jnp.int32),
                        0, max(int(hi) - P, 0))

    corners = jnp.stack([corner(iib, D, PA), corner(jjb, H, PB),
                         corner(kkb, W, PC)], axis=1)[:, None]

    dflt = jnp.full((1, 1, 1), jnp.asarray(default, jnp.float32))
    cdt = jnp.dtype(compute_dtype)
    volk = vol.astype(storage_dtype)

    kern = partial(_kernel, dims=(D, H, W), trim=(PA, PB, PC), N=N,
                   mode=mode, cdt=cdt)
    out, of = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((T, 1, N), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, 1), jnp.int32)),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole volume resident
        ],
        out_specs=(
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(corners, dflt, iib[:, None], jjb[:, None], kkb[:, None], volk)

    res = _unblock(out, padded, tile, orig)[0]
    if mode == "nearest" and in_dtype != jnp.float32:
        res = jnp.round(res).astype(in_dtype)
    return res, jnp.sum(of)
