"""Pallas tiled warp kernel — gather-free trilinear resampling on TPU.

The volumetric warps in this framework (generator grid deformation,
/root/reference/Generator/datasets.py:264-303; atlas warp,
/root/reference/utils/test_utils.py:45-57) sample a dense volume at one
float coordinate per output voxel with masked out-of-bounds defaults
(`fast_3D_interp_torch`, /root/reference/Generator/utils.py:119-196).

XLA lowers this to 8 full-volume gathers; TPU gathers are index-bound and
cost 12-40 ms for a 160^3 warp depending on source size and relay health
(12.1 ms at 128^3 src measured 2026-08-16; an earlier degraded-relay
session read ~240 ms). Mosaic cannot
express the volumetric gather at all ("Only 2D gather is supported").

This kernel sidesteps gathers entirely by exploiting that the warp fields
are SMOOTH (affine + band-limited SVF): coordinates of a small output tile
land in a small input box. Per output tile:

  1. an XLA pre-pass computes the per-tile bounding-box corner of the
     (clipped) input coordinates,
  2. the kernel DMAs the static-shape source patch at that dynamic corner
     from HBM into VMEM,
  3. trilinear interpolation is evaluated as three separable hat-weight
     contractions *inside* the patch:
        out[o] = sum_{a,b,c} wx[a,o] * wy[b,o] * wz[c,o] * patch[a,b,c]
     with w*[k,o] = max(0, 1 - |k - coord_local[o]|) built from iota —
     exactly the trilinear weights, 2 non-zeros per column. The z
     contraction is one MXU matmul (patch2d @ wzT); y and x collapse on
     the VPU. No gather instruction anywhere.

Layout: outputs live in the LANE dimension (N = tile voxels per grid step),
weights are (support, N) lane-major, so every step is an axis-0 reduction —
the natural TPU layout. Cost for a 160^3 warp with (8,8,16) tiles and
(32,32,48) patches: ~1.7e11 MXU MACs + ~5e9 VPU ops + ~0.8 GB DMA, vs
~33 M serialized gather lookups for XLA.

If a tile's coordinate spread exceeds the static patch (deformation wilder
than the config bounds used to size it), local coordinates are clamped to
the patch and the tile is flagged in the `overflow` output; callers size
patches from their known augmentation bounds (see `patch_for_bounds`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_trilinear_tiled", "trilinear3d_tiled", "patch_for_bounds"]


def _warp_kernel(corner_ref, dflt_ref, ii_ref, jj_ref, kk_ref, vol_ref,
                 out_ref, of_ref, patch_ref, sem,
                 *, dims, patch, C, N, mode):
    D, H, W = dims
    PA, PB, PC = patch
    f32 = jnp.float32

    cx = corner_ref[0, 0, 0]
    cy = corner_ref[0, 0, 1]
    cz = corner_ref[0, 0, 2]

    ii = ii_ref[0]            # (1, N) global float coords
    jj = jj_ref[0]
    kk = kk_ref[0]

    # out-of-bounds mask — strict >0 lower bound (reference convention,
    # Generator/utils.py:141); nearest mode only clamps (utils.py:124-138)
    ok = (ii > 0.0) & (jj > 0.0) & (kk > 0.0) & \
         (ii <= D - 1.0) & (jj <= H - 1.0) & (kk <= W - 1.0)

    # local (patch) coordinates; clamp into the patch (overflow flagged)
    xl = jnp.clip(ii, 0.0, D - 1.0) - cx.astype(f32)
    yl = jnp.clip(jj, 0.0, H - 1.0) - cy.astype(f32)
    zl = jnp.clip(kk, 0.0, W - 1.0) - cz.astype(f32)
    of = (xl < 0.0) | (xl > PA - 1.0) | (yl < 0.0) | (yl > PB - 1.0) | \
         (zl < 0.0) | (zl > PC - 1.0)
    of_ref[0, 0, 0] = jnp.sum(of.astype(jnp.int32))
    xl = jnp.clip(xl, 0.0, PA - 1.0)
    yl = jnp.clip(yl, 0.0, PB - 1.0)
    zl = jnp.clip(zl, 0.0, PC - 1.0)

    # separable weights, lane-major (support, N): trilinear hat — exactly
    # the 2-tap interpolation weights — or the nearest-rounding indicator
    # (exactly one 1.0 per column, so integer label volumes pass through
    # bit-exactly)
    def weights(sup, loc):
        k = jax.lax.broadcasted_iota(jnp.int32, (sup, N), 0).astype(f32)
        if mode == "nearest":
            return (k == jnp.round(loc)).astype(f32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(k - loc))

    wx = weights(PA, xl)      # (PA, N)
    wy = weights(PB, yl)      # (PB, N)
    wz = weights(PC, zl)      # (PC, N)

    copy = pltpu.make_async_copy(
        vol_ref.at[:, pl.ds(cx, PA), pl.ds(cy, PB), pl.ds(cz, PC)],
        patch_ref, sem)
    copy.start()
    copy.wait()

    for c in range(C):
        p2 = patch_ref[c].reshape(PA * PB, PC)
        # z contraction on the MXU: (PA*PB, PC) @ (PC, N) -> (PA*PB, N).
        # HIGHEST keeps fp32 operands exact (values parity + exact integer
        # labels) regardless of the global matmul-precision default.
        t1 = jax.lax.dot_general(
            p2, wz, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32)
        # y contraction (VPU): (PA, PB, N) * (1, PB, N) -> (PA, N)
        t2 = jnp.sum(t1.reshape(PA, PB, N) * wy[None], axis=1)
        # x contraction (VPU): (PA, N) -> (1, N)
        o = jnp.sum(t2 * wx, axis=0, keepdims=True)
        if mode != "nearest":
            o = jnp.where(ok, o, dflt_ref[0, 0, c])
        out_ref[0, pl.ds(c, 1), :] = o


def _block(x, tile):
    """(Do,Ho,Wo) -> (T, N) tile-major blocks, edge-padded."""
    ta, tb, tc = tile
    Do, Ho, Wo = x.shape
    pa, pb, pc = (-Do) % ta, (-Ho) % tb, (-Wo) % tc
    x = jnp.pad(x, ((0, pa), (0, pb), (0, pc)), mode="edge")
    A, B, Cc = x.shape
    x = x.reshape(A // ta, ta, B // tb, tb, Cc // tc, tc)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, ta * tb * tc), (A, B, Cc)


def _unblock(y, padded, tile, orig):
    ta, tb, tc = tile
    A, B, Cc = padded
    T, C, N = y.shape
    y = y.reshape(A // ta, B // tb, Cc // tc, C, ta, tb, tc)
    y = y.transpose(3, 0, 4, 1, 5, 2, 6).reshape(C, A, B, Cc)
    return y[:, :orig[0], :orig[1], :orig[2]]


# channels per pallas_call — bounds the VMEM patch scratch (the wrapper
# chunks wider stacks into several calls over the same blocked coords)
_CMAX = 4


@partial(jax.jit, static_argnames=("tile", "patch", "mode", "interpret"))
def warp_trilinear_tiled(vol, ii, jj, kk, default, tile=(8, 8, 16),
                         patch=(32, 32, 48), mode="linear",
                         interpret=False):
    """Tiled Pallas warp. Returns (out, overflow_count).

    vol: (D,H,W) or (D,H,W,C) float; ii/jj/kk: (Do,Ho,Wo) float coords;
    default: scalar or (C,) per-channel out-of-bounds values (linear mode;
    nearest clamps instead, like ops.interp.nearest3d).
    Semantics match ops.interp.trilinear3d/nearest3d exactly while every
    tile's coordinates fit its patch; out-of-patch voxels clamp (and count
    into `overflow_count`).
    """
    squeeze = vol.ndim == 3
    volc = vol[None] if squeeze else jnp.moveaxis(vol, -1, 0)
    in_dtype = volc.dtype
    volc = volc.astype(jnp.float32)
    C, D, H, W = volc.shape
    PA, PB, PC = patch
    ta, tb, tc = tile
    N = ta * tb * tc
    if N % 128:
        raise ValueError("tile voxel count must be a multiple of 128")
    if D < PA or H < PB or W < PC:
        raise ValueError("volume smaller than patch — use trilinear3d")

    orig = ii.shape
    iib, padded = _block(ii.astype(jnp.float32), tile)
    jjb, _ = _block(jj.astype(jnp.float32), tile)
    kkb, _ = _block(kk.astype(jnp.float32), tile)
    T = iib.shape[0]

    dflt = jnp.broadcast_to(jnp.asarray(default, jnp.float32).reshape(-1),
                            (C,))[None, None]                  # (1, 1, C)

    def corner(cb, hi, P):
        cc = jnp.clip(cb, 0.0, hi - 1.0)
        lo = jnp.clip(jnp.floor(jnp.min(cc, axis=1)).astype(jnp.int32),
                      0, max(int(hi) - P, 0))
        return lo

    corners = jnp.stack([corner(iib, D, PA), corner(jjb, H, PB),
                         corner(kkb, W, PC)], axis=1)[:, None]  # (T, 1, 3)

    grid = (T,)
    kern = partial(_warp_kernel, dims=(D, H, W), patch=(PA, PB, PC),
                   C=C, N=N, mode=mode)
    out, of = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((T, C, N), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1, 1), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, C, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, PA, PB, PC), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(corners, dflt, iib[:, None], jjb[:, None], kkb[:, None], volc)

    res = _unblock(out, padded, tile, orig)
    res = res[0] if squeeze else jnp.moveaxis(res, 0, -1)
    if mode == "nearest" and in_dtype != jnp.float32:
        res = jnp.round(res).astype(in_dtype)
    return res, jnp.sum(of)


def trilinear3d_tiled(vol, ii, jj, kk, default=0.0, tile=(8, 8, 16),
                      patch=(32, 32, 48), interpret=False):
    """Drop-in for ops.interp.trilinear3d via the tiled Pallas kernel
    (overflow count discarded — size `patch` from the warp bounds, see
    `patch_for_bounds`)."""
    out, _ = warp_trilinear_tiled(vol, ii, jj, kk, default, tile=tile,
                                  patch=patch, interpret=interpret)
    return out


def plan_trim(tile, max_rotation, max_shear, max_scaling, svf_margin,
              align=8):
    """Static per-axis patch extents covering the generator's deformation
    family (random_affine bounds, synth/deform.py:37-56) plus an SVF
    within-tile spread margin.

    The affine extent along input axis i for an output tile of extents t is
    max over the parameter box of sum_j |A_ij| t_j; the box corners achieve
    the maximum of each |A_ij| so corner sampling is exact enough. +2 for
    interpolation support and slack.
    """
    import itertools

    import numpy as np

    rot = float(max_rotation) / 180.0 * np.pi
    best = np.zeros(3)
    t = np.asarray(tile, np.float64)
    for r in itertools.product((-rot, rot), repeat=3):
        for sh in itertools.product((-max_shear, max_shear), repeat=3):
            cx, sx = np.cos(r[0]), np.sin(r[0])
            cy, sy = np.cos(r[1]), np.sin(r[1])
            cz, sz = np.cos(r[2]), np.sin(r[2])
            Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            SHx = np.array([[1, 0, 0], [sh[1], 1, 0], [sh[2], 0, 1]])
            SHy = np.array([[1, sh[0], 0], [0, 1, 0], [0, sh[2], 1]])
            SHz = np.array([[1, 0, sh[0]], [0, 1, sh[1]], [0, 0, 1]])
            A = SHx @ SHy @ SHz @ Rx @ Ry @ Rz
            best = np.maximum(best, np.abs(A) @ t)
    best = best * (1.0 + float(max_scaling))
    need = best + 2.0 * float(svf_margin) + 2.0
    return tuple(int(-(-int(n + 1) // align) * align) for n in need)


def patch_for_bounds(tile, max_scale, max_displacement, align=8):
    """Static patch shape guaranteeing coverage for a warp whose Jacobian
    rows are bounded by `max_scale` (affine incl. rotation/shear) plus a
    residual displacement bound (SVF amplitude), per axis.

    tile extents map into input extents <= max_scale * (sum of tile
    extents) in the worst rotation; add 2*max_displacement for the SVF,
    +1 for the interpolation support and +1 slack.
    """
    ta, tb, tc = tile
    ext = float(max_scale) * (ta + tb + tc)
    need = int(ext + 2.0 * float(max_displacement) + 2.0) + 1
    need = -(-need // align) * align
    return (need, need, need)
