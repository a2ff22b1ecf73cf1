"""HBM-blocked tiled warp kernel — gather-free warps for volumes of ANY
size (the generator's 192^3 subject bank, the inference atlas, ...).

Completes the kernel family of ops/pallas_warp*.py. The VMEM-resident
variant tops out at ~128^3 fp32; this one streams the source volume from
HBM through the Pallas pipeline instead:

- the source stays (C, D, H, W) fp32/int32 in HBM (32-bit: dynamic
  slicing of sub-32-bit refs crashes this relay's Mosaic backend);
- a 4x4 grid of Blocked in_specs, each (1, BX, BY, W), fetches the
  16-block neighbourhood around every output tile's quantized corner —
  block indices come from scalar-prefetched per-tile corner data, so the
  pipeline double-buffers the patches itself (and skips re-fetch when
  consecutive tiles share blocks);
- the kernel assembles the blocks into a (4BX, 4BY, W) scratch, trims x/y
  with dynamic leading/sublane slices, z with a dynamic lane roll (all
  f32 — the supported ops), then evaluates the interpolation as separable
  hat/indicator-weight contractions with the z-stage on the MXU in bf16
  (or fp32 HIGHEST for exact mode);
- channel groups iterate as the OUTER grid dimension (slowest-changing,
  so block sweeps keep their pipeline locality); in bf16 mode channels
  ride in PAIRS per grid step, sharing the block fetches and the
  per-tile weight build.

Measured (v5e, threaded-args timing, 2026-08-16/17): the XLA gather path
costs 243 ms per single-channel 160^3 warp of a 192^3 volume and +65 ms
per extra channel (824 ms at 10 channels). This kernel: 31 ms/channel
bf16 single-channel, 180 ms for the 10-channel fused wall warp at the
(8,8,32) tile, 94 ms/channel fp32 HIGHEST (exact to 2.4e-7), 23.6 ms
nearest on compact labels (bit-exact in bf16).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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



__all__ = ["warp_blocks"]

_BX = 16            # x/y block quantum
_NB = 4             # blocks fetched per axis (coverage 64, corner in [0,16))


def _kernel(scal_ref, *refs, dims, nz, trim, N, C, cp, mode, cdt, x_chunk):
    D, H, W = dims          # true extents (coordinate semantics)
    NZ = nz                 # 128-lane z-blocks fetched (1 or 2)
    CP = cp                 # channels packed per grid step (share fetches
                            # and the weight build)
    PA, PB, PC = trim
    f32 = jnp.float32
    # refs layout: 16*NZ block refs, dflt_ref, ii, jj, kk, out, of, scratch
    blocks = refs[:_NB * _NB * NZ]
    dflt_ref, ii_ref, jj_ref, kk_ref, out_ref, of_ref, scr_ref = \
        refs[_NB * _NB * NZ:]

    t = pl.program_id(1)

    cx = scal_ref[t, 0] * _BX          # quantized corner (block-aligned)
    cy = scal_ref[t, 1] * _BX
    zb0 = scal_ref[t, 2]               # z block index (128-lane blocks)
    xoff = scal_ref[t, 3]              # cx_exact - cx in [0, BX)
    yoff = scal_ref[t, 4]
    czl = scal_ref[t, 5]               # cz_exact - 128*zb0
    cz = zb0 * 128 + czl               # exact z corner

    ii = ii_ref[0]
    jj = jj_ref[0]
    kk = kk_ref[0]

    ok = (ii > 0.0) & (jj > 0.0) & (kk > 0.0) & \
         (ii <= D - 1.0) & (jj <= H - 1.0) & (kk <= W - 1.0)

    ox = (cx + xoff).astype(f32)
    oy = (cy + yoff).astype(f32)
    oz = cz.astype(f32)

    def local(v, hi, o, P):
        vc = jnp.clip(v, 0.0, hi - 1.0)
        if mode == "nearest":
            vc = jnp.round(vc)
        return vc - o

    xl = local(ii, D, ox, PA)
    yl = local(jj, H, oy, PB)
    zl = local(kk, W, oz, PC)
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

    wx = weights(PA, xl, f32)          # (PA, N)
    wy = weights(PB, yl, f32)          # (PB, N)
    wz = weights(PC, zl, cdt)          # (PC, N)

    prec = jax.lax.Precision.HIGHEST if cdt == f32 else None
    shift = (128 - czl) % 128
    for ch in range(CP):
        # assemble the 4x4(xNZ) block neighbourhood for this channel
        # (static offsets); the lane extent of every buffer is exactly 128
        # — the only extent this relay's Mosaic backend accepts for the
        # dynamic roll/slice path. Blocks may arrive in bf16; the scratch
        # stays f32 because dynamic slicing of sub-32-bit refs crashes the
        # backend.
        for i in range(_NB):
            for j in range(_NB):
                for kz in range(NZ):
                    scr_ref[kz, i * _BX:(i + 1) * _BX,
                            j * _BX:(j + 1) * _BX, :] = \
                        blocks[(i * _NB + j) * NZ + kz][ch, 0].astype(f32)
        o = jnp.zeros((1, N), f32)
        for a0 in range(0, PA, x_chunk):
            pa = min(x_chunk, PA - a0)
            # x/y trim: dynamic leading+sublane slices of the f32 scratch;
            # z trim: per-z-block 128-lane rolls + lane select
            p_lo = scr_ref[0, pl.ds(xoff + a0, pa), pl.ds(yoff, PB), :]
            r_lo = pltpu.roll(p_lo.reshape(pa * PB, 128), shift, 1)
            if NZ == 2:
                p_hi = scr_ref[1, pl.ds(xoff + a0, pa), pl.ds(yoff, PB), :]
                r_hi = pltpu.roll(p_hi.reshape(pa * PB, 128), shift, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (pa * PB, 128), 1)
                r_lo = jnp.where(lane < 128 - czl, r_lo, r_hi)
            p2 = r_lo[:, :PC]
            t1 = jax.lax.dot_general(
                p2.astype(cdt), wz, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=f32)   # (pa*PB, N)
            t2 = jnp.sum(t1.reshape(pa, PB, N) * wy[None], axis=1)
            o = o + jnp.sum(t2 * wx[a0:a0 + pa], axis=0, keepdims=True)
        if mode != "nearest":
            o = jnp.where(ok, o, dflt_ref[0, 0, ch])
        out_ref[0, pl.ds(ch, 1), :] = o


@partial(jax.jit, static_argnames=("tile", "trim", "mode", "compute_dtype",
                                   "interpret"))
def warp_blocks(vol, ii, jj, kk, default=0.0, tile=(8, 8, 16),
                trim=(48, 48, 48), mode="linear",
                compute_dtype=jnp.bfloat16, interpret=False):
    """Tiled warp streaming HBM blocks. Returns (out, overflow_count).

    vol: (D,H,W) or (D,H,W,C) — padded internally so D,H are multiples of
    16 and W >= trim z; coords (Do,Ho,Wo). trim x/y must be <= 48
    (4-block coverage 64 minus the 16-voxel corner quantization).
    Semantics match ops.interp.trilinear3d / nearest3d exactly (modulo
    compute_dtype rounding in linear mode; use float32 for exact parity).
    """
    squeeze = vol.ndim == 3
    volc = vol[None] if squeeze else jnp.moveaxis(vol, -1, 0)
    in_dtype = volc.dtype
    volc = volc.astype(jnp.float32)
    C = volc.shape[0]
    # channels packed per grid step: pairs share block fetches and the
    # weight build (bf16 blocks keep the spec VMEM in budget; fp32 and
    # nearest stay single-channel)
    CP = 2 if (jnp.dtype(compute_dtype) == jnp.bfloat16
               and mode != "nearest" and C > 1) else 1
    if C % CP:
        volc = jnp.concatenate(
            [volc, jnp.zeros((CP - C % CP, *volc.shape[1:]), volc.dtype)])
    CG = volc.shape[0] // CP
    PA, PB, PC = trim
    if PA > (_NB - 1) * _BX or PB > (_NB - 1) * _BX:
        raise ValueError(f"trim x/y must be <= {(_NB - 1) * _BX}")
    ta, tb, tc = tile
    N = ta * tb * tc
    if N % 128:
        raise ValueError("tile voxel count must be a multiple of 128")

    # pad source so D,H are block-multiples covering the 4-block fetch and
    # W is a lane-tile multiple covering the z trim (non-128-multiple lane
    # extents crash this relay's Mosaic backend in the roll/scratch path —
    # bisected 2026-08-16)
    D0, H0, W0 = volc.shape[1:]
    Dp = max(-(-D0 // _BX), _NB) * _BX
    Hp = max(-(-H0 // _BX), _NB) * _BX
    Wp = -(-max(W0, PC) // 128) * 128
    volc = jnp.pad(volc, ((0, 0), (0, Dp - D0), (0, Hp - H0), (0, Wp - W0)))

    orig = ii.shape
    iib, padded = _block(ii.astype(jnp.float32), tile)
    jjb, _ = _block(jj.astype(jnp.float32), tile)
    kkb, _ = _block(kk.astype(jnp.float32), tile)
    T = iib.shape[0]

    def corner(cb, hi, P, hi_pad):
        cc = jnp.clip(cb, 0.0, hi - 1.0)
        return jnp.clip(jnp.floor(jnp.min(cc, axis=1)).astype(jnp.int32),
                        0, max(int(hi_pad) - P, 0))

    # the scalar-prefetch array lives in SMEM — grids beyond ~512 tiles
    # overflow it (T=4000 crashed the backend, T<=512 compiles; bisected
    # 2026-08-16), so the tile grid runs in chunks of <=512 per pallas_call
    # (all inside this jit: one dispatch, one compiled kernel reused)
    TC = 512
    Tpad = -(-T // TC) * TC
    if Tpad != T:
        def padT(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (Tpad - T, *a.shape[1:]))], 0)
        iib, jjb, kkb = padT(iib), padT(jjb), padT(kkb)

    cxe = corner(iib, D0, PA, Dp)
    cye = corner(jjb, H0, PB, Hp)
    cze = corner(kkb, W0, PC, Wp)
    NZ = 2 if Wp > 128 else 1
    bx0 = jnp.clip(cxe // _BX, 0, Dp // _BX - _NB)
    by0 = jnp.clip(cye // _BX, 0, Hp // _BX - _NB)
    zb0 = jnp.clip(cze // 128, 0, Wp // 128 - NZ)
    # corners relative to the quantized block origins (in [0, quantum)
    # unless a high-edge clip engaged)
    xoff = cxe - bx0 * _BX
    yoff = cye - by0 * _BX
    czl = cze - zb0 * 128
    scal = jnp.stack([bx0, by0, zb0, xoff, yoff, czl], axis=1)  # (Tpad, 6)

    dflt = jnp.broadcast_to(jnp.asarray(default, jnp.float32).reshape(-1),
                            (C,))
    dflt = jnp.concatenate([dflt, jnp.zeros(CG * CP - C)]).reshape(CG, 1, CP)
    cdt = jnp.dtype(compute_dtype)

    # expose 128-lane z-blocks as an explicit dimension, ordered so each
    # block's trailing dims are (BX, 128) — the shapes the lowering accepts;
    # bf16 compute stores the streamed copy in bf16 (same rounding the
    # matmul would apply, half the block-fetch traffic)
    volz = volc.reshape(CG * CP, Dp, Hp, Wp // 128,
                        128).transpose(0, 3, 1, 2, 4)
    if cdt == jnp.bfloat16 and mode != "nearest":
        volz = volz.astype(jnp.bfloat16)

    vol_specs = [
        pl.BlockSpec((CP, 1, _BX, _BX, 128),
                     (lambda i, j, kz: lambda c, t, s:
                      (c, s[t, 2] + kz, s[t, 0] + i, s[t, 1] + j, 0))(i, j, kz),
                     memory_space=pltpu.VMEM)
        for i in range(_NB) for j in range(_NB) for kz in range(NZ)
    ]
    kern = partial(_kernel, dims=(D0, H0, W0), nz=NZ, trim=(PA, PB, PC),
                   N=N, C=C, cp=CP, mode=mode, cdt=cdt, x_chunk=8)
    Tc = min(TC, Tpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(CG, Tc),
        in_specs=vol_specs + [
            pl.BlockSpec((1, 1, CP), lambda c, t, s: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, N), lambda c, t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda c, t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda c, t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, CP, N), lambda c, t, s: (c * Tc + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda c, t, s: (c * Tc + t, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NZ, _NB * _BX, _NB * _BX, 128), jnp.float32),
        ],
    )
    call = partial(
        pl.pallas_call, kern,
        out_shape=(jax.ShapeDtypeStruct((CG * Tc, CP, N), jnp.float32),
                   jax.ShapeDtypeStruct((CG * Tc, 1, 1), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret)
    outs, ofs = [], []
    for t0 in range(0, Tpad, Tc):
        sl = slice(t0, t0 + Tc)
        o_c, of_c = call()(scal[sl], *([volz] * (_NB * _NB * NZ)), dflt,
                           iib[sl, None], jjb[sl, None], kkb[sl, None])
        # (CG*Tc, CP, N) -> (CG*CP, Tc, N)
        outs.append(o_c.reshape(CG, Tc, CP, N).transpose(0, 2, 1, 3)
                    .reshape(CG * CP, Tc, N))
        ofs.append(jnp.sum(of_c))
    out = jnp.concatenate(outs, axis=1)[:C, :T]
    of = jnp.sum(jnp.stack(ofs))

    res = _unblock(out.transpose(1, 0, 2), padded, tile, orig)
    res = res[0] if squeeze else jnp.moveaxis(res, 0, -1)
    if mode == "nearest" and in_dtype != jnp.float32:
        res = jnp.round(res).astype(in_dtype)
    return res, jnp.sum(of)


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
