"""Tiled Pallas warp kernel (ops/pallas_warp.py) vs the XLA gather path.

Runs in interpret mode on CPU — semantics identical to
ops.interp.trilinear3d (fast_3D_interp_torch parity,
/root/reference/Generator/utils.py:119-196) whenever each tile's
coordinates fit its patch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from brainfm_tpu.ops.interp import trilinear3d
from brainfm_tpu.ops.pallas_warp import (patch_for_bounds,
                                         warp_trilinear_tiled)


def _smooth_grid(shape, D, H, W, scale=1.1, rot=0.2, disp=3.0):
    xo, yo, zo = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                             np.arange(shape[2]), indexing="ij")
    cx, cy, cz = [(s - 1) / 2 for s in shape]
    c, s = np.cos(rot), np.sin(rot)
    x = (xo - cx) * c * scale - (yo - cy) * s * scale + D / 2
    y = (xo - cx) * s * scale + (yo - cy) * c * scale + H / 2
    z = (zo - cz) * 1.05 + W / 2
    x = x + disp * np.sin(yo / 17.0)
    y = y + disp * np.cos(zo / 13.0)
    z = z + disp * np.sin(xo / 11.0)
    return tuple(jnp.asarray(v, jnp.float32) for v in (x, y, z))


def test_matches_trilinear3d_single_channel():
    rng = np.random.default_rng(0)
    D = H = W = 48
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    ref = trilinear3d(vol, ii, jj, kk, default=-7.0)
    out, of = warp_trilinear_tiled(vol, ii, jj, kk, -7.0, tile=(8, 8, 16),
                                   patch=(32, 32, 48), interpret=True)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_trilinear3d_channels_odd_shape():
    rng = np.random.default_rng(1)
    D = H = W = 48
    volc = jnp.asarray(rng.random((D, H, W, 5)), jnp.float32)
    ii, jj, kk = _smooth_grid((21, 19, 30), D, H, W)
    dflt = jnp.asarray([0.0, 1.0, -2.0, 3.5, 9.0], jnp.float32)
    ref = trilinear3d(volc, ii, jj, kk, default=dflt)
    out, of = warp_trilinear_tiled(volc, ii, jj, kk, dflt, tile=(8, 8, 16),
                                   patch=(32, 32, 48), interpret=True)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_out_of_bounds_defaults_match():
    # coords straddling the volume edge: masked voxels get the default,
    # strict >0 lower bound included
    rng = np.random.default_rng(2)
    D = H = W = 40
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    base = np.linspace(-6.0, D + 5.0, 24, dtype=np.float32)
    ii = jnp.asarray(np.broadcast_to(base[:, None, None], (24, 8, 16)).copy())
    jj = jnp.full((24, 8, 16), 7.25, jnp.float32)
    kk = jnp.asarray(np.broadcast_to(
        np.linspace(0.0, W - 1.0, 16, dtype=np.float32)[None, None, :],
        (24, 8, 16)).copy())
    ref = trilinear3d(vol, ii, jj, kk, default=4.5)
    out, _ = warp_trilinear_tiled(vol, ii, jj, kk, 4.5, tile=(8, 8, 16),
                                  patch=(32, 32, 40), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_overflow_flagged_for_wild_coords():
    rng = np.random.default_rng(3)
    D = H = W = 48
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii = jnp.asarray(rng.random((16, 16, 16)) * (D - 2) + 1, jnp.float32)
    jj = jnp.full((16, 16, 16), 20.0, jnp.float32)
    kk = jnp.full((16, 16, 16), 20.0, jnp.float32)
    _, of = warp_trilinear_tiled(vol, ii, jj, kk, 0.0, tile=(8, 8, 16),
                                 patch=(32, 32, 48), interpret=True)
    assert int(of) > 0


def test_patch_for_bounds_covers():
    tile = (8, 8, 16)
    patch = patch_for_bounds(tile, max_scale=1.15, max_displacement=3.0)
    assert all(p >= 8 for p in patch)
    rng = np.random.default_rng(4)
    D = H = W = 64
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W, scale=1.15, rot=0.3,
                              disp=3.0)
    _, of = warp_trilinear_tiled(vol, ii, jj, kk, 0.0, tile=tile,
                                 patch=patch, interpret=True)
    assert int(of) == 0


def test_warp_resident_linear_and_nearest():
    from brainfm_tpu.ops.interp import nearest3d
    from brainfm_tpu.ops.pallas_warp_resident import warp_resident

    rng = np.random.default_rng(5)
    D = H = W = 64
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    ref = trilinear3d(vol, ii, jj, kk, default=-3.0)
    out, of = warp_resident(vol, ii, jj, kk, -3.0, tile=(8, 8, 16),
                            trim=(40, 40, 48), interpret=True)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # nearest on integer labels must be bit-exact (incl. half-to-even
    # rounding in global coordinates)
    voli = jnp.asarray(rng.integers(0, 2000, (D, H, W)), jnp.int32)
    refn = nearest3d(voli, ii, jj, kk)
    outn, ofn = warp_resident(voli, ii, jj, kk, 0.0, tile=(8, 8, 16),
                              trim=(40, 40, 48), mode="nearest",
                              interpret=True)
    assert int(ofn) == 0
    assert (np.asarray(refn) == np.asarray(outn)).all()
    assert outn.dtype == voli.dtype


def test_warp_resident_uint8_labels():
    # compact uint8 label volumes (LUT applied pre-warp) stay exact
    from brainfm_tpu.ops.interp import nearest3d
    from brainfm_tpu.ops.pallas_warp_resident import warp_resident

    rng = np.random.default_rng(6)
    D = H = W = 56
    voli = jnp.asarray(rng.integers(0, 56, (D, H, W)), jnp.uint8)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    refn = nearest3d(voli.astype(jnp.int32), ii, jj, kk)
    outn, _ = warp_resident(voli, ii, jj, kk, 0.0, tile=(8, 8, 16),
                            trim=(40, 40, 48), mode="nearest",
                            interpret=True)
    assert (np.asarray(refn) == np.asarray(outn).astype(np.int32)).all()
