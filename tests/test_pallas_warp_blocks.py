"""HBM-blocked warp kernel (ops/pallas_warp_blocks.py) vs the XLA gather
path, in interpret mode on CPU. Parity target: ops.interp.trilinear3d /
nearest3d (fast_3D_interp_torch semantics,
/root/reference/Generator/utils.py:119-196)."""

import jax.numpy as jnp
import numpy as np

from brainfm_tpu.ops.interp import nearest3d, trilinear3d
from brainfm_tpu.ops.pallas_warp_blocks import warp_blocks
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

pytestmark = __import__('pytest').mark.slow  # torch-oracle / interpret-mode: slow tier


def test_blocks_linear_exact_fp32():
    rng = np.random.default_rng(0)
    D = H = W = 72
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    ref = trilinear3d(vol, ii, jj, kk, default=-7.0)
    out, of = warp_blocks(vol, ii, jj, kk, -7.0, tile=(8, 8, 16),
                          trim=(40, 40, 48), compute_dtype=jnp.float32,
                          interpret=True)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_blocks_multichannel_defaults():
    rng = np.random.default_rng(1)
    D = H = W = 72
    volc = jnp.asarray(rng.random((D, H, W, 3)), jnp.float32)
    ii, jj, kk = _smooth_grid((21, 19, 30), D, H, W)
    dflt = jnp.asarray([1.0, -2.0, 5.0], jnp.float32)
    ref = trilinear3d(volc, ii, jj, kk, default=dflt)
    out, of = warp_blocks(volc, ii, jj, kk, dflt, tile=(8, 8, 16),
                          trim=(40, 40, 48), compute_dtype=jnp.float32,
                          interpret=True)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_blocks_nearest_bit_exact():
    rng = np.random.default_rng(2)
    D = H = W = 72
    voli = jnp.asarray(rng.integers(0, 2000, (D, H, W)), jnp.int32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    refn = nearest3d(voli, ii, jj, kk)
    outn, of = warp_blocks(voli, ii, jj, kk, 0.0, tile=(8, 8, 16),
                           trim=(40, 40, 48), mode="nearest",
                           compute_dtype=jnp.float32, interpret=True)
    assert int(of) == 0
    assert (np.asarray(refn) == np.asarray(outn)).all()
    assert outn.dtype == voli.dtype


def test_blocks_bf16_close():
    rng = np.random.default_rng(3)
    D = H = W = 72
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W)
    ref = trilinear3d(vol, ii, jj, kk, default=0.0)
    out, _ = warp_blocks(vol, ii, jj, kk, 0.0, tile=(8, 8, 16),
                         trim=(40, 40, 48), compute_dtype=jnp.bfloat16,
                         interpret=True)
    err = np.abs(np.asarray(ref) - np.asarray(out)).max()
    assert err < 2e-2, err


def test_blocks_edge_oob_defaults():
    # coords beyond the volume (incl. the strict >0 lower bound)
    rng = np.random.default_rng(4)
    D = H = W = 64
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    base = np.linspace(-6.0, D + 5.0, 24, dtype=np.float32)
    ii = jnp.asarray(np.broadcast_to(base[:, None, None], (24, 8, 16)).copy())
    jj = jnp.full((24, 8, 16), 7.25, jnp.float32)
    kk = jnp.asarray(np.broadcast_to(
        np.linspace(0.0, W - 1.0, 16, dtype=np.float32)[None, None, :],
        (24, 8, 16)).copy())
    ref = trilinear3d(vol, ii, jj, kk, default=4.5)
    # kk spans the whole volume inside each tile -> z-trim must cover it
    out, _ = warp_blocks(vol, ii, jj, kk, 4.5, tile=(8, 8, 16),
                         trim=(40, 40, 128), compute_dtype=jnp.float32,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_blocks_chunked_grid():
    # more than 512 tiles forces the chunked pallas_call path
    rng = np.random.default_rng(5)
    D = H = W = 48
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    ii, jj, kk = _smooth_grid((40, 80, 80), D, H, W, scale=0.5, rot=0.1,
                              disp=2.0)
    # (40/8)*(80/8)*(80/16) = 250 tiles < 512; enlarge with a finer tile
    out, of = warp_blocks(vol, ii, jj, kk, 0.0, tile=(8, 8, 16),
                          trim=(40, 40, 48), compute_dtype=jnp.float32,
                          interpret=True)
    ref = trilinear3d(vol, ii, jj, kk, default=0.0)
    assert int(of) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_lut_apply_matches_take():
    from brainfm_tpu.ops.pallas_lut import lut_apply

    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.random((256, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 256, (31, 17, 9)), jnp.int32)
    ref = np.asarray(table)[np.asarray(idx)]
    out = lut_apply(table, idx, interpret=True)
    assert (np.asarray(out) == ref).all()

    # 1-D integer table: dtype survives, values exact
    t1 = jnp.asarray(rng.integers(0, 56, 2036), jnp.int32)
    i1 = jnp.asarray(rng.integers(0, 2036, (23, 11)), jnp.int32)
    o1 = lut_apply(t1, i1, interpret=True)
    assert o1.dtype == t1.dtype
    assert (np.asarray(o1) == np.asarray(t1)[np.asarray(i1)]).all()


def test_overflow_guard_recomputes_exactly():
    """A trim too small for the deformation overflows the patch; the
    routed result must then equal the exact gather via the lax.cond
    fallback (ops/warp_auto._overflow_guard), not the clamped kernel
    output."""
    from brainfm_tpu.ops.warp_auto import _exact_linear, _overflow_guard

    rng = np.random.default_rng(11)
    D = H = W = 72
    vol = jnp.asarray(rng.random((D, H, W)), jnp.float32)
    # large displacement so source coords spread far beyond a 16^3 patch
    ii, jj, kk = _smooth_grid((24, 24, 32), D, H, W, scale=1.6, disp=9.0)
    kout = warp_blocks(vol, ii, jj, kk, -7.0, tile=(8, 8, 16),
                       trim=(16, 16, 48), compute_dtype=jnp.float32,
                       interpret=True)
    assert int(kout[1]) > 0, "test needs an actually-overflowing trim"
    ref = trilinear3d(vol, ii, jj, kk, default=-7.0)
    assert not np.allclose(np.asarray(kout[0]), np.asarray(ref)), \
        "clamped kernel output should differ when voxels overflow"
    out = _overflow_guard(kout, _exact_linear, vol, ii, jj, kk, -7.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # and with NO overflow the kernel's own result is kept
    k2 = warp_blocks(vol, ii, jj, kk, -7.0, tile=(8, 8, 16),
                     trim=(48, 48, 72), compute_dtype=jnp.float32,
                     interpret=True)
    assert int(k2[1]) == 0
    def _nan_branch(out, vol, ii, jj, kk, default):
        return jnp.full_like(out, jnp.nan)

    out2 = _overflow_guard(k2, _nan_branch, vol, ii, jj, kk, -7.0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(k2[0]))
