"""Golden tests for the fast trilinear/nearest workhorse and the zoom family,
against independent numpy oracles implementing the reference conventions
(Generator/utils.py:119-257, utils/misc.py:1051-1187)."""

import numpy as np
import pytest

import jax.numpy as jnp

from brainfm_tpu.ops import (gaussian_blur_3d, interp3d, myzoom,
                             myzoom_anisotropic, volume_resize)


def np_trilinear(X, II, JJ, KK, default=0.0):
    """Oracle: masked trilinear gather, reference bounds convention
    (strict >0 lower bound, Generator/utils.py:141)."""
    X = X[..., None] if X.ndim == 3 else X
    ok = (II > 0) & (JJ > 0) & (KK > 0) & \
         (II <= X.shape[0] - 1) & (JJ <= X.shape[1] - 1) & (KK <= X.shape[2] - 1)
    out = np.full(II.shape + (X.shape[3],), default, np.float64)
    IIv, JJv, KKv = II[ok], JJ[ok], KK[ok]
    fx, fy, fz = np.floor(IIv).astype(int), np.floor(JJv).astype(int), np.floor(KKv).astype(int)
    cx = np.minimum(fx + 1, X.shape[0] - 1)
    cy = np.minimum(fy + 1, X.shape[1] - 1)
    cz = np.minimum(fz + 1, X.shape[2] - 1)
    wcx, wcy, wcz = (IIv - fx)[:, None], (JJv - fy)[:, None], (KKv - fz)[:, None]
    wfx, wfy, wfz = 1 - wcx, 1 - wcy, 1 - wcz
    acc = ((X[fx, fy, fz] * wfx + X[cx, fy, fz] * wcx) * wfy +
           (X[fx, cy, fz] * wfx + X[cx, cy, fz] * wcx) * wcy) * wfz + \
          ((X[fx, fy, cz] * wfx + X[cx, fy, cz] * wcx) * wfy +
           (X[fx, cy, cz] * wfx + X[cx, cy, cz] * wcx) * wcy) * wcz
    out[ok] = acc
    return out[..., 0] if out.shape[-1] == 1 else out


def np_myzoom(X, factor):
    """Oracle: center-aligned zoom (Generator/utils.py:200-249)."""
    X = X[..., None] if X.ndim == 3 else X
    factor = np.asarray(factor, float)
    delta = (1.0 - factor) / (2.0 * factor)
    newsize = np.round(np.array(X.shape[:-1]) * factor).astype(int)
    vs = []
    for d in range(3):
        v = np.arange(delta[d], delta[d] + newsize[d] / factor[d], 1 / factor[d])[: newsize[d]]
        v = np.clip(v, 0, X.shape[d] - 1)
        vs.append(v)
    II, JJ, KK = np.meshgrid(*vs, indexing="ij")
    fx, fy, fz = np.floor(II).astype(int), np.floor(JJ).astype(int), np.floor(KK).astype(int)
    cx = np.minimum(fx + 1, X.shape[0] - 1)
    cy = np.minimum(fy + 1, X.shape[1] - 1)
    cz = np.minimum(fz + 1, X.shape[2] - 1)
    wcx, wcy, wcz = (II - fx)[..., None], (JJ - fy)[..., None], (KK - fz)[..., None]
    wfx, wfy, wfz = 1 - wcx, 1 - wcy, 1 - wcz
    Y = ((X[fx, fy, fz] * wfx + X[cx, fy, fz] * wcx) * wfy +
         (X[fx, cy, fz] * wfx + X[cx, cy, fz] * wcx) * wcy) * wfz + \
        ((X[fx, fy, cz] * wfx + X[cx, fy, cz] * wcx) * wfy +
         (X[fx, cy, cz] * wfx + X[cx, cy, cz] * wcx) * wcy) * wcz
    return Y[..., 0] if Y.shape[-1] == 1 else Y


def test_trilinear_matches_oracle(rng):
    X = rng.standard_normal((6, 7, 8))
    II = rng.random((4, 5)) * 9 - 1
    JJ = rng.random((4, 5)) * 9 - 1
    KK = rng.random((4, 5)) * 9 - 1
    ref = np_trilinear(X, II, JJ, KK, default=0.5)
    got = np.asarray(interp3d(jnp.asarray(X), jnp.asarray(II), jnp.asarray(JJ),
                              jnp.asarray(KK), "linear", default=0.5))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_trilinear_channels(rng):
    X = rng.standard_normal((6, 7, 8, 3))
    II = rng.random((10,)) * 7
    JJ = rng.random((10,)) * 7
    KK = rng.random((10,)) * 7
    ref = np_trilinear(X, II, JJ, KK)
    got = np.asarray(interp3d(jnp.asarray(X), jnp.asarray(II), jnp.asarray(JJ),
                              jnp.asarray(KK), "linear"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_nearest_matches_oracle(rng):
    X = rng.standard_normal((6, 7, 8))
    II = rng.random((11,)) * 9 - 1
    JJ = rng.random((11,)) * 9 - 1
    KK = rng.random((11,)) * 9 - 1
    ir = np.clip(np.round(II).astype(int), 0, 5)
    jr = np.clip(np.round(JJ).astype(int), 0, 6)
    kr = np.clip(np.round(KK).astype(int), 0, 7)
    ref = X[ir, jr, kr]
    got = np.asarray(interp3d(jnp.asarray(X), jnp.asarray(II), jnp.asarray(JJ),
                              jnp.asarray(KK), "nearest"))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("factor", [[0.5, 0.5, 0.5], [1.7, 0.8, 1.2]])
def test_myzoom_matches_oracle(rng, factor):
    X = rng.standard_normal((8, 9, 10))
    ref = np_myzoom(X, factor)
    got = np.asarray(myzoom(jnp.asarray(X), factor))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_myzoom_anisotropic_affine(rng):
    X = rng.standard_normal((8, 8, 8))
    aff = np.diag([1.0, 1.0, 1.0, 1.0])
    y, aff2 = myzoom_anisotropic(jnp.asarray(X), [4, 6, 8], aff)
    assert y.shape == (4, 6, 8)
    factors = np.array([0.5, 0.75, 1.0])
    np.testing.assert_allclose(np.diag(aff2)[:3], 1 / factors)


def test_gaussian_blur_matches_oracle(rng):
    X = rng.standard_normal((9, 9, 9))
    sig = [1.0, 0.0, 2.0]
    got = np.asarray(gaussian_blur_3d(jnp.asarray(X), sig))

    def k(s):
        sl = int(np.ceil(3 * s))
        t = np.arange(-sl, sl + 1)
        g = np.exp(-((t / s) ** 2) / 2)
        return g / g.sum()

    ref = X.copy()
    kx = k(1.0)
    pad = len(kx) // 2
    tmp = np.zeros_like(ref)
    xp = np.pad(ref, ((pad, pad), (0, 0), (0, 0)))
    for i in range(ref.shape[0]):
        tmp[i] = np.tensordot(kx, xp[i:i + len(kx)], axes=(0, 0))
    ref = tmp
    kz = k(2.0)
    pad = len(kz) // 2
    xp = np.pad(ref, ((0, 0), (0, 0), (pad, pad)))
    tmp = np.zeros_like(ref)
    for i in range(ref.shape[2]):
        tmp[:, :, i] = np.tensordot(xp[:, :, i:i + len(kz)], kz, axes=(2, 0))
    ref = tmp
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_traced_sigma_matches_concrete(rng):
    import jax

    X = jnp.asarray(rng.standard_normal((9, 9, 9)))
    sig = np.array([1.3, 0.0, 0.7])
    want = np.asarray(gaussian_blur_3d(X, sig))
    got = np.asarray(jax.jit(
        lambda s: gaussian_blur_3d(X, s, max_sigma=4.0))(jnp.asarray(sig)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_volume_resize_shapes(rng):
    X = jnp.asarray(rng.standard_normal((12, 12, 12)))
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    y, aff2 = volume_resize(X, aff, 1.0)
    assert y.shape == (24, 24, 24)
    np.testing.assert_allclose(np.abs(np.diag(aff2)[:3]), 1.0, rtol=1e-6)
