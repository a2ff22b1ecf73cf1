"""The separable-matmul zoom must match the explicit 8-corner gather
formulation it replaced (bit-level semantics: center-aligned coords,
clamped edges, traced effective extents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.synth.deform import zoom_from_effective


def _zoom_gather_oracle(field, eff_sizes, out_sizes):
    """The original gather implementation (pre-matmul), kept as the oracle."""
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    coords = []
    for d, out in enumerate(out_sizes):
        eff = eff_sizes[d]
        factor = out / eff
        delta = (1.0 - factor) / (2.0 * factor)
        v = delta + jnp.arange(out) / factor
        coords.append(jnp.clip(v, 0.0, eff - 1.0))
    ii, jj, kk = jnp.meshgrid(*coords, indexing="ij")
    D, H, W, C = field.shape
    flat = field.reshape(-1, C)
    lims = [eff_sizes[0] - 1, eff_sizes[1] - 1, eff_sizes[2] - 1]
    fx = jnp.floor(ii).astype(jnp.int32)
    fy = jnp.floor(jj).astype(jnp.int32)
    fz = jnp.floor(kk).astype(jnp.int32)
    cx = jnp.minimum(fx + 1, lims[0].astype(jnp.int32))
    cy = jnp.minimum(fy + 1, lims[1].astype(jnp.int32))
    cz = jnp.minimum(fz + 1, lims[2].astype(jnp.int32))
    wcx = (ii - fx)[..., None]
    wcy = (jj - fy)[..., None]
    wcz = (kk - fz)[..., None]
    wfx, wfy, wfz = 1 - wcx, 1 - wcy, 1 - wcz

    def g(a, b, c):
        return jnp.take(flat, (a * H + b) * W + c, axis=0)

    out = ((g(fx, fy, fz) * wfx + g(cx, fy, fz) * wcx) * wfy
           + (g(fx, cy, fz) * wfx + g(cx, cy, fz) * wcx) * wcy) * wfz + \
          ((g(fx, fy, cz) * wfx + g(cx, fy, cz) * wcx) * wfy
           + (g(fx, cy, cz) * wfx + g(cx, cy, cz) * wcx) * wcy) * wcz
    if squeeze:
        out = out[..., 0]
    return out


@pytest.mark.parametrize("eff", [(5.0, 7.0, 9.0), (12.0, 3.0, 12.0),
                                 (2.0, 2.0, 2.0)])
def test_matmul_zoom_matches_gather(eff):
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.random((12, 12, 12)), jnp.float32)
    effs = jnp.asarray(eff, jnp.float32)
    out_sizes = (20, 16, 24)
    a = zoom_from_effective(field, effs, out_sizes)
    b = _zoom_gather_oracle(field, effs, out_sizes)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_matmul_zoom_channels_and_grad():
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32)
    effs = jnp.asarray([6.0, 8.0, 4.0], jnp.float32)
    a = zoom_from_effective(field, effs, (12, 12, 12))
    b = _zoom_gather_oracle(field, effs, (12, 12, 12))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    g = jax.grad(lambda f: jnp.sum(zoom_from_effective(f, effs, (12, 12, 12))
                                   ** 2))(field)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("newsize", [(20, 16, 24), (8, 8, 8), (12, 12, 12)])
def test_myzoom_matches_gather_oracle(newsize):
    """ops.resize.myzoom (now 3 MXU matmuls at highest precision) must match
    the trilinear-gather formulation it replaced; myzoom's convention is
    clamp-to-[0, n_in-1] on full (not effective) extents, i.e. the oracle
    with eff_sizes == input shape."""
    from brainfm_tpu.ops.resize import myzoom

    rng = np.random.default_rng(2)
    field = jnp.asarray(rng.random((12, 12, 12)), jnp.float32)
    factor = tuple(o / 12 for o in newsize)
    a = myzoom(field, factor, newsize=newsize)
    b = _zoom_gather_oracle(field, jnp.asarray([12.0, 12.0, 12.0]), newsize)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    if newsize == (12, 12, 12):
        # unit factor short-circuits to the input unchanged
        assert a is field


def test_myzoom_channels():
    from brainfm_tpu.ops.resize import myzoom

    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.random((9, 7, 11, 2)), jnp.float32)
    a = myzoom(field, (14 / 9, 10 / 7, 6 / 11), newsize=(14, 10, 6))
    b = _zoom_gather_oracle(field, jnp.asarray([9.0, 7.0, 11.0]), (14, 10, 6))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
