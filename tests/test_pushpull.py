"""Golden tests: grid_pull/push/count/grad vs the reference interpol package
(imported from /root/reference as a torch oracle), over orders x bounds x
dims — the coverage of the reference's own gradcheck suite
(utils/interpol/tests/test_gradcheck_pushpull.py:20-36)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
import torch  # noqa: E402
from utils import interpol as ref_interpol  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from brainfm_tpu.ops import grid_count, grid_grad, grid_pull, grid_push  # noqa: E402

pytestmark = __import__('pytest').mark.slow  # torch-oracle / interpret-mode: slow tier

BOUNDS = ["zero", "replicate", "dct1", "dct2", "dst1", "dst2", "dft"]
ORDERS = [0, 1, 2, 3]


def make_case(rng, dim, shape=5, nvox=7):
    inp = rng.standard_normal([shape] * dim).astype(np.float64)
    grid = (rng.random([nvox, dim]) * (shape + 4) - 2).astype(np.float64)
    return inp, grid


def ref_pull(inp, grid, order, bound, extrapolate=True):
    ti = torch.tensor(inp)[None, None]
    tg = torch.tensor(grid)[None]
    out = ref_interpol.grid_pull(ti, tg, interpolation=order, bound=bound,
                                 extrapolate=extrapolate)
    return out.numpy()[0, 0]


@pytest.mark.parametrize("bound", BOUNDS)
@pytest.mark.parametrize("order", ORDERS)
def test_pull_matches_reference_3d(rng, order, bound):
    inp, grid = make_case(rng, 3)
    ref = ref_pull(inp, grid, order, bound)
    got = np.asarray(grid_pull(jnp.asarray(inp), jnp.asarray(grid),
                               interpolation=order, bound=bound))
    np.testing.assert_allclose(np.ravel(got), np.ravel(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_pull_dims(rng, dim):
    inp, grid = make_case(rng, dim)
    ref = ref_pull(inp, grid, 3, "dct2")
    got = np.asarray(grid_pull(jnp.asarray(inp), jnp.asarray(grid),
                               interpolation=3, bound="dct2"))
    np.testing.assert_allclose(np.ravel(got), np.ravel(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bound", ["zero", "dct2", "dft"])
@pytest.mark.parametrize("order", [1, 3])
def test_push_matches_reference(rng, order, bound):
    dim = 3
    _, grid = make_case(rng, dim)
    vals = rng.standard_normal(grid.shape[:-1]).astype(np.float64)
    ti = torch.tensor(vals)[None, None]
    tg = torch.tensor(grid)[None]
    ref = ref_interpol.grid_push(ti, tg, shape=[5] * dim, interpolation=order,
                                 bound=bound, extrapolate=True).numpy()
    got = np.asarray(grid_push(jnp.asarray(vals), jnp.asarray(grid), shape=[5] * dim,
                               interpolation=order, bound=bound,
                               extrapolate=True))
    ref_ne = ref_interpol.grid_push(ti, tg, shape=[5] * dim, interpolation=order,
                                    bound=bound, extrapolate=False).numpy()
    got_ne = np.asarray(grid_push(jnp.asarray(vals), jnp.asarray(grid),
                                  shape=[5] * dim, interpolation=order,
                                  bound=bound, extrapolate=False))
    np.testing.assert_allclose(np.ravel(got_ne), np.ravel(ref_ne), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.ravel(got), np.ravel(ref), rtol=1e-5, atol=1e-6)


def test_count_matches_reference(rng):
    _, grid = make_case(rng, 3)
    tg = torch.tensor(grid)[None]
    ref = ref_interpol.grid_count(tg, shape=[5] * 3, interpolation=1,
                                  bound="dct2", extrapolate=True).numpy()
    got = np.asarray(grid_count(jnp.asarray(grid), shape=[5] * 3,
                                interpolation=1, bound="dct2"))
    np.testing.assert_allclose(np.ravel(got), np.ravel(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bound", ["zero", "dct2"])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_grad_matches_reference(rng, order, bound):
    inp, grid = make_case(rng, 3)
    ti = torch.tensor(inp)[None, None]
    tg = torch.tensor(grid)[None]
    ref = ref_interpol.grid_grad(ti, tg, interpolation=order,
                                 bound=bound, extrapolate=True).numpy()
    got = np.asarray(grid_grad(jnp.asarray(inp), jnp.asarray(grid),
                               interpolation=order, bound=bound))
    np.testing.assert_allclose(np.ravel(got), np.ravel(ref), rtol=1e-5, atol=1e-6)


def test_pull_push_adjoint(rng):
    """<pull(x), u> == <x, push(u)> — the adjointness the reference encodes in
    its autograd pairing (utils/interpol/autograd.py:125-185)."""
    inp, grid = make_case(rng, 3)
    u = rng.standard_normal(grid.shape[:-1])
    pulled = np.asarray(grid_pull(jnp.asarray(inp), jnp.asarray(grid),
                                  interpolation=3, bound="dct2"))
    pushed = np.asarray(grid_push(jnp.asarray(u), jnp.asarray(grid), shape=inp.shape,
                                  interpolation=3, bound="dct2"))
    np.testing.assert_allclose((pulled * u).sum(), (inp * pushed).sum(), rtol=1e-6)


def test_pull_autodiff_is_push(rng):
    import jax

    inp, grid = make_case(rng, 3)
    u = rng.standard_normal(grid.shape[:-1])

    def f(x):
        return jnp.sum(grid_pull(x, jnp.asarray(grid), interpolation=1,
                                 bound="dct2") * jnp.asarray(u))

    g = np.asarray(jax.grad(f)(jnp.asarray(inp)))
    pushed = np.asarray(grid_push(jnp.asarray(u), jnp.asarray(grid), shape=inp.shape,
                                  interpolation=1, bound="dct2"))
    np.testing.assert_allclose(g, pushed, rtol=1e-5, atol=1e-6)


def test_grid_hess_matches_autodiff(rng):
    """grid_hess (analytic spline second derivatives) must equal the
    jacobian of grid_grad wrt the sampling coordinates."""
    import jax
    from brainfm_tpu.ops.pushpull import grid_grad, grid_hess, grid_pull

    vol = jnp.asarray(rng.random((7, 8, 9)), jnp.float32)
    pts = jnp.asarray(rng.uniform(1.5, 5.5, (5, 3)), jnp.float32)

    H = grid_hess(vol, pts, interpolation=3, bound="dct2")
    assert H.shape == (5, 3, 3)
    # symmetric
    np.testing.assert_allclose(np.asarray(H), np.asarray(
        jnp.swapaxes(H, -1, -2)), atol=1e-5)

    def grad_at(p):
        return grid_grad(vol, p[None], interpolation=3, bound="dct2")[0]

    Href = jax.vmap(jax.jacfwd(grad_at))(pts)
    np.testing.assert_allclose(np.asarray(H), np.asarray(Href), atol=1e-4)


def test_restrict_is_resize_adjoint(rng):
    """<R c, f> == <c, R^T f> for the pure adjoint."""
    from brainfm_tpu.ops.resize import resize_spline, restrict_spline

    coarse = jnp.asarray(rng.random((5, 6, 4)), jnp.float32)
    fine = jnp.asarray(rng.random((10, 12, 8)), jnp.float32)
    up = resize_spline(coarse, shape=(10, 12, 8), prefilter=False)
    down = restrict_spline(fine, shape=(5, 6, 4), reduce_sum=True)
    lhs = float(jnp.sum(up * fine))
    rhs = float(jnp.sum(coarse * down))
    assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)

    # count-normalized restriction of a constant is that constant
    const = restrict_spline(jnp.full((10, 12, 8), 3.0), shape=(5, 6, 4),
                            normalize="count")
    np.testing.assert_allclose(np.asarray(const), 3.0, rtol=1e-5)
    # reference-fullscale normalization is a constant rescale of the pure
    # adjoint (level-preserving only in the large-grid limit — at these toy
    # sizes just pin the scaling relation)
    full = restrict_spline(jnp.full((10, 12, 8), 3.0), shape=(5, 6, 4))
    summed = restrict_spline(jnp.full((10, 12, 8), 3.0), shape=(5, 6, 4),
                             reduce_sum=True)
    fullscale = (9 / 4) * (11 / 5) * (7 / 3)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(summed) / fullscale, rtol=1e-5)


def test_identity_affine_grids_match_reference():
    import torch

    from brainfm_tpu.ops.pushpull import (add_identity_grid, affine_grid,
                                          identity_grid)
    from utils.interpol import api as ref_api

    shape = (4, 5, 6)
    ig = np.asarray(identity_grid(shape))
    rg = ref_api.identity_grid(shape).numpy()
    np.testing.assert_allclose(ig, rg)

    rngl = np.random.default_rng(0)
    disp = rngl.normal(size=(4, 5, 6, 3)).astype(np.float32)
    og = np.asarray(add_identity_grid(jnp.asarray(disp)))
    rr = ref_api.add_identity_grid(torch.from_numpy(disp)).numpy()
    np.testing.assert_allclose(og, rr, atol=1e-6)

    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = rngl.normal(size=(3, 3)) * 0.3 + np.eye(3)
    mat[:3, 3] = rngl.normal(size=3)
    ag = np.asarray(affine_grid(jnp.asarray(mat), shape))
    ra = ref_api.affine_grid(torch.from_numpy(mat), shape).numpy()
    np.testing.assert_allclose(ag, ra, atol=1e-5)
