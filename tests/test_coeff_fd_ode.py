"""Tests for the IIR spline prefilter (vs scipy's reference filters), FD
gradients (numpy oracle per ShapeID/misc.py conventions), advection RHS,
and the ODE solvers."""

import numpy as np
import pytest
from scipy.ndimage import spline_filter1d

import jax.numpy as jnp

from brainfm_tpu.ops import (advect_rhs, curl_3d, gradient_b, gradient_c,
                             gradient_f, odeint, spline_coeff,
                             spline_coeff_nd)
from brainfm_tpu.ops.ode import odeint_masked_final


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize("bound,scipy_mode", [("dct1", "mirror"),
                                              ("dct2", "reflect"),
                                              ("dft", "grid-wrap")])
def test_prefilter_matches_scipy(rng, order, bound, scipy_mode):
    x = rng.standard_normal(31)
    ref = spline_filter1d(x, order=order, mode=scipy_mode)
    got = np.asarray(spline_coeff(jnp.asarray(x), bound, order, axis=-1))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_prefilter_nd(rng):
    x = rng.standard_normal((9, 10, 11))
    ref = x
    for ax in range(3):
        ref = spline_filter1d(ref, order=3, mode="reflect", axis=ax)
    got = np.asarray(spline_coeff_nd(jnp.asarray(x), "dct2", 3))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def np_gradient(x, kind):
    """Oracle for ShapeID/misc.py:84-262 one-sided boundary stencils."""
    out = np.zeros(x.shape + (3,))
    for d in range(3):
        xm = np.moveaxis(x, d, 0)
        g = np.zeros_like(xm)
        if kind == "f":
            g[:-1] = xm[1:] - xm[:-1]
            g[-1] = xm[-1] - xm[-2]
        elif kind == "b":
            g[1:] = xm[1:] - xm[:-1]
            g[0] = xm[1] - xm[0]
        else:
            g[1:-1] = (xm[2:] - xm[:-2]) / 2
            g[0] = xm[1] - xm[0]
            g[-1] = xm[-1] - xm[-2]
        out[..., d] = np.moveaxis(g, 0, d)
    return out


@pytest.mark.parametrize("kind,fn", [("f", gradient_f), ("b", gradient_b),
                                     ("c", gradient_c)])
def test_fd_gradients(rng, kind, fn):
    x = rng.standard_normal((6, 7, 8))
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))),
                               np_gradient(x, kind), rtol=1e-5, atol=1e-6)


def test_curl_is_divergence_free(rng):
    a, b, c = [jnp.asarray(rng.standard_normal((16, 16, 16))) for _ in range(3)]
    vx, vy, vz = curl_3d(a, b, c)
    div = (gradient_c(vx)[..., 0] + gradient_c(vy)[..., 1] + gradient_c(vz)[..., 2])
    interior = np.asarray(div)[2:-2, 2:-2, 2:-2]
    assert np.abs(interior).mean() < np.abs(np.asarray(vx)).mean() * 0.5


def test_advection_conserves_mass_interior(rng):
    """Div-free advection approximately preserves total mass away from edges."""
    c0 = np.zeros((24, 24, 24))
    c0[8:16, 8:16, 8:16] = 1.0
    a, b, c = [jnp.asarray(rng.standard_normal((24, 24, 24))) for _ in range(3)]
    vx, vy, vz = curl_3d(a, b, c)

    def f(t, y):
        return advect_rhs(y, vx, vy, vz)

    ts = jnp.arange(5) * 0.1
    ys = odeint(f, jnp.asarray(c0), ts, dt=0.1, method="rk4")
    m0 = float(jnp.sum(ys[0]))
    m1 = float(jnp.sum(ys[-1]))
    assert abs(m1 - m0) / m0 < 0.15


@pytest.mark.parametrize("method", ["euler", "midpoint", "rk4", "dopri5",
                                    "tsit5", "explicit_adams", "fixed_adams",
                                    "adams"])
def test_odeint_exponential_decay(method):
    # the full reference SOLVERS registry (ShapeID/DiffEqs/odeint.py:8-17)
    def f(t, y):
        return -y

    ts = jnp.linspace(0.0, 1.0, 11)
    ys = odeint(f, jnp.ones((4,)), ts, dt=0.1, method=method)
    ref = np.exp(-np.asarray(ts))[:, None] * np.ones((1, 4))
    tol = {"euler": 2e-2, "midpoint": 1e-3, "rk4": 1e-5, "dopri5": 1e-5,
           "tsit5": 1e-5, "explicit_adams": 1e-4, "fixed_adams": 1e-5,
           "adams": 1e-5}[method]
    np.testing.assert_allclose(np.asarray(ys), ref, atol=tol, rtol=tol * 10)


def test_tsit5_matches_dopri5_nonlinear():
    # stiff-ish nonlinear system: both adaptive pairs agree to tight tol
    def f(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.2 * y[1]])

    ts = jnp.linspace(0.0, 4.0, 9)
    y0 = jnp.asarray([1.2, 0.0])
    yd = odeint(f, y0, ts, dt=0.1, method="dopri5", rtol=1e-8, atol=1e-10)
    yt = odeint(f, y0, ts, dt=0.1, method="tsit5", rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yd), atol=1e-6)


def test_odeint_masked_final_matches_truncated():
    def f(t, y):
        return -y

    ts = jnp.arange(10) * 0.1
    full = odeint(f, jnp.ones((3,)), ts[:4], method="rk4")[-1]
    masked = odeint_masked_final(f, jnp.ones((3,)), ts, nt=4, method="rk4")
    np.testing.assert_allclose(np.asarray(masked), np.asarray(full), rtol=1e-6)


def test_odeint_dopri5_differentiable():
    import jax

    def loss(k):
        def f(t, y):
            return -k * y

        ts = jnp.linspace(0.0, 1.0, 3)
        return odeint(f, jnp.ones(()), ts, dt=0.5, method="rk4")[-1]

    g = jax.grad(loss)(1.0)
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-2)


def test_odeint_adjoint_grad_matches_direct():
    """odeint_adjoint (checkpointed) must match odeint in value and grad."""
    import jax
    import jax.numpy as jnp
    from brainfm_tpu.ops.ode import odeint, odeint_adjoint

    def f(t, y):
        return -0.7 * y + jnp.sin(t)

    y0 = jnp.asarray([1.0, 2.0, -0.5])
    t = jnp.linspace(0.0, 1.0, 6)

    def loss_direct(y0):
        return jnp.sum(odeint(f, y0, t, method="rk4")[-1] ** 2)

    def loss_adj(y0):
        return jnp.sum(odeint_adjoint(f, y0, t, method="rk4")[-1] ** 2)

    v1, g1 = jax.value_and_grad(loss_direct)(y0)
    v2, g2 = jax.value_and_grad(loss_adj)(y0)
    assert jnp.allclose(v1, v2, rtol=1e-6)
    assert jnp.allclose(g1, g2, rtol=1e-6)


def test_odeint_adjoint_adaptive_matches_odeint():
    """The checkpointed adaptive path must take the same accepted-step
    sequence as odeint (shared (h, k1) carry across intervals), so the
    two integrators agree in value for dopri5/tsit5 too."""
    from brainfm_tpu.ops.ode import odeint, odeint_adjoint

    def f(t, y):
        return -y + jnp.sin(3.0 * t) * y ** 2

    y0 = jnp.asarray([1.0, 0.5, 0.25])
    ts = jnp.arange(5, dtype=jnp.float32) * 0.3
    for method in ("dopri5", "tsit5"):
        a = odeint(f, y0, ts, dt=0.3, method=method)
        b = odeint_adjoint(f, y0, ts, dt=0.3, method=method)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
