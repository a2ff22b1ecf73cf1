"""ODE integration for the pathology advection flow.

Capability parity with the reference's vendored torchdiffeq fork
(/root/reference/ShapeID/DiffEqs/odeint.py:8-17 SOLVERS, fixed_grid.py,
dopri5.py, tsit5.py, fixed_adams.py, adams.py, adjoint.py): the full
SOLVERS registry — euler / midpoint / rk4 fixed steppers, adaptive
Dormand-Prince RK45 ('dopri5', the generator's default,
cfgs/generator/default.yaml:117), adaptive Tsitouras RK45 ('tsit5'),
Adams-Bashforth 4 ('explicit_adams') and Adams-Bashforth-Moulton
predictor-corrector ('fixed_adams') — and gradient support. 'adams'
(the reference's ADAPTIVE variable-coefficient Adams) routes to the
adaptive dopri5 controller so rtol/atol are honored, rather than to the
fixed-step corrector which would silently ignore them.

TPU design: fixed-grid methods run under `lax.scan` (the Adams family
carries its derivative history in the scan carry, RK4 startup); adaptive
methods run a bounded `lax.while_loop` with PI step-size control per
output interval, generalized over the Butcher tableau. Gradients come
from JAX AD through the solver (checkpointed scan), which replaces the
reference's hand-written adjoint method (adjoint.py:8-132) — same
memory-frugality goal, compiler-managed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _f32(x):
    # host-side f32 constants: importing this module must NOT initialize
    # the XLA backend (import-time jnp.array does; it broke
    # jax.distributed.initialize in scripts/train.py --mesh). f32 matches
    # what import-time jnp.array produced (x64 is never on at import).
    return np.asarray(x, np.float32)


_DOPRI5_C = _f32([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI5_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DOPRI5_B = _f32([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DOPRI5_BERR = _DOPRI5_B - _f32(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40])


# Tsitouras 2011 5(4) pair (public tableau; FSAL: row 7 equals b)
_TSIT5_C = _f32([0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0])
_TSIT5_A = [
    [],
    [0.161],
    [-0.008480655492356989, 0.335480655492357],
    [2.8971530571054935, -6.359448489975075, 4.3622954328695815],
    [5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525],
    [5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383],
    [0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774],
]
_TSIT5_B = _f32([0.09646076681806523, 0.01, 0.4798896504144996,
                      1.379008574103742, -3.290069515436081,
                      2.324710524099774, 0.0])
_TSIT5_BERR = _f32([0.00178001105222577714, 0.0008164344596567469,
                         -0.007880878010261995, 0.1447110071732629,
                         -0.5823571654525552, 0.45808210592918697,
                         -1.0 / 66.0])

_TABLEAUS = {}


def _euler_step(func, t, dt, y):
    return y + dt * func(t, y)


def _midpoint_step(func, t, dt, y):
    y_mid = y + func(t, y) * (dt / 2)
    return y + dt * func(t + dt / 2, y_mid)


def _rk4_step(func, t, dt, y):
    # "3/8" alternative Runge-Kutta used by the reference
    # (rk_common.rk4_alt_step_func)
    k1 = func(t, y)
    k2 = func(t + dt / 3, y + dt * k1 / 3)
    k3 = func(t + dt * 2 / 3, y + dt * (k2 - k1 / 3))
    k4 = func(t + dt, y + dt * (k1 - k2 + k3))
    return y + dt * (k1 + 3 * (k2 + k3) + k4) / 8


_FIXED_STEPS = {"euler": _euler_step, "midpoint": _midpoint_step, "rk4": _rk4_step}


def _fixed_grid_integrate(func, y0, t, method):
    step = _FIXED_STEPS[method]

    def body(y, t_pair):
        t0, t1 = t_pair
        y1 = step(func, t0, t1 - t0, y)
        return y1, y1

    pairs = (t[:-1], t[1:])
    _, ys = jax.lax.scan(body, y0, pairs)
    return jnp.concatenate([y0[None], ys], axis=0)


def _is_fsal(tab):
    """First-Same-As-Last: the final stage's A row equals b (so its k is
    the next step's first stage). True for dopri5 and tsit5."""
    C, A, B, BERR = tab
    last = A[-1]
    return (len(last) == len(B) - 1
            and np.allclose(np.asarray(last, np.float64), B[:-1]))


def _adaptive_interval(func, tab, y0, t0, t1, rtol, atol, dt0,
                       max_steps=256, active=None, h_in=None, k1_in=None,
                       return_carry=False):
    """Advance y from t0 to t1 adaptively (bounded while_loop) with the
    embedded RK pair `tab` = (C, A, B, BERR).

    `active` (optional traced bool) short-circuits the loop entirely —
    the masked-final integrator uses it so intervals beyond the traced
    nt cost one predicate check instead of a full adaptive solve.

    FSAL + warm start: for FSAL tableaus (dopri5/tsit5) the last stage's
    derivative IS the next step's first stage, so accepted steps cost
    n_stage-1 evaluations; `k1_in`/`h_in` carry that stage and the
    controller's step size across output intervals (torchdiffeq likewise
    integrates continuously through output times rather than restarting
    the controller per interval, ShapeID/DiffEqs/solvers.py). With
    `return_carry` the final (y, h, k1) is returned for the caller's scan
    carry; rejected steps leave (t, y) unchanged so the carried k1 stays
    exact."""
    C, A, B, BERR = tab
    n_stage = len(C)
    fsal = _is_fsal(tab)

    def err_norm(err, y_old, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def cond(state):
        t, y, h, k1, nsteps = state
        ok = (t < t1 - 1e-12) & (nsteps < max_steps)
        if active is not None:
            ok = ok & active
        return ok

    def body(state):
        t, y, h, k1, nsteps = state
        h = jnp.minimum(h, t1 - t)
        ks = [k1]
        yi = y
        for i in range(1, n_stage):
            yi = y
            for j, a in enumerate(A[i]):
                yi = yi + h * a * ks[j]
            ks.append(func(t + h * C[i], yi))
        if fsal:
            y_new = yi   # last stage's input: A[-1] == B[:-1]
        else:
            y_new = y + h * jnp.tensordot(B, jnp.stack(ks), axes=1)
        err = h * jnp.tensordot(BERR, jnp.stack(ks), axes=1)
        ratio = err_norm(err, y, y_new)
        accept = ratio <= 1.0
        # PI controller
        factor = jnp.clip(0.9 * (jnp.maximum(ratio, 1e-10) ** -0.2), 0.2, 10.0)
        h_next = h * factor
        k1_acc = ks[-1] if fsal else func(t + h, y_new)
        t = jnp.where(accept, t + h, t)
        y = jnp.where(accept, y_new, y)
        k1 = jnp.where(accept, k1_acc, k1)
        return (t, y, h_next, k1, nsteps + 1)

    h0 = h_in if h_in is not None else jnp.minimum(dt0, t1 - t0)
    k1_0 = k1_in if k1_in is not None else func(t0, y0)
    _, y, h, k1, _ = jax.lax.while_loop(cond, body, (t0, y0, h0, k1_0, 0))
    if return_carry:
        return y, h, k1
    return y


_TABLEAUS.update({
    "dopri5": (_DOPRI5_C, _DOPRI5_A, _DOPRI5_B, _DOPRI5_BERR),
    "tsit5": (_TSIT5_C, _TSIT5_A, _TSIT5_B, _TSIT5_BERR),
})

# Adams-Bashforth 4 / Adams-Moulton 4 coefficients (newest first)
_AB4 = _f32([55.0, -59.0, 37.0, -9.0]) / _f32(24.0)
_AM4 = _f32([9.0, 19.0, -5.0, 1.0]) / _f32(24.0)


def _adams_integrate(func, y0, t, corrector: bool):
    """Fixed-step Adams-Bashforth(-Moulton) order 4 with RK4 startup
    (parity: ShapeID/DiffEqs/fixed_adams.py; the scan carries the last
    four derivative evaluations)."""
    n = t.shape[0]
    if n < 5:
        return _fixed_grid_integrate(func, y0, t,
                                     "rk4")  # too short for order 4
    # startup: 3 RK4 steps
    ys = [y0]
    fs = [func(t[0], y0)]
    for i in range(3):
        y_next = _rk4_step(func, t[i], t[i + 1] - t[i], ys[-1])
        ys.append(y_next)
        fs.append(func(t[i + 1], y_next))
    hist = jnp.stack([fs[3], fs[2], fs[1], fs[0]])   # newest first

    def body(carry, t_pair):
        y, hist = carry
        t0, t1 = t_pair
        dt = t1 - t0
        y_pred = y + dt * jnp.tensordot(_AB4, hist, axes=1)
        if corrector:
            f_new = func(t1, y_pred)
            hist_c = jnp.concatenate([f_new[None], hist[:3]])
            y_new = y + dt * jnp.tensordot(_AM4, hist_c, axes=1)
            f_new = func(t1, y_new)
        else:
            y_new = y_pred
            f_new = func(t1, y_new)
        hist = jnp.concatenate([f_new[None], hist[:3]])
        return (y_new, hist), y_new

    pairs = (t[3:-1], t[4:])
    (_, _), ys_tail = jax.lax.scan(body, (ys[3], hist), pairs)
    return jnp.concatenate([jnp.stack(ys), ys_tail], axis=0)


def odeint(func, y0, t, dt=None, rtol=1e-7, atol=1e-9, method=None):
    """Integrate dy/dt = func(t, y) through output times `t`
    (API parity: ShapeID/DiffEqs/odeint.py:20).

    t: (T,) array, static length. Returns (T, *y0.shape).
    """
    method = method or "dopri5"
    t = jnp.asarray(t, y0.dtype)
    if method in _FIXED_STEPS:
        return _fixed_grid_integrate(func, y0, t, method)
    if method == "adams":
        # reference 'adams' is the ADAPTIVE VariableCoefficientAdamsBashforth
        # (ShapeID/DiffEqs/adams.py) honoring rtol/atol; the fixed-step AM4
        # corrector would silently ignore the tolerances on coarse output
        # grids, so route to the adaptive dopri5 controller instead
        # (documented capability substitution: same accuracy contract,
        # different integrator family)
        method = "dopri5"
    elif method in ("explicit_adams", "fixed_adams"):
        return _adams_integrate(func, y0, t,
                                corrector=(method != "explicit_adams"))
    if method in _TABLEAUS:
        dt0 = jnp.asarray(dt if dt is not None else (t[1] - t[0]), y0.dtype)
        tab = _TABLEAUS[method]
        k1_0 = func(t[0], y0)

        def body(carry, t_pair):
            y, h, k1 = carry
            t0, t1 = t_pair
            y1, h1, k11 = _adaptive_interval(func, tab, y, t0, t1, rtol,
                                             atol, dt0, h_in=h, k1_in=k1,
                                             return_carry=True)
            return (y1, h1, k11), y1

        _, ys = jax.lax.scan(body, (y0, dt0, k1_0), (t[:-1], t[1:]))
        return jnp.concatenate([y0[None], ys], axis=0)
    raise ValueError(f"unsupported method {method}")


def odeint_adjoint(func, y0, t, dt=None, rtol=1e-7, atol=1e-9, method=None):
    """Memory-lean differentiable odeint (API parity:
    ShapeID/DiffEqs/adjoint.py:8-132 `odeint_adjoint`).

    The reference implements the continuous adjoint to avoid storing the
    forward trajectory; in JAX the same memory profile falls out of
    rematerialization — `jax.checkpoint` on the interval step makes the
    backward pass re-integrate each interval instead of caching its
    internal RK stages. For the generator's nt<=10 advection this matches
    the adjoint's O(1)-per-interval activation memory without a custom VJP.

    Reverse-mode differentiation requires a fixed-step method (euler/
    midpoint/rk4): the adaptive dopri5 interval uses `lax.while_loop`,
    which JAX cannot reverse-differentiate (use method='rk4' with a finer
    grid instead — the configs' dt=0.1, nt<=10 regime is well inside rk4
    accuracy).
    """
    method = method or "dopri5"
    t = jnp.asarray(t, y0.dtype)
    if method in _FIXED_STEPS:
        step = _FIXED_STEPS[method]
        ck = jax.checkpoint(lambda y, t0, t1: step(func, t0, t1 - t0, y))

        def body(y, t_pair):
            y1 = ck(y, *t_pair)
            return y1, y1

        _, ys = jax.lax.scan(body, y0, (t[:-1], t[1:]))
        return jnp.concatenate([y0[None], ys], axis=0)
    if method in ("explicit_adams", "fixed_adams", "adams"):
        return _adams_integrate(func, y0, t,
                                corrector=(method != "explicit_adams"))
    if method in _TABLEAUS:
        dt0 = jnp.asarray(dt if dt is not None else (t[1] - t[0]), y0.dtype)
        tab = _TABLEAUS[method]
        k1_0 = func(t[0], y0)
        ck = jax.checkpoint(lambda y, h, k1, t0, t1: _adaptive_interval(
            func, tab, y, t0, t1, rtol, atol, dt0, h_in=h, k1_in=k1,
            return_carry=True))

        def body(carry, t_pair):
            y1, h1, k11 = ck(*carry, *t_pair)
            return (y1, h1, k11), y1

        _, ys = jax.lax.scan(body, (y0, dt0, k1_0), (t[:-1], t[1:]))
        return jnp.concatenate([y0[None], ys], axis=0)
    raise ValueError(f"unsupported method {method}")


def odeint_masked_final(func, y0, t, nt, dt=None, method="rk4",
                        rtol=1e-7, atol=1e-9):
    """Integrate through at most len(t) grid points but only the first `nt`
    (traced) intervals take effect; returns y(t[nt-1]).

    This is the jit-safe form of the generator's `t[:nt]` truncation
    (Generator/utils.py:552-554) — static trip count, masked updates.
    Supports the full method registry the generator config offers
    (cfgs/generator/default.yaml integ_method choices; reference
    ShapeID/DiffEqs/odeint.py:8-17): fixed steppers run masked under
    `lax.scan`; adaptive dopri5/tsit5 run a bounded `lax.while_loop` per
    interval whose `active` predicate folds in the nt mask, so intervals
    beyond nt cost one predicate check. 'adams' and the fixed Adams
    variants route to the adaptive dopri5 controller (the scan-carried
    derivative history of _adams_integrate cannot be masked per-interval;
    dopri5 at the same rtol/atol meets or beats its accuracy — documented
    substitution, PARITY.md).
    """
    t = jnp.asarray(t, y0.dtype)
    if method in ("adams", "explicit_adams", "fixed_adams"):
        method = "dopri5"
    if method in _TABLEAUS:
        tab = _TABLEAUS[method]
        dt0 = jnp.asarray(dt if dt is not None else (t[1] - t[0]), y0.dtype)
        k1_0 = func(t[0], y0)

        def abody(carry, x):
            y, h, k1, i = carry
            t0, t1 = x
            act = i < nt - 1
            # inactive intervals short-circuit the while_loop, returning
            # the carry unchanged — (y, h, k1) stay exact for free
            y1, h1, k11 = _adaptive_interval(func, tab, y, t0, t1, rtol,
                                             atol, dt0, active=act,
                                             h_in=h, k1_in=k1,
                                             return_carry=True)
            y = jnp.where(act, y1, y)
            return (y, h1, k11, i + 1), None

        (y, _, _, _), _ = jax.lax.scan(abody, (y0, dt0, k1_0, 0),
                                       (t[:-1], t[1:]))
        return y
    if method not in _FIXED_STEPS:
        raise ValueError(f"unsupported method {method}")
    step = _FIXED_STEPS[method]

    def body(carry, x):
        y, i = carry
        t0, t1 = x
        y1 = step(func, t0, t1 - t0, y)
        y = jnp.where(i < nt - 1, y1, y)
        return (y, i + 1), None

    (y, _), _ = jax.lax.scan(body, (y0, 0), (t[:-1], t[1:]))
    return y
