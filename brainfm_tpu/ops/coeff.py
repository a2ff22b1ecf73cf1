"""Interpolating B-spline coefficients (IIR prefilter).

Parity with the reference prefilter (/root/reference/utils/interpol/coeff.py),
itself the standard Thevenaz/Unser recursive filter with boundary-specific
initial conditions (dct1, dct2, dft supported — matching the reference's
CoeffBound coverage). The sequential recursion is expressed as `lax.scan`
along the filtered axis with all other axes batched in lanes — the idiomatic
XLA form of an IIR filter.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .bounds import bound_code


def get_poles(order: int):
    if order in (0, 1):
        return []
    if order == 2:
        return [math.sqrt(8.0) - 3.0]
    if order == 3:
        return [math.sqrt(3.0) - 2.0]
    if order == 4:
        return [math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
                math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0]
    if order == 5:
        return [math.sqrt(67.5 - math.sqrt(4436.25)) + math.sqrt(26.25) - 6.5,
                math.sqrt(67.5 + math.sqrt(4436.25)) - math.sqrt(26.25) - 6.5]
    if order == 6:
        return [-0.488294589303044755130118038883789062112279161239377608394,
                -0.081679271076237512597937765737059080653379610398148178525368,
                -0.00141415180832581775108724397655859252786416905534669851652709]
    if order == 7:
        return [-0.5352804307964381655424037816816460718339231523426924148812,
                -0.122554615192326690515272264359357343605486549427295558490763,
                -0.0091486948096082769285930216516478534156925639545994482648003]
    raise NotImplementedError(order)


def get_gain(poles):
    lam = 1.0
    for p in poles:
        lam *= (1.0 - p) * (1.0 - 1.0 / p)
    return lam


def _initial(inp0, pole: float, code: int):
    """Causal initial condition c+[0]. inp0: (n, ...) with filter axis first."""
    n = inp0.shape[0]
    max_iter = int(math.ceil(-30.0 / math.log(abs(pole))))
    if code in (0, 2):  # zero / dct1 (mirror)
        if max_iter < n:
            k = jnp.arange(1, max_iter, dtype=inp0.dtype)
            pw = pole ** k
            return inp0[0] + jnp.tensordot(pw, inp0[1:max_iter], axes=(0, 0))
        polen = pole ** (n - 1)
        k = jnp.arange(1, n - 1, dtype=inp0.dtype)
        pw = pole ** k + (polen * polen) / (pole ** k)
        out = inp0[0] + polen * inp0[-1] + jnp.tensordot(pw, inp0[1:-1], axes=(0, 0))
        return out / (1.0 - pole ** (2 * (n - 1)))
    if code in (1, 3):  # replicate / dct2 (reflect) — scipy convention
        polen = pole ** n
        pole_last = polen * (1.0 + 1.0 / (pole + polen * polen))
        k1 = jnp.arange(1, n - 1, dtype=inp0.dtype)
        k2 = jnp.arange(2 * n - 2, n, -1, dtype=inp0.dtype)
        pw = pole ** k1 + pole ** k2
        out = inp0[0] + pole_last * inp0[-1] + jnp.tensordot(pw, inp0[1:-1], axes=(0, 0))
        out = out * (pole / (1.0 - polen * polen))
        return out + inp0[0]
    if code == 6:  # dft (wrap)
        m = min(max_iter, n)
        k = jnp.arange(1, m, dtype=inp0.dtype)
        pw = (pole ** k)[::-1]
        out = inp0[0] + jnp.tensordot(pw, inp0[1 - m:], axes=(0, 0))
        return out / (1.0 - pole ** m)
    raise NotImplementedError(code)


def _final(cplus, pole: float, code: int):
    """Anticausal initial condition c-[n-1]. cplus: (n, ...) causal output."""
    n = cplus.shape[0]
    if code in (0, 2):  # dct1
        return (pole / (pole * pole - 1.0)) * (pole * cplus[-2] + cplus[-1])
    if code in (1, 3):  # dct2
        return cplus[-1] * (pole / (pole - 1.0))
    if code == 6:  # dft
        max_iter = min(int(math.ceil(-30.0 / math.log(abs(pole)))), n)
        k = jnp.arange(2, max_iter + 1, dtype=cplus.dtype)
        pw = pole ** k
        out = pole * cplus[-1] + jnp.tensordot(pw, cplus[: max_iter - 1], axes=(0, 0))
        return out / (pole ** max_iter - 1.0)
    raise NotImplementedError(code)


def _filter_axis0(x, poles, code: int):
    n = x.shape[0]
    if n == 1:
        return x
    x = x * get_gain(poles)
    for pole in poles:
        c0 = _initial(x, pole, code)

        def causal(carry, xi):
            c = xi + pole * carry
            return c, c

        _, rest = jax.lax.scan(causal, c0, x[1:])
        cplus = jnp.concatenate([c0[None], rest], axis=0)

        clast = _final(cplus, pole, code)

        def anticausal(carry, ci):
            c = pole * (carry - ci)
            return c, c

        _, rest_r = jax.lax.scan(anticausal, clast, cplus[:-1], reverse=True)
        x = jnp.concatenate([rest_r, clast[None]], axis=0)
    return x


def spline_coeff(inp, bound, order: int, axis: int = -1):
    """Prefilter along one axis (parity: coeff.py:285-311)."""
    if order in (0, 1):
        return inp
    code = bound_code(bound)
    poles = get_poles(order)
    x = jnp.moveaxis(inp, axis, 0)
    x = _filter_axis0(x, poles, code)
    return jnp.moveaxis(x, 0, axis)


def spline_coeff_nd(inp, bound, order, ndim: int | None = None):
    """Prefilter along the last `ndim` axes (parity: coeff.py:314-344)."""
    if ndim is None:
        ndim = inp.ndim
    bounds = bound if isinstance(bound, (list, tuple)) else [bound] * ndim
    orders = order if isinstance(order, (list, tuple)) else [order] * ndim
    for d, (b, o) in enumerate(zip(bounds, orders)):
        inp = spline_coeff(inp, b, o, axis=-ndim + d)
    return inp
