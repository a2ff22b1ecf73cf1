"""Finite-difference gradients and curl.

Parity with the reference stencils (/root/reference/ShapeID/misc.py:66-262):
forward/backward/central differences with one-sided boundary rows, and the
3-D curl (`stream_3D`) used to build divergence-free velocities. Implemented
as shifted-slice arithmetic over the last `ndim` axes — pure XLA, any batch
leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_diff(x, axis: int, kind: str):
    n = x.shape[axis]

    def sl(a, b):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        return x[tuple(idx)]

    if kind == "f":  # forward interior, backward at the top edge
        interior = sl(1, None) - sl(0, -1)               # length n-1 -> rows 0..n-2
        top = sl(n - 1, None) - sl(n - 2, n - 1)         # row n-1
        return jnp.concatenate([interior, top], axis=axis)
    if kind == "b":  # backward interior, forward at the bottom edge
        bottom = sl(1, 2) - sl(0, 1)                     # row 0
        interior = sl(1, None) - sl(0, -1)               # rows 1..n-1
        return jnp.concatenate([bottom, interior], axis=axis)
    if kind == "c":  # central interior, one-sided edges
        bottom = sl(1, 2) - sl(0, 1)
        interior = (sl(2, None) - sl(0, -2)) / 2.0
        top = sl(n - 1, None) - sl(n - 2, n - 1)
        return jnp.concatenate([bottom, interior, top], axis=axis)
    raise ValueError(kind)


def _gradient(x, kind: str, ndim: int = 3, spacing=(1.0, 1.0, 1.0)):
    comps = []
    for d in range(ndim):
        axis = x.ndim - ndim + d
        comps.append(_axis_diff(x, axis, kind) / spacing[d])
    return jnp.stack(comps, axis=-1)


def gradient_f(x, ndim: int = 3, spacing=(1.0, 1.0, 1.0)):
    """(parity: ShapeID/misc.py:84)"""
    return _gradient(x, "f", ndim, spacing)


def gradient_b(x, ndim: int = 3, spacing=(1.0, 1.0, 1.0)):
    """(parity: ShapeID/misc.py:141)"""
    return _gradient(x, "b", ndim, spacing)


def gradient_c(x, ndim: int = 3, spacing=(1.0, 1.0, 1.0)):
    """(parity: ShapeID/misc.py:198)"""
    return _gradient(x, "c", ndim, spacing)


def curl_3d(phi_a, phi_b, phi_c, spacing=(1.0, 1.0, 1.0)):
    """Curl of a 3-component potential -> divergence-free velocity
    (parity: `stream_3D`, ShapeID/misc.py:66-80)."""
    da = gradient_c(phi_a, 3, spacing)
    db = gradient_c(phi_b, 3, spacing)
    dc = gradient_c(phi_c, 3, spacing)
    vx = dc[..., 1] - db[..., 2]
    vy = da[..., 2] - dc[..., 0]
    vz = db[..., 0] - da[..., 1]
    return vx, vy, vz
