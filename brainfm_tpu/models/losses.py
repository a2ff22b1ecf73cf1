"""Loss primitives.

Parity with /root/reference/Trainer/models/losses.py:12-142: weighted
l1/l2, gaussian/laplace NLL (uncertainty heads), forward-difference gradient
loss, smoothness, and determinant-of-Hessian regularizer. Channels-last:
images are (..., D, H, W, C); spatial axes are the three before the channel.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(outputs, targets, weights=1.0):
    return jnp.mean(jnp.abs(outputs - targets) * weights)


def l2_loss(outputs, targets, weights=1.0):
    return jnp.mean((outputs - targets) ** 2 * weights)


def gaussian_loss(mu, log_sigma, targets, weights=1.0):
    variance = jnp.exp(log_sigma)
    nll = 0.5 * jnp.log(2 * jnp.pi * variance) + 0.5 * (targets - mu) ** 2 / variance
    return jnp.mean(nll * weights)


def laplace_loss(mu, log_b, targets, weights=1.0):
    b = jnp.exp(log_b)
    nll = jnp.log(2 * b) + jnp.abs(targets - mu) / b
    return jnp.mean(nll * weights)


def _fwd_diff(x):
    """Forward differences along the 3 spatial axes with zeroed last row
    (parity: losses.py:40-50; reference layout (b,c,s,r,c) -> here
    (..., s,r,c,chan): spatial axes are -4,-3,-2)."""
    pad_z = [(0, 0)] * x.ndim
    outs = []
    for ax in (-4, -3, -2):
        shifted = jnp.roll(x, -1, axis=ax)
        d = shifted - x
        # zero the final slice along ax
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(x.shape[ax] - 1, x.shape[ax])
        d = d.at[tuple(idx)].set(0.0)
        outs.append(d)
    del pad_z
    return outs  # dz(slice axis), dy(row), dx(col) per reference naming


def gradient_loss(inp, target, weights=1.0, mode="l1"):
    """(parity: GradientLoss.forward, losses.py:61-72)"""
    fn = l1_loss if mode == "l1" else l2_loss
    di = _fwd_diff(inp)
    dt = _fwd_diff(target)
    return (fn(di[0], dt[0], weights) + fn(di[1], dt[1], weights)
            + fn(di[2], dt[2], weights))


def smoothness_loss(inp, mode="l2"):
    """(parity: SmoothnessLoss, losses.py:75-105)"""
    d = _fwd_diff(inp)
    if mode == "l1":
        return jnp.mean(jnp.abs(d[0]) + jnp.abs(d[1]) + jnp.abs(d[2]))
    return jnp.mean(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)


def hessian_loss(inp, mode="l2"):
    """Det-of-Hessian (parity: HessianLoss, losses.py:108-142 — including its
    reuse of the mixed partials from the later gradient calls)."""
    dx, dy, dz = _fwd_diff(inp)
    ddxx, ddxy, ddxz = _fwd_diff(dx)
    ddxy, ddyy, ddyz = _fwd_diff(dy)
    ddxz, ddyz, ddzz = _fwd_diff(dz)
    det = (ddxx * (ddyy * ddzz - ddyz ** 2)
           - ddxy * (ddxy * ddzz - ddxz * ddyz)
           + ddxz * (ddxy * ddyz - ddxz * ddyy))
    if mode == "l1":
        return jnp.sum(jnp.abs(det))
    return jnp.sum(det ** 2)
