"""Separable resampling as MXU matmuls.

Axis-aligned resampling (zoom, restore-to-grid, gaussian blur) applies an
independent 1-D linear operator per axis. The reference implements these as
per-slice Python loops (myzoom_torch, Generator/utils.py:239-246) or gather
chains; on TPU the fastest formulation is three dense matmuls — each axis's
(n_out x n_in) interpolation matrix has only 2 (linear) or O(kernel) (blur)
nonzeros per row, but the MXU's systolic throughput makes the dense product
cheaper than any gather. Weight matrices are built on the fly from traced
coordinates, so random effective sizes stay jit-static.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_resample_matrix(coords, n_in: int, upper=None, mask_oob: bool = False):
    """(n_out, n_in) row-stochastic linear interpolation matrix sampling at
    `coords` (traced). `upper`: traced effective last valid index (defaults
    n_in-1) — rows clamp there, supporting static buffers with traced
    effective extents. `mask_oob=True` zeroes rows whose coordinate falls
    outside the strict (0, upper] bound — the fast_3D_interp_torch masking
    convention (Generator/utils.py:141)."""
    up = jnp.asarray(n_in - 1 if upper is None else upper, jnp.float32)
    ok = (coords > 0) & (coords <= up) if mask_oob else None
    c = jnp.clip(coords, 0.0, up)
    f = jnp.floor(c)
    w = (c - f)[:, None]
    cols = jnp.arange(n_in)[None, :]
    fcol = f[:, None]
    lo = (cols == fcol).astype(jnp.float32)
    hi = (cols == jnp.minimum(fcol + 1, up)).astype(jnp.float32)
    W = lo * (1.0 - w) + hi * w
    if mask_oob:
        W = W * ok[:, None]
    return W


def gaussian_matrix(sigma, n: int, truncate: float = 3.0):
    """(n, n) gaussian blur matrix with zero ('SAME') padding semantics and
    support masked at ceil(truncate*sigma) — matches ops/blur.py kernels."""
    idx = jnp.arange(n, dtype=jnp.float32)
    d = idx[:, None] - idx[None, :]
    safe = jnp.maximum(sigma, 1e-6)
    g = jnp.exp(-(d / safe) ** 2 / 2.0)
    support = jnp.ceil(truncate * sigma)
    g = jnp.where(jnp.abs(d) <= support, g, 0.0)
    # normalize by the UNPADDED kernel sum (zero padding loses mass at edges,
    # same as conv with 'SAME' zero padding)
    k = jnp.arange(-n + 1, n, dtype=jnp.float32)
    gk = jnp.exp(-(k / safe) ** 2 / 2.0)
    gk = jnp.where(jnp.abs(k) <= support, gk, 0.0)
    norm = jnp.sum(gk)
    g = g / norm
    eye = (d == 0).astype(jnp.float32)
    return jnp.where(sigma > 0, g, eye)


def apply_axis_matrix(x, W, axis: int):
    """Contract axis `axis` of x with (n_out, n_in) W on the MXU.
    Accumulates at promote(input, fp32): bf16 inputs get fp32 accumulation,
    and f64 inputs (x64 parity tests) are NOT silently downcast."""
    x = jnp.moveaxis(x, axis, -1)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    out = jnp.einsum("...i,oi->...o", x, W, preferred_element_type=acc)
    return jnp.moveaxis(out, -1, axis)


def separable_resample(x, coords_per_axis):
    """Resample (D,H,W[,C]) at per-axis coordinate vectors via 3 matmuls —
    the MXU path for all zoom/restore ops. Preserves a floating input's
    dtype (like the gather path it replaced); accumulation runs at fp32+."""
    orig = x.dtype
    for ax, coords in enumerate(coords_per_axis):
        W = linear_resample_matrix(coords, x.shape[ax])
        x = apply_axis_matrix(x, W, ax)
    return x.astype(orig) if jnp.issubdtype(orig, jnp.floating) else x


def separable_blur_matmul(x, sigmas, truncate: float = 3.0):
    """Gaussian blur of (D,H,W) via 3 MXU matmuls (traced sigmas ok)."""
    for ax in range(3):
        W = gaussian_matrix(sigmas[ax], x.shape[ax], truncate)
        x = apply_axis_matrix(x, W, ax)
    return x
