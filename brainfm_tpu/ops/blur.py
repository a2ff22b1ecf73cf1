"""Separable 3-D Gaussian blur.

Parity with both reference conventions:
* generator blur — kernel half-width ceil(3*sigma)
  (/root/reference/Generator/utils.py:74-94)
* resize anti-aliasing — half-width ceil(2.5*sigma)
  (utils/misc.py:1117-1160)

TPU design: the reference builds data-dependent kernel lengths per random
sigma, which breaks static shapes under jit. `gaussian_blur_3d` therefore
has two modes: concrete sigmas -> exact reference kernels; traced sigmas ->
a fixed-width kernel (static `max_sigma`) whose taps outside the reference
support ceil(truncate*sigma) are zeroed, which is numerically identical to
the reference kernel after normalization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, truncate: float = 3.0):
    """Concrete-sigma kernel (parity: Generator/utils.py:74-81)."""
    sl = int(np.ceil(truncate * float(sigma)))
    ts = np.arange(-sl, sl + 1, dtype=np.float32)
    g = np.exp(-((ts / float(sigma)) ** 2) / 2.0)
    return jnp.asarray(g / g.sum())


def _masked_kernel(sigma, radius: int, truncate: float):
    """Fixed-width kernel for a traced sigma; taps beyond ceil(truncate*sigma)
    are zeroed so the result matches the dynamic-width reference kernel."""
    ts = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    safe = jnp.maximum(sigma, 1e-6)
    g = jnp.exp(-((ts / safe) ** 2) / 2.0)
    support = jnp.ceil(truncate * sigma)
    g = jnp.where(jnp.abs(ts) <= support, g, 0.0)
    g = g / jnp.sum(g)
    delta = (ts == 0).astype(jnp.float32)
    return jnp.where(sigma > 0, g, delta)


def _conv_axis(x, kernel, axis: int):
    """Correlate `x` with a 1-D kernel along `axis`, 'same' zero padding."""
    k = kernel.shape[0]
    x = jnp.moveaxis(x, axis, -1)
    shp = x.shape
    xr = x.reshape(1, 1, -1, shp[-1]).reshape(-1, 1, shp[-1])
    out = jax.lax.conv_general_dilated(
        xr.astype(jnp.float32), kernel.reshape(1, 1, k).astype(jnp.float32),
        window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    out = out.reshape(shp)
    return jnp.moveaxis(out, -1, axis)


def gaussian_blur_3d(x, sigmas, truncate: float = 3.0, max_sigma: float | None = None):
    """Separable blur of a (D,H,W) volume (parity: Generator/utils.py:83-94:
    axes with sigma<=0 are left untouched)."""
    concrete = isinstance(sigmas, (list, tuple, np.ndarray)) or np.isscalar(sigmas)
    if concrete:
        sig = np.broadcast_to(np.asarray(sigmas, np.float64), (3,))
        for ax in range(3):
            if sig[ax] > 0:
                x = _conv_axis(x, gaussian_kernel_1d(sig[ax], truncate), ax)
        return x
    # traced sigmas: fixed radius from the static cap
    assert max_sigma is not None, "traced sigmas require a static max_sigma"
    radius = int(math.ceil(truncate * max_sigma))
    for ax in range(3):
        x = _conv_axis(x, _masked_kernel(sigmas[ax], radius, truncate), ax)
    return x
