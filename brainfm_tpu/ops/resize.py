"""Resize / zoom family.

Covers the reference's three distinct resampling conventions:

* `resize_spline` — spline resize with anchor semantics
  (/root/reference/utils/interpol/resize.py:13-120), incl. optional IIR
  prefilter; used by the generator's b-spline restore
  (Generator/datasets.py:337-340).
* `myzoom` / `myzoom_anisotropic` — center-aligned linear zoom with the
  `delta=(1-f)/(2f)` offset convention (Generator/utils.py:200-257,
  utils/misc.py:908-983,1051-1115). Center-aligned zoom is separable, so
  it runs as three MXU matmuls (ops/separable.py) at `highest` matmul
  precision — numerically fp32-equivalent to the trilinear gather it
  replaced but far cheaper to compile and run on TPU (the 3-D gather at
  220³ dominated `prepare_image`).
* `volume_resize` — blur + anisotropic zoom + affine update
  (`torch_resize`, utils/misc.py:1117-1187) used by inference prep.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .blur import gaussian_blur_3d
from .coeff import spline_coeff_nd
from .interp import trilinear3d
from .pushpull import grid_pull


def _anchor_coords(anchor: str, f: float, n_in: int, n_out: int):
    a = anchor[0].lower()
    if a == "c":  # centers
        return jnp.linspace(0.0, n_in - 1, n_out)
    if a == "e":  # edges
        scale = n_in / n_out
        return jnp.arange(n_out) * scale + 0.5 * (scale - 1.0)
    if a == "f":  # first voxel
        return jnp.arange(n_out) / f
    if a == "l":  # last voxel
        return jnp.arange(n_out) / f + ((n_in - 1) - (n_out - 1) / f)
    raise ValueError(f"unknown anchor {anchor}")


def resize_spline(img, shape=None, factor=None, anchor="c", interpolation=1,
                  bound="nearest", prefilter=True, extrapolate=True):
    """Spline resize (parity: utils/interpol/resize.py:13).

    img: (*spatial,) or (*spatial, C), channels last.
    """
    has_c = False
    ndim = img.ndim
    if shape is not None and img.ndim == len(shape) + 1:
        has_c, ndim = True, img.ndim - 1
    elif factor is not None and not np.isscalar(factor) and img.ndim == len(factor) + 1:
        has_c, ndim = True, img.ndim - 1
    inshape = img.shape[:ndim]

    if factor is not None:
        factor = [factor] * ndim if np.isscalar(factor) else list(factor)
    if shape is None:
        shape = [int(i * f) for i, f in zip(inshape, factor)]
    shape = list(shape)
    if factor is None:
        factor = [o / i for o, i in zip(shape, inshape)]
    anchors = [anchor] * ndim if isinstance(anchor, str) else list(anchor)

    lin = [_anchor_coords(a, f, i, o)
           for a, f, i, o in zip(anchors, factor, inshape, shape)]
    grid = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), axis=-1)

    src = img
    if prefilter:
        if has_c:
            src = jnp.moveaxis(spline_coeff_nd(jnp.moveaxis(src, -1, 0),
                                               bound, interpolation, ndim), 0, -1)
        else:
            src = spline_coeff_nd(src, bound, interpolation, ndim)
    return grid_pull(src, grid, interpolation=interpolation, bound=bound,
                     extrapolate=extrapolate)


def _zoom_axis_coords(n_in: int, n_out: int, f: float):
    delta = (1.0 - f) / (2.0 * f)
    v = delta + jnp.arange(n_out) / f
    return jnp.clip(v, 0.0, n_in - 1)


def myzoom(x, factor, newsize=None):
    """Center-aligned linear zoom (parity: Generator/utils.py:200-249).

    x: (D,H,W) or (D,H,W,C). factor: array-like of 3 floats (static).

    Separable formulation: the reference clamps coords into range (never
    masks), which `linear_resample_matrix` reproduces per axis; `highest`
    matmul precision keeps fp32 parity with the trilinear-gather oracle
    (tests/test_separable_zoom.py::test_myzoom_matches_gather_oracle).
    """
    import jax

    from .separable import separable_resample

    factor = np.asarray(factor, np.float64)
    insize = x.shape[:3]
    if newsize is None:
        newsize = np.round(np.array(insize) * factor).astype(int)
    newsize = tuple(int(v) for v in newsize)
    if newsize == tuple(insize) and np.allclose(factor, 1.0):
        # identity zoom (delta = 0, unit stride); asarray so a numpy input
        # is never returned aliased-and-mutable
        return jnp.asarray(x)
    vx = _zoom_axis_coords(insize[0], newsize[0], factor[0])
    vy = _zoom_axis_coords(insize[1], newsize[1], factor[1])
    vz = _zoom_axis_coords(insize[2], newsize[2], factor[2])
    with jax.default_matmul_precision("highest"):
        return separable_resample(x, (vx, vy, vz))


def myzoom_anisotropic(x, newsize, aff=None):
    """Zoom to an explicit output size (parity: utils/misc.py:1051-1115).
    Returns (y, new_aff) if aff given."""
    newsize = np.asarray(newsize, int)
    factors = newsize / np.array(x.shape[:3])
    y = myzoom(x, factors, newsize)
    if aff is None:
        return y
    aff_new = aff.copy()
    for c in range(3):
        aff_new[:-1, c] = aff_new[:-1, c] / factors[c]
    aff_new[:-1, -1] = aff_new[:-1, -1] - aff[:-1, :-1] @ (0.5 - 0.5 / factors)
    return y, aff_new


def volume_resize(img, aff, resolution, power_factor_at_half_width=5):
    """Gaussian-antialiased resolution change with affine update
    (parity: `torch_resize`, utils/misc.py:1117-1187).

    img: (D,H,W) or (D,H,W,C) jnp array; aff: (4,4) numpy affine.
    """
    if np.isscalar(resolution):
        resolution = np.full(3, float(resolution))
    voxsize = np.sqrt(np.sum(np.asarray(aff)[:-1, :-1] ** 2, axis=0))
    newsize = np.round(np.array(img.shape[:3]) * (voxsize / resolution)).astype(int)
    factors = np.array(img.shape[:3]) / newsize
    k = np.log(power_factor_at_half_width) / np.pi
    sigmas = k * factors
    sigmas[sigmas <= k] = 0.0
    if tuple(newsize) == img.shape[:3] and not np.any(sigmas > 0):
        # already at the target resolution: blur sigmas are zero and the
        # unit-factor zoom is the identity (delta=(1-f)/(2f)=0) — skip the
        # whole resample graph (the common serving case: 1 mm inputs)
        return jnp.asarray(img), np.asarray(aff).copy()

    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    chans = []
    for c in range(img.shape[-1]):
        chans.append(gaussian_blur_3d(img[..., c], sigmas, truncate=2.5))
    blurred = jnp.stack(chans, axis=-1)
    out, aff2 = myzoom_anisotropic(blurred, newsize, np.asarray(aff))
    if squeeze:
        out = out[..., 0]
    return out, aff2


def restrict_spline(img, shape=None, factor=None, anchor="c",
                    interpolation=1, bound="nearest", reduce_sum=False,
                    normalize: str = "fullscale"):
    """Adjoint of `resize_spline` — restriction to a coarser grid
    (parity: utils/interpol/restrict.py). Computed as the exact linear
    transpose of the resize operator (resize is linear in the image), so
    anchors/bounds/orders stay bit-consistent with resize by construction.

    img: the FINE-grid image (*fine_spatial[, C]); `shape`/`factor` describe
    the COARSE output grid (same convention as resize). reduce_sum keeps the
    pure adjoint (summed splat). Otherwise `normalize` picks the scaling:
    'fullscale' divides by the reference's constant prod((in-1)/(out-1))
    per 'centers' anchor (restrict.py:89-102 — boundary voxels keep the
    reference's values); 'count' divides by the per-voxel adjoint mass
    (exact local average everywhere).
    """
    import jax

    fine_shape = img.shape
    ndim = len(fine_shape) if img.ndim <= 3 else img.ndim - 1
    spatial = fine_shape[:ndim]
    if shape is None:
        assert factor is not None
        f = factor if isinstance(factor, (list, tuple)) else [factor] * ndim
        shape = tuple(int(round(s * ff)) for s, ff in zip(spatial, f))
    shape = tuple(shape)
    coarse_shape = shape + fine_shape[ndim:]

    def fwd(coarse):
        return resize_spline(coarse, shape=spatial, anchor=anchor,
                             interpolation=interpolation, bound=bound,
                             prefilter=False)

    example = jnp.zeros(coarse_shape, img.dtype)
    rt = jax.linear_transpose(fwd, example)
    out = rt(img)[0]
    if not reduce_sum:
        if normalize == "count":
            # per-voxel adjoint mass (R^T 1) -> exact local average
            norm = rt(jnp.ones_like(img))[0]
            out = out / jnp.maximum(norm, 1e-12)
        else:
            # reference fullscale (restrict.py:89-102), 'centers' anchor:
            # prod over dims of (n_fine-1)/(n_coarse-1)
            fullscale = 1.0
            for s_f, s_c in zip(spatial, shape):
                if anchor.startswith("c"):
                    fullscale *= (s_f - 1) / max(s_c - 1, 1)
                elif anchor.startswith("e"):
                    fullscale *= s_f / s_c
                else:
                    fullscale *= s_f / s_c
            out = out / fullscale
    return out
