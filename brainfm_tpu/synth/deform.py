"""Random spatial deformation: affine + nonlinear SVF, fully jit-traceable.

Parity with /root/reference/Generator/datasets.py:187-303 and
Generator/utils.py:102-116 (`make_affine_matrix`). Key TPU re-design
(SURVEY.md §7 hard part 1): the reference materializes a low-res field at a
*random* shape and computes data-dependent read bounds (deform_grid
x1..z2); here the low-res buffer has a static maximal shape with a traced
*effective* size, and the grid addresses the full resident subject volume,
so every shape is static under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.interp import trilinear3d


def make_affine_matrix(rot, sh, s):
    """(parity: Generator/utils.py:102-116) — traced rotation/shear/scale."""
    cx, sx = jnp.cos(rot[0]), jnp.sin(rot[0])
    cy, sy = jnp.cos(rot[1]), jnp.sin(rot[1])
    cz, sz = jnp.cos(rot[2]), jnp.sin(rot[2])
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    SHx = jnp.array([[1, 0, 0], [sh[1], 1, 0], [sh[2], 0, 1]])
    SHy = jnp.array([[1, sh[0], 0], [0, 1, 0], [0, sh[2], 1]])
    SHz = jnp.array([[1, 0, sh[0]], [0, 1, sh[1]], [0, 0, 1]])
    A = SHx @ SHy @ SHz @ Rx @ Ry @ Rz
    return A * s[:, None]


def random_affine(key, cfg, shp):
    """Random rotation/shear/scale + center (parity: datasets.py:187-201).

    shp: traced (3,) float array — the subject's true voxel extent.
    Returns (scaling_factor_distances, A(3,3), c2(3,))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rot = ((2 * cfg.max_rotation * jax.random.uniform(k1, (3,))
            - cfg.max_rotation) / 180.0 * jnp.pi)
    shear = 2 * cfg.max_shear * jax.random.uniform(k2, (3,)) - cfg.max_shear
    scal = 1 + 2 * cfg.max_scaling * jax.random.uniform(k3, (3,)) - cfg.max_scaling
    sfd = jnp.prod(scal) ** (1.0 / 3.0)
    A = make_affine_matrix(rot, shear, scal)
    size = jnp.asarray(cfg.size, jnp.float32)
    if cfg.random_shift:
        max_shift = jnp.maximum((shp - size) / 2.0, 0.0)
        c2 = (shp - 1) / 2.0 + (2 * max_shift * jax.random.uniform(k4, (3,))
                                - max_shift)
    else:
        c2 = (shp - 1) / 2.0
    return sfd, A, c2


def zoom_from_effective(field, eff_sizes, out_sizes):
    """Center-aligned linear upsample from the first `eff_sizes` voxels of a
    statically-shaped buffer — the jit-safe equivalent of
    `myzoom_torch(Fsmall, size / size_F_small)` (Generator/utils.py:200)
    with a random small size.

    Axis-separable, so it runs as three dense MXU matmuls (ops/separable.py)
    — measured faster than the 8-corner gather formulation on v5e (5.5 ms
    vs 12.1 ms healthy-relay / 241 ms degraded-relay at 160^3,
    re-measured 2026-08-16).

    field: (Dm, Hm, Wm[, C]) buffer; eff_sizes: traced (3,) float;
    out_sizes: static tuple."""
    from ..ops.separable import apply_axis_matrix, linear_resample_matrix

    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    x = field
    for d, out in enumerate(out_sizes):
        eff = eff_sizes[d]
        factor = out / eff
        delta = (1.0 - factor) / (2.0 * factor)
        v = delta + jnp.arange(out) / factor
        W = linear_resample_matrix(jnp.clip(v, 0.0, eff - 1.0),
                                   field.shape[d], upper=eff - 1.0)
        x = apply_axis_matrix(x, W, d)
    if squeeze:
        x = x[..., 0]
    return x


def small_field_buffer_shape(cfg, photo_possible: bool | None = None):
    """Static low-res buffer shape covering both the nonlinear-scale range and
    photo mode's spac-driven axis-1 size (datasets.py:203-207)."""
    if photo_possible is None:
        photo_possible = cfg.photo_prob > 0 or cfg.left_hemis_only
    frac = [cfg.nonlin_scale_max] * 3
    if photo_possible:
        frac[1] = max(frac[1], 1.0 / 2.5)
    return tuple(int(math.ceil(f * s)) + 1 for f, s in zip(frac, cfg.size))


def random_nonlinear_field(key, cfg, setup, need_inverse: bool = False):
    """Low-res gaussian SVF upsampled to `cfg.size`
    (parity: datasets.py:203-226). Returns (F, Fneg or None)."""
    k1, k2, k3 = jax.random.split(key, 3)
    nonlin_scale = (cfg.nonlin_scale_min + jax.random.uniform(k1)
                    * (cfg.nonlin_scale_max - cfg.nonlin_scale_min))
    size = jnp.asarray(cfg.size, jnp.float32)
    eff = jnp.round(nonlin_scale * size)
    photo = setup["photo_mode"]
    eff = eff.at[1].set(jnp.where(photo > 0,
                                  jnp.round(size[1] / setup["spac"]), eff[1]))
    eff = jnp.maximum(eff, 2.0)

    buf_shape = small_field_buffer_shape(cfg)
    nonlin_std = cfg.nonlin_std_max * jax.random.uniform(k2)
    fsmall = nonlin_std * jax.random.normal(k3, (*buf_shape, 3))
    F = zoom_from_effective(fsmall, eff, cfg.size)
    F = F.at[..., 1].set(jnp.where(photo > 0, 0.0, F[..., 1]))

    if need_inverse:
        Fsvf, Fneg = integrate_svf(F, cfg.n_steps_svf_integration)
        return Fsvf, Fneg
    return F, None


def integrate_svf(F, n_steps: int):
    """Scaling-and-squaring of the stationary velocity field and its negative
    (parity: datasets.py:214-223)."""
    size = F.shape[:3]
    xx, yy, zz = jnp.meshgrid(*[jnp.arange(s, dtype=F.dtype) for s in size],
                              indexing="ij")

    def compose(f):
        return f + trilinear3d(f, xx + f[..., 0], yy + f[..., 1], zz + f[..., 2])

    step = 1.0 / (2.0 ** n_steps)
    fsvf = F * step
    fneg = -F * step
    for _ in range(n_steps):
        fsvf = compose(fsvf)
        fneg = compose(fneg)
    return fsvf, fneg


def deform_grid(cfg, shp, A, c2, F=None):
    """Sampling coordinates into the full resident subject volume
    (parity: datasets.py:264-303 minus the read-window cropping, which the
    fixed-shape subject bank makes unnecessary).

    Returns (xx2, yy2, zz2) each of shape cfg.size."""
    size = cfg.size
    xx, yy, zz = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in size],
                              indexing="ij")
    c = (jnp.asarray(size, jnp.float32) - 1) / 2.0
    xc, yc, zc = xx - c[0], yy - c[1], zz - c[2]
    if F is not None:
        xc = xc + F[..., 0]
        yc = yc + F[..., 1]
        zc = zc + F[..., 2]
    xx2 = A[0, 0] * xc + A[0, 1] * yc + A[0, 2] * zc + c2[0]
    yy2 = A[1, 0] * xc + A[1, 1] * yc + A[1, 2] * zc + c2[1]
    zz2 = A[2, 0] * xc + A[2, 1] * yc + A[2, 2] * zc + c2[2]
    xx2 = jnp.clip(xx2, 0.0, shp[0] - 1)
    yy2 = jnp.clip(yy2, 0.0, shp[1] - 1)
    zz2 = jnp.clip(zz2, 0.0, shp[2] - 1)
    return xx2, yy2, zz2
