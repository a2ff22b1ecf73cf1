"""Intensity augmentation chain: gamma, bias field, resolution resampling,
noise — and the restore-to-grid step.

Parity with /root/reference/Generator/utils.py:568-638 (augmentation funcs)
and Generator/datasets.py:306-354 (`augment_sample` chain + b-spline/zoom
restore + normalization). Jit design: the reference's dynamic intermediate
shapes (resample new_size, bias-field small size) become static maximal
buffers with traced effective sizes (see synth/deform.py
`zoom_from_effective`); runtime-varying strengths (the mild/severe/real/
synth `update_gen_args` swap, datasets.py:634-636) enter as the traced
`knobs` pytree instead of config mutation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.blur import gaussian_blur_3d
from .deform import zoom_from_effective


def _max_blur_sigma(cfg) -> float:
    """Static blur-kernel cap derived from the worst-case slice-thickness
    sigma: 1.15 * ln5/pi * max_thickness / min(res_training_data)
    (utils.py:592 with the 0.85-1.15 jitter at its max). A fixed 4.0 was
    only valid at 1 mm training resolution — finer res_training_data
    needs a wider kernel or the Gaussian is silently truncated."""
    res = [float(r) for r in
           (getattr(cfg, "res_training_data", None) or (1.0, 1.0, 1.0))]
    max_thick = float(getattr(cfg, "max_thickness", None) or 6.0)
    sig = 1.15 * math.log(5.0) / math.pi * max_thick / max(min(res), 1e-3)
    return max(4.0, sig)


def gamma_transform(key, img, gamma_std, gamma=None):
    """(parity: Generator/utils.py:568-572). gamma_std may be traced.
    `gamma`: optional injected exponent (golden tests)."""
    if gamma is None:
        gamma = jnp.exp(gamma_std * jax.random.normal(key))
    return 300.0 * (img / 300.0) ** gamma


def sample_bias_field(key, cfg, setup, knobs, bf_scale=None, std=None,
                      small_noise=None):
    """Low-res log-field -> full-size BFlog (parity: utils.py:574-589).
    bf_scale/std ranges come from the traced `knobs` (mild/severe swap).
    bf_scale/std/small_noise: optional injected draws (golden tests;
    small_noise is the standard-normal buffer-shaped field)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if bf_scale is None:
        bf_scale = knobs["bf_scale_min"] + jax.random.uniform(k1) * (
            knobs["bf_scale_max"] - knobs["bf_scale_min"])
    # the static buffer below is sized from cfg.bf_scale_max; a traced
    # knob above it would make eff exceed the buffer and silently zero
    # the field toward the high end of each axis — clamp loudly instead
    bf_scale = jnp.minimum(bf_scale, jnp.float32(cfg.bf_scale_max))
    size = jnp.asarray(cfg.size, jnp.float32)
    eff = jnp.round(bf_scale * size)
    eff = eff.at[1].set(jnp.where(setup["photo_mode"] > 0,
                                  jnp.round(size[1] / setup["spac"]), eff[1]))
    eff = jnp.maximum(eff, 2.0)
    frac1 = (1.0 / 2.5 if (cfg.photo_prob > 0 or cfg.left_hemis_only)
             else cfg.bf_scale_max)
    frac1 = max(cfg.bf_scale_max, frac1)
    buf = (int(math.ceil(cfg.bf_scale_max * cfg.size[0])) + 1,
           int(math.ceil(frac1 * cfg.size[1])) + 1,
           int(math.ceil(cfg.bf_scale_max * cfg.size[2])) + 1)
    if std is None:
        std = knobs["bf_std_min"] + (knobs["bf_std_max"]
                                     - knobs["bf_std_min"]) \
            * jax.random.uniform(k2)
    if small_noise is None:
        small_noise = jax.random.normal(k3, buf)
    small = std * small_noise
    return zoom_from_effective(small, eff, cfg.size)


def resample_resolution(key, img, cfg, setup, rnd=None):
    """Slice-thickness blur + downsample to acquisition resolution
    (parity: utils.py:591-609). Returns (low-res padded buffer,
    effective new_size(3,)). `rnd`: optional injected blur jitter."""
    res_td = jnp.asarray(cfg.res_training_data, jnp.float32)
    if rnd is None:
        rnd = 0.85 + 0.3 * jax.random.uniform(key)
    stds = rnd * jnp.log(5.0) / jnp.pi * setup["thickness"] / res_td
    stds = jnp.where(setup["thickness"] <= res_td, 0.0, stds)
    blurred = gaussian_blur_3d(img, stds, max_sigma=_max_blur_sigma(cfg))

    size = jnp.asarray(cfg.size, jnp.float32)
    new_size = jnp.floor(size * res_td / setup["resolution"])  # .astype(int) parity
    new_size = jnp.maximum(new_size, 1.0)
    factors = new_size / size
    delta = (1.0 - factors) / (2.0 * factors)
    # axis-separable -> three MXU matmuls; rows outside the strict (0, n-1]
    # bound are zeroed (fast_3D_interp semantics), which composes across
    # axes because the masked default is 0
    from ..ops.separable import apply_axis_matrix, linear_resample_matrix

    small = blurred
    for d, out in enumerate(cfg.size):
        v = delta[d] + jnp.arange(out) / factors[d]
        W = linear_resample_matrix(v, small.shape[d], mask_oob=True)
        small = apply_axis_matrix(small, W, d)
    return small, new_size


def add_noise(key, img, noise_std_min, noise_std_max, std=None, noise=None):
    """(parity: utils.py:633-638). stds are traced knobs; std/noise are
    optional injected draws (golden tests)."""
    k1, k2 = jax.random.split(key)
    if std is None:
        std = noise_std_min + (noise_std_max - noise_std_min) \
            * jax.random.uniform(k1)
    if noise is None:
        noise = jax.random.normal(k2, img.shape)
    noisy = img + std * noise
    return jnp.maximum(noisy, 0.0)


def restore_resolution(small, new_size, cfg):
    """Back to the training grid (parity: datasets.py:337-340, myzoom path;
    myzoom_torch(X, 1/factors) == zoom from effective new_size to size)."""
    return zoom_from_effective(small, new_size, cfg.size)


def augment_chain(key, img, cfg, setup, knobs, steps=("gamma", "bias_field",
                                                      "resample", "noise"),
                  is_ct=False, overrides=None):
    """Run the configured augmentation steps
    (parity: datasets.py:328-340 loop over `augmentation_steps`).

    knobs: traced dict {gamma_std, bf_scale_min, bf_scale_max, bf_std_min,
    bf_std_max, noise_std_min, noise_std_max} — the runtime
    mild/severe/real/synth parameter swap.
    overrides: optional dict of injected draws for golden tests
    ({gamma, bf_scale, bf_std, bf_small_noise, resample_rnd, noise_std,
    noise_field}).
    Returns (restored_img, aux dict with 'BFlog','high_res','factors')."""
    keys = jax.random.split(key, 4)
    ov = overrides or {}
    aux = {}
    x = img
    new_size = jnp.asarray(cfg.size, jnp.float32)
    for step in steps:
        if step == "gamma":
            x = gamma_transform(keys[0], x, knobs["gamma_std"],
                                gamma=ov.get("gamma"))
        elif step == "bias_field":
            if is_ct:
                aux["high_res"] = x  # (parity: utils.py:575-577)
            else:
                bflog = sample_bias_field(
                    keys[1], cfg, setup, knobs, bf_scale=ov.get("bf_scale"),
                    std=ov.get("bf_std"),
                    small_noise=ov.get("bf_small_noise"))
                x = x * jnp.exp(bflog)
                aux["BFlog"] = bflog
                aux["high_res"] = x
        elif step == "resample":
            x, new_size = resample_resolution(keys[2], x, cfg, setup,
                                              rnd=ov.get("resample_rnd"))
        elif step == "noise":
            x = add_noise(keys[3], x, knobs["noise_std_min"],
                          knobs["noise_std_max"], std=ov.get("noise_std"),
                          noise=ov.get("noise_field"))
        else:
            raise ValueError(step)
    restored = restore_resolution(x, new_size, cfg)
    aux["factors"] = new_size / jnp.asarray(cfg.size, jnp.float32)
    return restored, aux
