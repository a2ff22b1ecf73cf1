"""GMM contrast synthesis from generation label maps.

Parity with /root/reference/Generator/datasets.py:430-464 (`get_contrast`:
256-bin mu/sigma LUT with CT brightness groups and partial-volume ramps) and
:357-376 (`generate_sample` intensity draw). All draws from jax PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .constants import CT_BRIGHTNESS_GROUP


def build_contrast_lut(mus, sigmas, ct_levels=None, is_ct=False,
                       zero_bg=False, photo_mode=None):
    """Deterministic LUT construction from drawn base values
    (parity: the non-random body of get_contrast, datasets.py:434-463).
    Separated from the draws so golden tests can inject the same base
    values into the reference and compare exactly.

    ct_levels: (darker, dark, bright, brighter) scalars or None;
    is_ct/zero_bg may be traced booleans."""
    if ct_levels is not None:
        ct_mus = mus
        for group, val in zip(("darker", "dark", "bright", "brighter"),
                              ct_levels):
            idx = np.asarray(CT_BRIGHTNESS_GROUP[group], np.int32)
            if len(idx):
                ct_mus = ct_mus.at[idx].set(val)
        mus = jnp.where(is_ct, ct_mus, mus)

    # zero background always in photo mode, else with prob 0.5
    # (parity: datasets.py:449-450)
    if photo_mode is None:
        photo_mode = jnp.zeros(())
    mus = mus.at[0].set(jnp.where((photo_mode > 0) | zero_bg, 0.0, mus[0]))

    # partial-volume ramps: 1=lesion, 2=WM, 3=GM, 4=CSF
    # (parity: datasets.py:453-462)
    v = 0.02 * jnp.arange(50)
    mus = mus.at[100:150].set(mus[1] * (1 - v) + mus[2] * v)
    mus = mus.at[150:200].set(mus[2] * (1 - v) + mus[3] * v)
    mus = mus.at[200:250].set(mus[3] * (1 - v) + mus[4] * v)
    mus = mus.at[250].set(mus[4])
    sigmas = sigmas.at[100:150].set(
        jnp.sqrt(sigmas[1] ** 2 * (1 - v) + sigmas[2] ** 2 * v))
    sigmas = sigmas.at[150:200].set(
        jnp.sqrt(sigmas[2] ** 2 * (1 - v) + sigmas[3] ** 2 * v))
    sigmas = sigmas.at[200:250].set(
        jnp.sqrt(sigmas[3] ** 2 * (1 - v) + sigmas[4] ** 2 * v))
    sigmas = sigmas.at[250].set(sigmas[4])
    return mus, sigmas


def sample_contrast_lut(key, ct_prob: float = 0.0, photo_mode=None):
    """Random per-label means/stds (parity: datasets.py:430-464).

    photo_mode: traced 0/1 scalar (background zeroing branch).
    Returns (mus[256], sigmas[256])."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mus = 25.0 + 200.0 * jax.random.uniform(k1, (256,))
    sigmas = 5.0 + 20.0 * jax.random.uniform(k2, (256,))

    ct_levels = None
    is_ct = False
    if ct_prob > 0:
        is_ct = jax.random.uniform(k3) < ct_prob
        levels = jax.random.uniform(k4, (4,))
        ct_levels = (25.0 + 10.0 * levels[0], 90.0 + 20.0 * levels[1],
                     110.0 + 20.0 * levels[2], 150.0 + 50.0 * levels[3])

    zero_bg = jax.random.uniform(k5) < 0.5
    return build_contrast_lut(mus, sigmas, ct_levels, is_ct, zero_bg,
                              photo_mode)


def synth_intensities(key, gen_labels, mus, sigmas, hemis_mask=None,
                      noise=None):
    """Per-voxel gaussian intensities from the label LUT
    (parity: datasets.py:364-374 — the WM-lesion merge 77->2 and the
    non-negativity clamp). gen_labels: int volume (full subject frame).
    `noise`: optional injected standard-normal field (golden tests)."""
    g = jnp.where(gen_labels == 77, 2, gen_labels)
    if hemis_mask is not None:
        g = jnp.where(hemis_mask == 0, 0, g)
    gr = jnp.clip(jnp.round(g).astype(jnp.int32), 0, 255)
    from ..ops.pallas_lut import lut_apply
    ms = lut_apply(jnp.stack([mus, sigmas], axis=1), gr)
    if noise is None:
        noise = jax.random.normal(key, gr.shape)
    syn = ms[..., 0] + ms[..., 1] * noise
    return jnp.maximum(syn, 0.0)
