"""Host-side inference preprocessing.

Parity with /root/reference/utils/test_utils.py:60-189 (zero_crop,
center_crop) and :235-284 (prepare_image): load, nan cleanup, CT clamp,
min-max rescale, resample to 1 mm, RAS alignment, crop. Host numpy + the
JAX resize op; returns device-ready arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.resize import volume_resize
from ..utils.nifti import load_nifti
from ..utils.orientation import align_volume_to_ref


def zero_crop_bounds(vol: np.ndarray, tol: float = 0.0):
    """Bounding box of non-background voxels (parity: test_utils.py:60-90)."""
    mask = vol > tol
    coords = np.argwhere(mask)
    lo = coords.min(0)
    hi = coords.max(0) + 1
    return lo, hi


def center_crop(vol: np.ndarray, win_size, aff: np.ndarray | None = None):
    """(parity: test_utils.py:141-189). Returns (cropped, crop_start,
    orig_shape, aff)."""
    orig_shp = vol.shape[:3]
    if aff is None:
        aff = np.eye(4)
    if win_size is None:
        return vol, [0, 0, 0], orig_shp, aff
    if any(orig_shp[i] > win_size[i] for i in range(3)):
        start = [max(orig_shp[i] - win_size[i], 0) // 2 for i in range(3)]
        aff = aff.copy()
        aff[:-1, -1] = aff[:-1, -1] + aff[:-1, :-1] @ np.asarray(start)
        out = vol[start[0]:start[0] + win_size[0],
                  start[1]:start[1] + win_size[1],
                  start[2]:start[2] + win_size[2]]
        return out, start, orig_shp, aff
    return vol, [0, 0, 0], orig_shp, aff


def add_bias_field(im, seed: int = 0, bf_scale_min: float = 0.02,
                   bf_scale_max: float = 0.04, bf_std_min: float = 0.1,
                   bf_std_max: float = 0.6):
    """Synthetic multiplicative bias field for robustness testing
    (parity: add_bias_field, test_utils.py:192-200): a tiny gaussian
    log-field zoomed to full size and exponentiated."""
    from ..ops.resize import myzoom

    rng = np.random.default_rng(seed)
    shp = np.asarray(im.shape[:3])
    scale = bf_scale_min + rng.random() * (bf_scale_max - bf_scale_min)
    small = np.round(scale * shp).astype(int)
    std = bf_std_min + (bf_std_max - bf_std_min) * rng.random()
    bf_log = jnp.asarray(std * rng.standard_normal(small), jnp.float32)
    bf_log = myzoom(bf_log, shp / small, newsize=tuple(int(v) for v in shp))
    bf = jnp.exp(bf_log)
    return im * bf, bf


def resample_roundtrip(im, new_res):
    """Acquisition simulation: resample to `new_res` mm and zoom back to
    the 1 mm grid (parity: resample, test_utils.py:202-232 — center-aligned
    `delta=(1-f)/(2f)` coordinates both ways)."""
    from ..ops.interp import trilinear3d
    from ..ops.resize import myzoom

    shp = np.asarray(im.shape[:3])
    new_size = (shp / np.asarray(new_res, np.float64)).astype(int)
    factors = new_size / shp
    delta = (1.0 - factors) / (2.0 * factors)
    vs = [np.arange(delta[a], delta[a] + new_size[a] / factors[a],
                    1 / factors[a])[: new_size[a]] for a in range(3)]
    ii, jj, kk = np.meshgrid(*vs, sparse=False, indexing="ij")
    low = trilinear3d(im, jnp.asarray(ii, jnp.float32),
                      jnp.asarray(jj, jnp.float32),
                      jnp.asarray(kk, jnp.float32))
    return myzoom(low, 1.0 / factors, newsize=tuple(int(v) for v in shp))


def prepare_image(img_path: str, win_size=None, zero_crop_first: bool = False,
                  is_CT: bool = False, is_label: bool = False,
                  rescale: bool = True, spacing=None, add_bf: bool = False,
                  bf_seed: int = 0):
    """(parity: prepare_image, test_utils.py:235-284 incl. the synthetic
    bias field and acquisition-spacing resample). Returns
    (im: jnp (D,H,W), aff, crop_start, orig_shp)."""
    im, aff = load_nifti(img_path)
    im = np.nan_to_num(np.squeeze(im)).astype(np.int32 if is_label
                                              else np.float32)
    if im.ndim > 3:
        im = im.mean(-1)
    if is_CT and rescale:
        im = np.clip(im, 0.0, 80.0)
    if not is_label and rescale:
        im = im - im.min()
        mx = im.max()
        if mx > 0:
            im = im / mx

    # volume_resize short-circuits to the (numpy) input unchanged when the
    # volume is already at 1 mm — passing numpy avoids a pointless
    # host->device->host round-trip for the common serving case
    imj, aff = volume_resize(im, aff, 1.0)
    if add_bf and not is_CT and not is_label:
        imj, _ = add_bias_field(imj, seed=bf_seed)
    if spacing is not None and not is_label:
        imj = resample_roundtrip(imj, spacing)
    im = np.asarray(imj)
    im, aff = align_volume_to_ref(im, aff, aff_ref=np.eye(4), return_aff=True)
    if zero_crop_first:
        lo, hi = zero_crop_bounds(im)
        im = im[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    im, crop_start, orig_shp, aff = center_crop(im, win_size, aff)
    return jnp.asarray(im), aff, crop_start, orig_shp
