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


def prepare_image(img_path: str, win_size=None, zero_crop_first: bool = False,
                  is_CT: bool = False, is_label: bool = False,
                  rescale: bool = True):
    """(parity: prepare_image, test_utils.py:235-284). Returns
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

    imj, aff = volume_resize(jnp.asarray(im), aff, 1.0)
    im = np.asarray(imj)
    im, aff = align_volume_to_ref(im, aff, aff_ref=np.eye(4), return_aff=True)
    if zero_crop_first:
        lo, hi = zero_crop_bounds(im)
        im = im[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
    im, crop_start, orig_shp, aff = center_crop(im, win_size, aff)
    return jnp.asarray(im), aff, crop_start, orig_shp
