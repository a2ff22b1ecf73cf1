"""Evaluation metrics: dice, L1, normalized L2, PSNR, SSIM, MS-SSIM.

Parity with /root/reference/Trainer/models/evaluator.py:55-195 (the metric
registry and `eval`), with SSIM/MS-SSIM implemented natively in JAX
(the reference uses pytorch_msssim) using the standard Wang et al.
formulation (11x11 gaussian window, K1=0.01, K2=0.03).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def path_stem(p: str) -> str:
    """Path minus its NIfTI extension. A bare split('.')[0] would mangle
    relative paths ('./x.nii.gz' -> '') and dotted directories
    ('out.v2/x.nii.gz' -> 'out')."""
    if p.endswith(".nii.gz"):
        return p[: -len(".nii.gz")]
    if p.endswith(".nii"):
        return p[: -len(".nii")]
    return os.path.splitext(p)[0]


def dice(pred_onehot, target_onehot, eps: float = 1e-5):
    """Per-channel dice over spatial dims; inputs (..., D,H,W,C)."""
    axes = tuple(range(pred_onehot.ndim - 4, pred_onehot.ndim - 1))
    inter = jnp.sum(pred_onehot * target_onehot, axis=axes)
    union = jnp.sum(pred_onehot + target_onehot, axis=axes)
    return 2.0 * inter / jnp.clip(union, eps, None)


def seg_dice(pred_labels, target_labels, labels):
    """Mean dice over a label list from hard label maps
    (parity: evaluator.py dice on argmax outputs)."""
    scores = []
    for lab in labels:
        p = (pred_labels == lab).astype(jnp.float32)
        t = (target_labels == lab).astype(jnp.float32)
        denom = jnp.sum(p) + jnp.sum(t)
        scores.append(jnp.where(denom > 0,
                                2 * jnp.sum(p * t) / jnp.clip(denom, 1e-5, None),
                                1.0))
    return jnp.mean(jnp.stack(scores))


def l1(pred, target, mask=None):
    d = jnp.abs(pred - target)
    if mask is not None:
        return jnp.sum(d * mask) / jnp.clip(jnp.sum(mask), 1.0, None)
    return jnp.mean(d)


def normalized_l2(pred, target, eps: float = 1e-7):
    """(parity: get_normalized_l2, evaluator.py:99-102 — the prediction is
    first optimally SCALED onto the target, w = <o,t>/<o,o>, so the metric
    measures shape error of the bias-field estimate, not its gain)"""
    w = jnp.sum(pred * target) / (jnp.sum(pred * pred) + eps)
    return jnp.sqrt(jnp.sum((w * pred - target) ** 2)
                    / (jnp.sum(target * target) + eps))


def psnr(pred, target, data_range=None):
    """(parity: get_psnr, evaluator.py:113-119 — peak = max(target))"""
    mse = jnp.mean((pred - target) ** 2)
    peak = jnp.max(target) if data_range is None else data_range
    return 20.0 * jnp.log10(peak / jnp.sqrt(jnp.clip(mse, 1e-24, None)))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter3d(x, win):
    """Separable 3-D filter of (D,H,W) with a 1-D window, valid padding."""
    for ax in range(3):
        xm = jnp.moveaxis(x, ax, -1)
        shp = xm.shape
        xr = xm.reshape(-1, 1, shp[-1])
        out = jax.lax.conv_general_dilated(
            xr, win.reshape(1, 1, -1), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        x = jnp.moveaxis(out.reshape(shp[:-1] + (out.shape[-1],)), -1, ax)
    return x


def ssim(pred, target, data_range: float = 1.0, win_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         return_cs: bool = False):
    """3-D SSIM of (D,H,W) volumes (Wang et al. 2004 — the formulation
    pytorch_msssim implements)."""
    win = _gaussian_window(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_p = _filter3d(pred, win)
    mu_t = _filter3d(target, win)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sig_pp = _filter3d(pred * pred, win) - mu_pp
    sig_tt = _filter3d(target * target, win) - mu_tt
    sig_pt = _filter3d(pred * target, win) - mu_pt
    cs = (2 * sig_pt + c2) / (sig_pp + sig_tt + c2)
    s = ((2 * mu_pt + c1) / (mu_pp + mu_tt + c1)) * cs
    if return_cs:
        return jnp.mean(s), jnp.mean(cs)
    return jnp.mean(s)


def ms_ssim(pred, target, data_range: float = 1.0, win_size: int = 11,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    """Multi-scale SSIM (Wang et al. 2003). Downsampling = 2x avg pool."""
    weights = jnp.asarray(weights)
    levels = weights.shape[0]
    mcs = []
    p, t = pred, target
    val = None
    for i in range(levels):
        s, cs = ssim(p, t, data_range, win_size, return_cs=True)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            p = jax.lax.reduce_window(p, 0.0, jax.lax.add, (2, 2, 2),
                                      (2, 2, 2), "VALID") / 8.0
            t = jax.lax.reduce_window(t, 0.0, jax.lax.add, (2, 2, 2),
                                      (2, 2, 2), "VALID") / 8.0
        else:
            val = jnp.maximum(s, 0.0)
    out = val ** weights[-1]
    for i, cs in enumerate(mcs):
        out = out * cs ** weights[i]
    return out


def _minmax(x):
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.clip(hi - lo, 1e-12, None)


def ssim_normalized(pred, target, **kw):
    """(parity: get_ssim, evaluator.py:121-128 — both volumes min-max
    rescaled to [0,1] before SSIM with data_range 1)."""
    return ssim(_minmax(pred), _minmax(target), 1.0, **kw)


def ms_ssim_normalized(pred, target, **kw):
    """(parity: get_ms_ssim, evaluator.py:130-141)."""
    return ms_ssim(_minmax(pred), _minmax(target), 1.0, **kw)


METRIC_MAP = {
    "l1": l1,
    "psnr": psnr,
    "ssim": ssim_normalized,
    "ms_ssim": ms_ssim_normalized,
    "normalized_l2": normalized_l2,
    # bf_corrected_l1 maps to plain l1 in the reference too
    # (evaluator.py:77 'bf_corrected_l1': self.get_l1) — the "corrected"
    # refers to the INPUT being the bias-corrected image, computed upstream
    "corrected_l1": l1,
    "dice": seg_dice,
}

# ---------------------------------------------------------------------------
# File-pair evaluation protocol (parity: Evaluator.eval,
# evaluator.py:147-195 + the module constants at evaluator.py:20-52).

# the 33-label evaluation list (evaluator.py:20-22) — distinct from the
# training 56-label list
EVAL_LABELS = [0, 14, 15, 16, 24, 77, 85, 2, 3, 4, 7, 8, 10, 11, 12, 13,
               17, 18, 26, 28, 41, 42, 43, 46, 47, 49, 50, 51, 52, 53, 54,
               58, 60]
N_NEUTRAL_EVAL = 7

# left-hemisphere label list for hemisphere-prediction masking
# (scripts/test.py:23-35) — single source of truth lives next to the
# training label tables so a revision can't desynchronize the two
from .build import LABELS_LEFT as LEFT_HEMIS_LABELS  # noqa: E402


def align_shape(a, b):
    """Crop both volumes to the common leading shape
    (parity: align_shape, evaluator.py:42-52)."""
    if a.shape != b.shape:
        s = min(a.shape[0], b.shape[0])
        r = min(a.shape[1], b.shape[1])
        c = min(a.shape[2], b.shape[2])
        a = a[:s, :r, :c]
        b = b[:s, :r, :c]
    return a, b


def label_onehot(label, labels=None):
    """LUT one-hot over the evaluation label list -> (D,H,W,C)
    (parity: get_onehot, evaluator.py:30-39; channel-last here)."""
    labels = list(labels) if labels is not None else EVAL_LABELS
    lut = np.zeros(10000, np.int32)
    for i, lab in enumerate(labels):
        lut[lab] = i
    idx = lut[np.squeeze(np.asarray(label)).astype(np.int64)]
    return jax.nn.one_hot(jnp.asarray(idx), len(labels))


def hemis_mask_from(seg, regx):
    """Left-hemisphere mask: voxels whose label is a left-hemisphere label
    and whose predicted MNI x-coordinate is negative
    (parity: scripts/test.py:29-35 `M = (S > 0) & (X < 0)`)."""
    lut = np.zeros(10000, np.int32)
    for i, lab in enumerate(LEFT_HEMIS_LABELS):
        lut[lab] = i
    s = lut[np.squeeze(np.asarray(seg)).astype(np.int64)]
    x = np.squeeze(np.asarray(regx))
    return ((s > 0) & (x < 0)).astype(np.float32)


class Evaluator:
    """Metric-name driven evaluation (parity: Evaluator,
    evaluator.py:55-195). metric names like 'recon_psnr', 'seg_dice'."""

    def __init__(self, metric_names, labels=None):
        self.metric_names = list(metric_names)
        self.labels = labels

    def eval_files(self, pred_path: str, target_path: str,
                   clamp: bool = False, is_seg: bool = None,
                   normalize: bool = False, add_mask: bool = False,
                   flip: bool = False, kill_target_labels=(),
                   hemis_mask=None):
        """Full file-pair protocol (parity: Evaluator.eval,
        evaluator.py:147-195): load both volumes, crop-align shapes,
        optional sagittal flip of the prediction, zero-out killed labels,
        target-mask the prediction (writing a *_masked companion), min-max
        normalize, one-hot segmentations over the 33-label eval LUT, clamp
        to [0,1], then score every configured metric."""
        from ..utils.nifti import load_nifti, save_nifti

        if is_seg is None:
            is_seg = "label" in os.path.basename(pred_path)
        pred, aff = load_nifti(pred_path)
        target, _ = load_nifti(target_path)
        if is_seg:
            pred = np.rint(pred).astype(np.int32)
            target = np.rint(target).astype(np.int32)
        pred, target = align_shape(np.squeeze(pred), np.squeeze(target))
        if flip:
            pred = np.flip(pred, 0)
        for lab in kill_target_labels:
            target = np.where(target == lab, 0, target)
            pred = np.where(pred == lab, 0, pred)
        if hemis_mask is not None:
            m = hemis_mask[: pred.shape[0], : pred.shape[1], : pred.shape[2]]
            pred = pred * m
            target = target * m
        if add_mask and "_masked" not in pred_path:
            pred = np.where(target == 0, 0, pred)
            pred = np.where(pred < 0, 0, pred)
            save_nifti(path_stem(pred_path) + "_masked.nii.gz",
                       np.asarray(pred, np.float32), aff)
        if normalize:
            pred = (pred - np.min(pred)) / max(np.max(pred) - np.min(pred),
                                               1e-12)
        if is_seg:
            pred_t = label_onehot(pred, self.labels)
            target_t = label_onehot(target, self.labels)
        else:
            pred_t = jnp.asarray(pred, jnp.float32)
            target_t = jnp.asarray(target, jnp.float32)
        if clamp:
            pred_t = jnp.clip(pred_t, 0.0, 1.0)
            target_t = jnp.clip(target_t, 0.0, 1.0)

        score = {}
        for name in self.metric_names:
            metric = name.rsplit("_", 1)[-1]
            for long in ("ms_ssim", "normalized_l2", "corrected_l1"):
                if name.endswith(long):
                    metric = long
            if metric == "dice":
                score[name] = float(jnp.mean(dice(pred_t, target_t)))
            else:
                score[name] = float(METRIC_MAP[metric](pred_t, target_t))
        return score

    def eval(self, outputs: dict, targets: dict):
        res = {}
        for name in self.metric_names:
            prefix, metric = name.rsplit("_", 1) if "_" in name \
                else (name, name)
            # multi-token metric names from the reference registry
            # (evaluator.py:69-90)
            for long in ("ms_ssim", "normalized_l2", "corrected_l1"):
                if name.endswith(long):
                    prefix, metric = name[: -(len(long) + 1)], long
            if metric == "dice":
                key = "label" if "seg" in prefix else "pathology"
                if key in outputs and key in targets:
                    # default to the 33-label eval list (like label_onehot);
                    # [1] is not even a produced FreeSurfer id, so dice on
                    # it would score two empty masks as a constant 1.0
                    res[name] = float(seg_dice(outputs[key].squeeze(),
                                               targets[key].squeeze(),
                                               self.labels or EVAL_LABELS))
                continue
            src = {"recon": "T1", "sr": "high_res", "bf": "bias_field",
                   "feat": "T1"}.get(prefix, prefix)
            if src in outputs and src in targets:
                fn = METRIC_MAP[metric]
                a = np.asarray(outputs[src]).squeeze()
                b = np.asarray(targets[src]).squeeze()
                # multi-sample outputs (S, D, H, W): score per sample and
                # average — ssim's 3-D filter would otherwise blur ACROSS
                # the sample axis and never along W
                if a.ndim == 4 and b.ndim == 3:
                    res[name] = float(np.mean([float(fn(ai, b)) for ai in a]))
                elif a.ndim == 4 and b.ndim == 4:
                    res[name] = float(np.mean(
                        [float(fn(ai, bi)) for ai, bi in zip(a, b)]))
                else:
                    res[name] = float(fn(a, b))
        return res
