"""Tests for evaluation metrics (SSIM vs a scipy-based oracle, PSNR/dice
closed forms) and the dependency-free NIfTI round-trip."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from brainfm_tpu.models.evaluator import (dice, ms_ssim, normalized_l2, psnr,
                                          seg_dice, ssim)
from brainfm_tpu.utils.nifti import load_nifti, save_nifti


def test_psnr_closed_form():
    a = jnp.zeros((8, 8, 8))
    b = jnp.full((8, 8, 8), 0.1)
    # explicit peak: 20*log10(1/0.1) = 20 dB
    np.testing.assert_allclose(float(psnr(a, b, data_range=1.0)), 20.0,
                               rtol=1e-5)
    # reference semantics: peak = max(target) = 0.1 -> rmse == peak -> 0 dB
    # (get_psnr, evaluator.py:113-119)
    np.testing.assert_allclose(float(psnr(a, b)), 0.0, atol=1e-5)


def test_dice_perfect_and_disjoint():
    a = jnp.zeros((1, 8, 8, 8, 2)).at[..., 0].set(1.0)
    # channel 0: perfect overlap -> 1; channel 1: empty/empty -> 0 under the
    # clamped-union convention (criterion.py:122-123)
    np.testing.assert_allclose(np.asarray(dice(a, a))[0], [1.0, 0.0],
                               atol=1e-6)
    b = jnp.zeros((1, 8, 8, 8, 2)).at[..., 1].set(1.0)
    np.testing.assert_allclose(np.asarray(dice(a, b)), 0.0, atol=1e-6)


def test_seg_dice_labels():
    pred = jnp.asarray(np.random.default_rng(0).integers(0, 3, (16, 16, 16)))
    assert float(seg_dice(pred, pred, [0, 1, 2])) == pytest.approx(1.0)


def test_ssim_identity_and_degradation(rng):
    x = jnp.asarray(rng.random((24, 24, 24)), jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    noisy = x + 0.5 * jnp.asarray(rng.standard_normal((24, 24, 24)),
                                  jnp.float32)
    assert float(ssim(x, noisy)) < 0.8


def test_ssim_matches_skimage_formula(rng):
    """Compare against a direct numpy implementation of gaussian-window SSIM."""
    from scipy.ndimage import gaussian_filter

    x = rng.random((20, 20, 20)).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal((20, 20, 20))).astype(np.float32)

    # numpy oracle with truncated gaussian approximating the 11-tap window
    def blur(a):
        return gaussian_filter(a, 1.5, truncate=11 / 2 / 1.5, mode="constant")

    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    # oracle on interior (valid region) — compare loosely (window treatment
    # differs at borders between 'valid' conv and zero-padded filtering)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mx, my = blur(x), blur(y)
    sxx = blur(x * x) - mx * mx
    syy = blur(y * y) - my * my
    sxy = blur(x * y) - mx * my
    s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx ** 2 + my ** 2 + c1) * (sxx + syy + c2))
    ref = float(s[5:-5, 5:-5, 5:-5].mean())
    assert abs(got - ref) < 0.05


def test_ms_ssim_runs(rng):
    x = jnp.asarray(rng.random((48, 48, 48)), jnp.float32)
    v = float(ms_ssim(x, x, weights=(0.5, 0.5)))
    assert v == pytest.approx(1.0, abs=1e-4)


def test_normalized_l2():
    # reference semantics (get_normalized_l2, evaluator.py:99-102): the
    # prediction is optimally scaled first, so a pure gain error scores ~0
    a = jnp.ones((4, 4, 4))
    assert float(normalized_l2(a * 1.1, a)) == pytest.approx(0.0, abs=1e-3)
    # an orthogonal (shape) error is penalized: alternating +/-1 vs ones
    alt = jnp.asarray(np.indices((4, 4, 4)).sum(0) % 2 * 2 - 1, jnp.float32)
    assert float(normalized_l2(alt, a)) == pytest.approx(1.0, abs=1e-3)


def test_eval_files_protocol(tmp_path, rng):
    """File-pair protocol: shape alignment, seg one-hot LUT dice, killed
    labels, masked-companion write (parity: Evaluator.eval,
    evaluator.py:147-195)."""
    from brainfm_tpu.models.evaluator import EVAL_LABELS, Evaluator

    # segmentation pair with mismatched shapes; agreement except where
    # label 77 appears (which we kill)
    t = rng.choice(EVAL_LABELS[:8], (12, 12, 12)).astype(np.int32)
    p = t.copy()
    p[t == 77] = 0
    save_nifti(str(tmp_path / "pred.label.nii.gz"),
               np.pad(p, ((0, 2), (0, 0), (0, 0))))  # bigger pred
    save_nifti(str(tmp_path / "gt.label.nii.gz"), t)
    ev = Evaluator(["seg_dice"])
    res = ev.eval_files(str(tmp_path / "pred.label.nii.gz"),
                        str(tmp_path / "gt.label.nii.gz"),
                        kill_target_labels=[77])
    # reference get_dice means over ALL 33 LUT channels, absent labels
    # scoring 0 (evaluator.py:92-96): 7 present+perfect channels / 33
    assert res["seg_dice"] == pytest.approx(7 / 33, abs=1e-5)

    # image pair + add_mask companion
    img_t = rng.random((10, 10, 10)).astype(np.float32)
    img_p = img_t + 0.05
    img_t[0, 0, :] = 0.0
    save_nifti(str(tmp_path / "pred.nii.gz"), img_p)
    save_nifti(str(tmp_path / "gt.nii.gz"), img_t)
    ev2 = Evaluator(["recon_l1", "recon_psnr"])
    res2 = ev2.eval_files(str(tmp_path / "pred.nii.gz"),
                          str(tmp_path / "gt.nii.gz"), add_mask=True)
    assert 0.0 < res2["recon_l1"] < 0.1
    assert os.path.isfile(str(tmp_path / "pred_masked.nii.gz"))


def test_hemis_mask():
    """(parity: scripts/test.py:29-35 `M = (S > 0) & (X < 0)`)."""
    from brainfm_tpu.models.evaluator import hemis_mask_from

    seg = np.zeros((4, 4, 4), np.int32)
    seg[0] = 2        # left label
    seg[1] = 41       # not in the left list
    regx = np.full((4, 4, 4), -1.0, np.float32)
    regx[0, 0] = 1.0  # right of midline
    m = hemis_mask_from(seg, regx)
    assert m[0, 1:].all() and not m[0, 0].any()
    assert not m[1].any() and not m[2:].any()


def test_nifti_roundtrip(rng):
    vol = rng.random((7, 9, 11)).astype(np.float32)
    aff = np.diag([1.0, 2.0, 3.0, 1.0])
    aff[:3, 3] = [-5, 4, 2]
    with tempfile.TemporaryDirectory() as d:
        for name in ("t.nii", "t.nii.gz"):
            p = os.path.join(d, name)
            save_nifti(p, vol, aff)
            back, aff2 = load_nifti(p)
            np.testing.assert_allclose(back, vol, rtol=1e-6)
            np.testing.assert_allclose(aff2, aff, rtol=1e-5)


def test_nifti_int_dtype(rng):
    vol = rng.integers(0, 100, (5, 6, 7)).astype(np.int32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "lab.nii.gz")
        save_nifti(p, vol)
        back, _ = load_nifti(p)
        np.testing.assert_array_equal(back, vol)


def test_mgz_atlas_loads():
    """The bundled MNI atlas must decode (parity: test_utils.py:37-43)."""
    path = "/root/reference/files/gca.mgz"
    if not os.path.isfile(path):
        pytest.skip("atlas not present")
    vol, aff = load_nifti(path)
    assert vol.ndim == 3 and min(vol.shape) > 50
    assert np.isfinite(vol).all()
    assert abs(np.linalg.det(aff[:3, :3])) > 0.1
