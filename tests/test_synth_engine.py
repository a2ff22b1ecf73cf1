"""Tests for the jitted synthesis engine: shapes, jit-compilability,
value ranges, determinism, and semantic properties matching the reference
generator behavior (Generator/datasets.py:638-757)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.synth import SynthStatic, synth_item
from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack

SIZE = (32, 32, 32)
TASKS = ("T1", "segmentation", "distance", "registration", "bias_field",
         "super_resolution")


@pytest.fixture(scope="module")
def bank():
    b = SubjectBank(bank_shape=(48, 48, 48))
    b.add_debug_subject(seed=0, extent=(40, 44, 42))
    return b


@pytest.fixture(scope="module")
def cfg():
    return SynthStatic(size=SIZE, all_samples=2, mild_samples=1,
                       mix_synth_prob=0.2)


def test_synth_item_shapes(bank, cfg):
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "synth")
    target, samples = synth_item(jax.random.PRNGKey(0), subj, cfg, TASKS,
                                 "synth", knobs)
    assert samples["input"].shape == (2, *SIZE, 1)
    assert samples["bias_field_log"].shape == (2, *SIZE, 1)
    assert samples["high_res_residual"].shape == (2, *SIZE, 1)
    assert target["T1"].shape == (*SIZE, 1)
    assert target["segmentation"].shape == (*SIZE, 56)
    assert target["distance"].shape == (*SIZE, 4)
    assert target["registration"].shape == (*SIZE, 3)

    x = np.asarray(samples["input"])
    assert np.isfinite(x).all()
    assert x.min() >= 0.0 and x.max() <= 1.0 + 1e-5
    # normalized input peaks at 1 (datasets.py:342-343)
    np.testing.assert_allclose(x.reshape(2, -1).max(1), 1.0, rtol=1e-5)


def test_synth_item_real_mode(bank, cfg):
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "T1")
    target, samples = synth_item(jax.random.PRNGKey(1), subj, cfg, TASKS,
                                 "T1", knobs)
    assert samples["input"].shape == (2, *SIZE, 1)
    assert np.isfinite(np.asarray(samples["input"])).all()


def test_synth_item_deterministic(bank, cfg):
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "synth")
    t1, s1 = synth_item(jax.random.PRNGKey(7), subj, cfg, TASKS, "synth", knobs)
    t2, s2 = synth_item(jax.random.PRNGKey(7), subj, cfg, TASKS, "synth", knobs)
    np.testing.assert_array_equal(np.asarray(s1["input"]),
                                  np.asarray(s2["input"]))
    t3, s3 = synth_item(jax.random.PRNGKey(8), subj, cfg, TASKS, "synth", knobs)
    assert not np.allclose(np.asarray(s1["input"]), np.asarray(s3["input"]))


def test_seg_target_is_onehot(bank, cfg):
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "synth")
    target, _ = synth_item(jax.random.PRNGKey(2), subj, cfg, TASKS, "synth",
                           knobs)
    seg = np.asarray(target["segmentation"])
    np.testing.assert_allclose(seg.sum(-1), 1.0, rtol=1e-5)
    assert ((seg == 0) | (seg == 1)).all()  # nearest-deformed one-hot


def test_mild_vs_severe_bias_field(bank):
    """Sample 0 (mild, bf_std<=0.02) gets a weaker bias field than sample 1
    (severe, bf_std in [0.1,0.6]) — the knobs swap of datasets.py:728-748.
    (Noise std is overridden identically for both by the real/synth
    image-generator args, so the separating knob is the bias field.)"""
    cfg = SynthStatic(size=SIZE, all_samples=2, mild_samples=1)
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "T1")
    diffs = []
    for seed in range(4):
        _, samples = synth_item(jax.random.PRNGKey(seed), subj, cfg,
                                ("T1", "bias_field"), "T1", knobs)
        bf = np.abs(np.asarray(samples["bias_field_log"]))
        diffs.append(bf[1].mean() - bf[0].mean())
    assert np.mean(diffs) > 0


def test_pathology_encoding(bank):
    cfg = SynthStatic(size=SIZE, all_samples=1, mild_samples=0,
                      pathology_prob=1.0, random_shape_prob=1.0)
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "synth")
    tasks = ("T1", "pathology")
    target, samples = synth_item(jax.random.PRNGKey(3), subj, cfg, tasks,
                                 "synth", knobs)
    p = np.asarray(target["pathology"])
    assert p.shape == (*SIZE, 1)
    assert set(np.unique(p)).issubset({0.0, 1.0})
    assert np.isfinite(np.asarray(samples["input"])).all()


def test_synth_item_under_vmap_keys(bank, cfg):
    """Batched item generation: vmap over PRNG keys compiles and runs."""
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "synth")
    from brainfm_tpu.synth.engine import _synth_item_impl

    keys = tuple(sorted(subj.keys()))
    vals = tuple(subj[k] for k in keys)

    def gen(k):
        return _synth_item_impl(k, vals, keys, cfg, ("T1",), "synth", knobs)

    t, s = jax.vmap(gen)(jax.random.split(jax.random.PRNGKey(0), 2))
    assert s["input"].shape == (2, 2, *SIZE, 1)


def test_left_hemis_only_mode(bank):
    """left_hemis_only (parity: datasets.py:166-184,251-262,367-368,483):
    the segmentation one-hot is len(LABELS_LEFT)=18 channels wide (the
    naive vflip formula emitted 20 and desynced from the model head),
    distance is the 2-channel lp/lw stack, flip is forced off, the
    synthesized input and the regression targets respect the hemisphere
    mask, and every output is finite."""
    from brainfm_tpu.synth.constants import (LABELS_LEFT, build_vflip)

    # vflip for a left-only list is the identity of length n_labels
    vf = build_vflip(len(LABELS_LEFT))
    assert vf.shape == (len(LABELS_LEFT),)
    np.testing.assert_array_equal(vf, np.arange(len(LABELS_LEFT)))

    cfg = SynthStatic(size=SIZE, all_samples=2, mild_samples=1,
                      left_hemis_only=True)
    tasks = ("T1", "segmentation", "distance", "registration", "bias_field")
    knobs = build_knobs_stack(cfg, "synth")
    subj = bank.to_device(0)
    target, samples = synth_item(jax.random.PRNGKey(3), subj, cfg, tasks,
                                 "synth", knobs)
    assert target["segmentation"].shape[-1] == len(LABELS_LEFT)
    assert target["distance"].shape[-1] == 2
    for tree in (target, samples):
        for k, v in tree.items():
            assert np.isfinite(np.asarray(v)).all(), k
    # seg probability mass outside label 0 only where the left mask held:
    # right-hemisphere voxels (MNI x >= 0 in the debug subject's reg map)
    # must be background in the one-hot
    seg = np.asarray(target["segmentation"])
    fg = seg[..., 1:].sum(-1) > 0.5
    # the debug subject's reg x-coordinate is the warped MNI x; targets are
    # all warped by the same grid, so compare against the warped reg target
    regx = np.asarray(target["registration"][..., 0]) * 10000.0
    assert not (fg & (regx > 1.0)).any()
