"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.config import AttrDict


def test_inferencer_loads_orbax_training_checkpoint(tmp_path, rng):
    """Inferencer must restore checkpoints written by train.save_checkpoint
    (full TrainState tree) from either the ckpt dir or its ckp/ root."""
    from brainfm_tpu.models import build_model
    from brainfm_tpu.train.checkpoint import save_checkpoint
    from brainfm_tpu.train.step import TrainState, build_optimizer
    from brainfm_tpu.infer.api import Inferencer

    cfg = AttrDict.from_nested({
        "task": {"T1": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16]},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 0.0,
    })
    bcfg, model = build_model(AttrDict.from_nested(dict(cfg)))
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = build_optimizer(bcfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    ckp_root = str(tmp_path / "ckp")
    save_checkpoint(ckp_root, 100, state)

    inf = Inferencer(AttrDict.from_nested(dict(cfg)), ckpt_path=ckp_root)
    out = inf.evaluate_image(x, run_postprocess=False)
    ref = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out["T1"]),
                               np.asarray(ref["T1"]), atol=1e-4)

    with pytest.raises(FileNotFoundError):
        Inferencer(AttrDict.from_nested(dict(cfg)), ckpt_path="/no/such/path")


def test_surface_state_reaches_target(rng):
    """surface task -> the item's inverse-deformation state is in the target
    so the host mesh warp can consume it."""
    from brainfm_tpu.synth import SynthStatic, synth_item
    from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack

    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    subj = bank.to_device(0)
    scfg = SynthStatic(size=(16, 16, 16), all_samples=1, mild_samples=1)
    tasks = ("T1", "surface")
    knobs = build_knobs_stack(scfg, "synth")
    target, samples = synth_item(jax.random.PRNGKey(0), subj, scfg, tasks,
                                 "synth", knobs)
    assert target["surface_svf_neg"].shape == (16, 16, 16, 3)
    assert target["surface_affine_A"].shape == (3, 3)

    # and it composes with the vertex warp
    from brainfm_tpu.synth.surface import deform_surface_vertices

    V = jnp.asarray(rng.random((50, 3)) * 15, jnp.float32)
    V2 = deform_surface_vertices(V, target["surface_affine_A"],
                                 target["surface_affine_c2"],
                                 target["surface_svf_neg"])
    assert V2.shape == (50, 3)
    assert np.isfinite(np.asarray(V2)).all()


def test_lesion_pool_attaches_pathol_prob(tmp_path, rng):
    """Real stroke-lesion pool files become subject['pathol_prob']."""
    from brainfm_tpu.synth.datasets import SynthDataset
    from brainfm_tpu.synth.params import SynthStatic
    from brainfm_tpu.utils.nifti import save_nifti

    root = tmp_path / "data"
    pdir = root / "atlas" / "pathology_probs"
    mdir = root / "atlas" / "pathology_maps"
    pdir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    lesion = (rng.random((12, 12, 12)) > 0.7).astype(np.float32)
    save_nifti(str(pdir / "l1.nii.gz"), lesion)
    save_nifti(str(mdir / "l1.nii.gz"), lesion)

    gen_cfg = AttrDict.from_nested({"data_root": str(root)})
    static = SynthStatic(size=(16, 16, 16), all_samples=1, mild_samples=1,
                         pathology_prob=1.0, augment_pathology=False)
    ds = SynthDataset("ATLAS", gen_cfg, ("T1", "pathology"), static,
                      bank_shape=(24, 24, 24), debug_subjects=1)
    assert len(ds._lesion_paths) == 1
    target, samples = ds.get(0, jax.random.PRNGKey(0))
    assert "pathology" in target


def test_build_datasets_accepts_project_schema():
    """build_datasets must consume the real cfg schema (generator: block)."""
    from brainfm_tpu.config import load_config
    from brainfm_tpu.synth.datasets import build_datasets

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml")])
    cfg.generator.size = [16, 16, 16]
    dsets = build_datasets(cfg, ("T1", "segmentation"))
    assert "_concat" in dsets
    # default.yaml: all_samples 1, mild_samples 0 -> severe knobs
    name = next(k for k in dsets if k != "_concat")
    st = dsets[name].static
    assert st.all_samples == 1 and st.mild_samples == 0


def test_apply_condition_mask_flip(rng):
    """(parity: Trainer/engine.py:102-112)"""
    from brainfm_tpu.train.loop import apply_condition

    x = jnp.asarray(rng.random((2, 1, 8, 8, 8, 1)), jnp.float32)
    p = jnp.zeros((2, 1, 8, 8, 8, 1)).at[:, :, 2:4].set(1.0)
    batch = {"samples": {"input": x}, "targets": {"pathology": p}}

    out = apply_condition(batch, "mask")
    assert float(jnp.sum(out["samples"]["input"] * p)) == 0.0
    assert out["cond"].shape == x.shape

    out2 = apply_condition(batch, "mask+flip")
    assert out2["cond"].shape[-1] == 2

    out3 = apply_condition(batch, "flip")
    np.testing.assert_allclose(np.asarray(out3["cond"]),
                               np.asarray(jnp.flip(x, axis=2)))
    assert apply_condition(batch, None) is batch


def test_unet2d_forward(rng):
    from brainfm_tpu.models.unet3d import UNet2D

    m = UNet2D(f_maps=8, num_levels=2)
    x = jnp.asarray(rng.random((1, 16, 16, 1)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(p, x, method=m.get_feature)
    assert feats[-1].shape == (1, 16, 16, 8)


def test_age_task_end_to_end(rng):
    """Age target flows from the (debug) subject through synth_item and the
    criterion to a finite loss."""
    from brainfm_tpu.synth import SynthStatic, synth_item
    from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack

    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    subj = bank.to_device(0)
    assert "age" in subj
    scfg = SynthStatic(size=(16, 16, 16), all_samples=1, mild_samples=1)
    knobs = build_knobs_stack(scfg, "synth")
    target, samples = synth_item(jax.random.PRNGKey(0), subj, scfg,
                                 ("T1", "age"), "synth", knobs)
    assert float(target["age"]) > 0


def test_lesion_pool_uncapped_sampling(tmp_path, rng):
    """VERDICT r2 weak #6: the lesion roulette must span the WHOLE pool
    (parity: random.choice over all pathology_prob_paths, Generator/
    utils.py:437-441) — only decoded residency is LRU-bounded by
    gen_cfg.lesion_resident."""
    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.synth.datasets import SynthDataset
    from brainfm_tpu.synth.params import SynthStatic
    from brainfm_tpu.utils.nifti import save_nifti

    root = tmp_path / "data"
    pdir = root / "atlas" / "pathology_probs"
    mdir = root / "atlas" / "pathology_maps"
    pdir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    n_pool = 24  # > the default resident cap of 16
    for i in range(n_pool):
        lesion = (rng.random((8, 8, 8)) > 0.7).astype(np.float32)
        lesion[0, 0, 0] = i  # fingerprint the file
        save_nifti(str(pdir / f"l{i:02d}.nii.gz"), lesion)
        save_nifti(str(mdir / f"l{i:02d}.nii.gz"), lesion)

    gen_cfg = AttrDict.from_nested({"data_root": str(root),
                                    "lesion_resident": 4})
    static = SynthStatic(size=(16, 16, 16), all_samples=1, mild_samples=1,
                         pathology_prob=1.0, augment_pathology=False)
    ds = SynthDataset("ATLAS", gen_cfg, ("T1", "pathology"), static,
                      bank_shape=(24, 24, 24), debug_subjects=1)
    assert len(ds._lesion_paths) == n_pool
    assert len(ds._lesion_cache) == 4  # residency bounded

    subj = ds.bank.to_device(0)
    seen = set()
    for _ in range(400):
        s = ds._prep_subject(dict(subj), "synth")
        seen.add(float(s["pathol_prob"][0, 0, 0]))
    # every pool file reachable (400 uniform draws over 24 files miss one
    # with p < 1e-7); residency stays bounded the whole time
    assert len(seen) == n_pool, sorted(seen)
    assert len(ds._lesion_cache) == 4
