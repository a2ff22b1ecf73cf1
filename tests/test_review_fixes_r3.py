"""Round-3 review-finding regression tests: conditioned training end to
end, twostage orbax checkpoints, bank-path resume reproducibility, and
mesh-aware batched serving (loop.py / infer/api.py findings)."""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.synth.engine import SubjectBank
from brainfm_tpu.train.loop import train


def _cond_cfg():
    return AttrDict.from_nested({
        "task": {"T1": True, "pathology": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16],
                      "max_rotation": 10, "max_shear": 0.1,
                      "max_scaling": 0.1, "nonlinear_transform": True},
        "losses": {"uncertainty": None, "image_grad": False},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
        "weights": {"pathol_ce": 1.0, "pathol_dice": 1.0, "image": 1.0},
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "n_epochs": 1, "all_samples": 1,
        "mild_samples": 1, "condition": "mask",
    })


@pytest.mark.slow
def test_conditioned_training_end_to_end(tmp_path):
    """cfg.condition='mask' through the REAL loop: init must build the
    model with the cond channels the step applies it with (review finding:
    _make_state initialized without cond -> ScopeParamShapeError at the
    first step), and validation must condition its batches the same way
    (finding: eval_step applied the model without cond)."""
    cfg = _cond_cfg()
    cfg, model = build_model(cfg)
    _, weight_dict, loss_fn = make_criterion(cfg)
    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    out = str(tmp_path / "run")
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=2,
          batch_items=1, seed=0, log_itr=1, val_itr=1, n_val_items=1)
    lines = [json.loads(ln) for ln in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(lines[-1]["train_loss_total"])
    assert np.isfinite(lines[-1]["val_loss_total"])


@pytest.mark.slow
def test_bank_resume_reproducible(tmp_path):
    """Bank-path determinism across resume (review finding: rng_host and
    the PRNG key restarted from scratch on resume, so a resumed epoch
    replayed epoch-0 draws): 2 epochs straight must equal 1 epoch +
    resume + 1 epoch, parameter for parameter."""
    def cfg_and_model(n_epochs):
        cfg = AttrDict.from_nested({
            "task": {"T1": True},
            "generator": {"left_hemis_only": False, "size": [16, 16, 16],
                          "max_rotation": 10, "max_shear": 0.1,
                          "max_scaling": 0.1, "nonlinear_transform": True},
            "losses": {"uncertainty": None, "image_grad": False},
            "backbone": "unet3d", "f_maps": 8, "num_levels": 2,
            "num_groups": 8, "layer_order": "gcl", "unit_feat": False,
            "task_f_maps": [8],
            "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
            "weights": {"image": 1.0},
            "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
            "clip_max_norm": 1.0, "n_epochs": n_epochs, "all_samples": 1,
            "mild_samples": 1,
        })
        cfg, model = build_model(cfg)
        _, wd, lf = make_criterion(cfg)
        return cfg, model, wd, lf

    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))

    cfg, model, wd, lf = cfg_and_model(2)
    s_straight = train(cfg, model, wd, lf, bank, str(tmp_path / "a"),
                       itr_per_epoch=2, batch_items=1, seed=3, val_itr=0)

    cfg1, model, wd, lf = cfg_and_model(1)
    train(cfg1, model, wd, lf, bank, str(tmp_path / "b"),
          itr_per_epoch=2, batch_items=1, seed=3, val_itr=0)
    ck = sorted(glob.glob(str(tmp_path / "b" / "ckp" / "ckpt_*")))[-1]
    cfg2, model, wd, lf = cfg_and_model(2)
    s_resumed = train(cfg2, model, wd, lf, bank, str(tmp_path / "b2"),
                      itr_per_epoch=2, batch_items=1, seed=3, val_itr=0,
                      resume=ck)

    for a, b in zip(jax.tree.leaves(s_straight.params),
                    jax.tree.leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_twostage_inferencer_loads_orbax(tmp_path):
    """TwoStageInferencer must load this repo's own training checkpoints
    (one orbax TrainState with params={'pathol','task'}) — review finding:
    it silently fell through to random init on any non-.pth path."""
    from brainfm_tpu.infer.api import TwoStageInferencer
    from brainfm_tpu.models.build import build_inpaint_model
    from brainfm_tpu.train.checkpoint import save_checkpoint
    from brainfm_tpu.train.step import TrainState, build_optimizer

    base = AttrDict.from_nested({
        "task": {"T1": True, "pathology": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16]},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 0.0,
    })
    cfg, pmodel, tmodel = build_inpaint_model(
        AttrDict.from_nested(dict(base)))
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    params = {"pathol": pmodel.init(jax.random.PRNGKey(1), x),
              "task": tmodel.init(jax.random.PRNGKey(2), x,
                                  cond=jnp.zeros_like(x))}
    opt = build_optimizer(cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    ckp = str(tmp_path / "ckp")
    save_checkpoint(ckp, 10, state)

    inf = TwoStageInferencer(AttrDict.from_nested(dict(base)),
                             pathol_ckpt=ckp, task_ckpt=ckp)
    ref = jax.tree.leaves(params["pathol"])[0]
    got = jax.tree.leaves(inf.pathol_params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
    ref_t = jax.tree.leaves(params["task"])[0]
    got_t = jax.tree.leaves(inf.task_params)[0]
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t))
    out = inf.evaluate_image(np.zeros((16, 16, 16), np.float32))
    assert "T1" in out

    with pytest.raises(FileNotFoundError):
        TwoStageInferencer(AttrDict.from_nested(dict(base)),
                           pathol_ckpt=str(tmp_path / "nope"))


@pytest.mark.slow
def test_batched_serving_data_only_mesh(tmp_path):
    """Mesh-aware batched serving (review findings: evaluate_image refused
    a mesh without a 'space' axis; partial-bucket reuse padded to a
    batch_size that can violate the data-axis divisibility)."""
    from jax.sharding import Mesh

    from brainfm_tpu.infer.api import Inferencer
    from brainfm_tpu.utils.nifti import save_nifti

    cfg = AttrDict.from_nested({
        "task": {"T1": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16]},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
    })
    mesh = Mesh(np.asarray(jax.devices()), ("data",))  # NO 'space' axis
    inf = Inferencer(cfg, mesh=mesh)

    # single-volume path on a data-only mesh (was an AssertionError)
    out = inf.evaluate_image(np.zeros((16, 16, 16), np.float32),
                             run_postprocess=False)
    assert "T1" in out

    # 5 same-shape files at batch_size=3 over data_n=8: the full group
    # records the compiled executable, the partial group must pad to the
    # data-axis multiple (8), not to batch_size=3's raw value
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"v{i}.nii")
        save_nifti(p, rng.random((16, 16, 16)).astype(np.float32))
        paths.append(p)
    res = inf.evaluate_path(paths, str(tmp_path / "out"),
                            win_size=(16, 16, 16), batch_size=3)
    assert len(res) == 5
    for p in res:
        assert glob.glob(os.path.join(p, "*.nii*")), p


def test_checkpoint_sort_numeric_past_1e6(tmp_path):
    """latest_checkpoint / GC must sort ckpt dirs NUMERICALLY: a name sort
    puts ckpt_1000000 before ckpt_999999, so past step 1e6 the newest
    checkpoint would be GC'd and resume would pick a stale one."""
    from brainfm_tpu.train.checkpoint import latest_checkpoint

    for s in (999998, 999999, 1000000):
        os.makedirs(tmp_path / f"ckpt_{s:06d}")
    got = latest_checkpoint(str(tmp_path))
    assert got is not None and got.endswith("ckpt_1000000")


def test_evaluator_dice_defaults_to_eval_labels():
    """Evaluator.eval with labels=None must score the 33-label eval list,
    not the non-existent id 1 (which made seg_dice a constant 1.0)."""
    from brainfm_tpu.models.evaluator import EVAL_LABELS, Evaluator

    rng = np.random.default_rng(0)
    gt = rng.choice(EVAL_LABELS[1:9], (12, 12, 12))
    pred_good = gt.copy()
    pred_bad = np.roll(gt, 4, axis=0)
    ev = Evaluator(["seg_dice"])
    good = ev.eval({"label": pred_good}, {"label": gt})["seg_dice"]
    bad = ev.eval({"label": pred_bad}, {"label": gt})["seg_dice"]
    assert good > 0.99
    assert bad < good - 0.05  # imperfect predictions must score lower


def test_evaluator_multisample_ssim():
    """(S, D, H, W) outputs score per sample and average — the 3-D ssim
    filter must never blur across the sample axis."""
    from brainfm_tpu.models.evaluator import Evaluator

    rng = np.random.default_rng(1)
    t = rng.random((16, 16, 16)).astype(np.float32)
    out = np.stack([t, t])  # two identical perfect samples
    ev = Evaluator(["recon_ssim", "recon_l1"])
    res = ev.eval({"T1": out[..., None]}, {"T1": t[..., None]})
    assert res["recon_ssim"] > 0.999
    assert res["recon_l1"] < 1e-6


def test_mix_synth_engages_without_image_tasks():
    """mix_synth_prob must blend real contrasts even when T1/T2/FLAIR are
    not requested TASKS (the reference deforms them unconditionally before
    mixing, datasets.py:688-691): previously the mix silently degraded to
    a no-op. The mix-only contrast must also NOT leak into the targets."""
    from brainfm_tpu.synth import SynthStatic, synth_item
    from brainfm_tpu.synth.engine import build_knobs_stack

    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    subj = bank.to_device(0)
    assert "T1" in subj
    tasks = ("segmentation",)
    key = jax.random.PRNGKey(11)

    def run(p):
        scfg = SynthStatic(size=(16, 16, 16), all_samples=1, mild_samples=1,
                           mix_synth_prob=p)
        knobs = build_knobs_stack(scfg, "synth")
        return synth_item(key, subj, scfg, tasks, "synth", knobs)

    t_mix, s_mix = run(1.0)
    t_off, s_off = run(0.0)
    assert "T1" not in t_mix and "T1" not in t_off
    a = np.asarray(s_mix["input"])
    b = np.asarray(s_off["input"])
    assert not np.allclose(a, b), \
        "mix_synth_prob=1.0 produced the identical sample — mixing no-op"


def test_augmentation_steps_flat_list_form():
    """The reference's flat-list augmentation_steps config form (one chain
    for both synth and real) must parse — previously AttributeError."""
    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.synth import SynthStatic

    cfg = AttrDict.from_nested({
        "generator": {"size": [16, 16, 16]},
        "augmentation_steps": ["gamma", "noise"],
    })
    scfg = SynthStatic.from_cfg(cfg)
    assert scfg.aug_steps_synth == ("gamma", "noise")
    assert scfg.aug_steps_real == ("gamma", "noise")
    # dict form still works
    cfg2 = AttrDict.from_nested({
        "generator": {"size": [16, 16, 16]},
        "augmentation_steps": {"synth": ["gamma"], "real": ["noise"]},
    })
    scfg2 = SynthStatic.from_cfg(cfg2)
    assert scfg2.aug_steps_synth == ("gamma",)
    assert scfg2.aug_steps_real == ("noise",)


def test_low_res_only_never_emits_1mm_axes():
    """low_res_only restricts the acquisition model to the two low-field
    branches — no draw may produce a 1 mm axis (the 1mm-iso or clinical
    branches)."""
    from brainfm_tpu.synth import resolution_sampler

    res = jax.vmap(lambda k: resolution_sampler(k, True)[0])(
        jax.random.split(jax.random.PRNGKey(0), 128))
    assert float(jnp.min(res)) > 1.0
