"""Host-staged subject bank (VERDICT r4 #3): `subject_staging: host` must
produce bit-identical training to the LRU-cached path while keeping ZERO
bank volumes device-resident across steps — the headroom that lets the
reference's full S=4 intra-subject sample stack (Generator/
datasets.py:728-750, brain_id.yaml:95-96) train at 128^3 on one chip."""

import glob
import os

import numpy as np

import jax

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.synth import SynthStatic, synth_item
from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack
from brainfm_tpu.train.loop import train


def _bank():
    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    bank.add_debug_subject(seed=1, extent=(20, 20, 20))
    return bank


def test_stage_matches_to_device_and_leaves_no_residue():
    """Same key + same subject -> identical synthesis whether the subject
    was staged (uncached) or LRU-cached; stage() must not touch the
    cache."""
    bank = _bank()
    scfg = SynthStatic(size=(16, 16, 16), all_samples=2, mild_samples=1)
    tasks = ("T1", "segmentation")
    knobs = build_knobs_stack(scfg, "synth")
    key = jax.random.PRNGKey(3)

    staged = bank.stage(1)
    t1, s1 = synth_item(key, staged, scfg, tasks, "synth", knobs)
    assert not getattr(bank, "_dev_cache", None), \
        "stage() must not populate the LRU cache"
    cached = bank.to_device(1)
    t2, s2 = synth_item(key, cached, scfg, tasks, "synth", knobs)
    assert 1 in bank._dev_cache

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (t1, s1), (t2, s2))


def _cfg(n_epochs=1, staging=None):
    d = {
        "task": {"T1": True, "segmentation": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16],
                      "max_rotation": 10, "max_shear": 0.1,
                      "max_scaling": 0.1, "nonlinear_transform": True},
        "losses": {"uncertainty": None, "image_grad": False},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
        "weights": {"seg_ce": 1.0, "seg_dice": 1.0, "image": 1.0},
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "n_epochs": n_epochs, "all_samples": 2,
        "mild_samples": 1,
    }
    if staging:
        d["subject_staging"] = staging
    return AttrDict.from_nested(d)


def _run(tmp_path, tag, staging):
    cfg = _cfg(staging=staging)
    cfg, model = build_model(cfg)
    _, weight_dict, loss_fn = make_criterion(cfg)
    out = str(tmp_path / tag)
    bank = _bank()
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=3,
          batch_items=1, seed=0, log_itr=10, val_itr=1, n_val_items=1)
    if staging == "host":
        assert not getattr(bank, "_dev_cache", None), \
            "host staging must leave no device-resident subjects"
    with open(os.path.join(out, "log.txt")) as f:
        import json

        return [json.loads(ln) for ln in f if ln.strip()]


def test_e2e_host_staging_matches_cached(tmp_path):
    """Full loop with subject_staging host vs cache: identical loss
    trajectory (same PRNG threading, same subjects), empty device cache
    afterward, and checkpoints still written."""
    rows_host = _run(tmp_path, "host", "host")
    rows_cache = _run(tmp_path, "cache", None)
    assert len(rows_host) == len(rows_cache) >= 1
    for rh, rc in zip(rows_host, rows_cache):
        np.testing.assert_allclose(rh["train_loss_total"],
                                   rc["train_loss_total"], rtol=1e-5)
        np.testing.assert_allclose(rh["val_loss_total"],
                                   rc["val_loss_total"], rtol=1e-5)
    assert glob.glob(str(tmp_path / "host" / "ckp" / "*"))
