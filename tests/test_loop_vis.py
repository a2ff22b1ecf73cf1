"""End-to-end training loop: epochs, checkpointing, visualization montages,
loss-curve plot (parity: scripts/train.py orchestration + engine vis_itr)."""

import glob
import os

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.synth.engine import SubjectBank
from brainfm_tpu.train.loop import train


def test_loop_with_vis_and_plot(tmp_path):
    cfg = AttrDict.from_nested({
        "task": {"T1": True, "segmentation": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16],
                      "max_rotation": 10, "max_shear": 0.1, "max_scaling": 0.1,
                      "nonlinear_transform": True},
        "losses": {"uncertainty": None, "image_grad": False},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
        "weights": {"seg_ce": 1.0, "seg_dice": 1.0, "image": 1.0},
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "n_epochs": 2, "all_samples": 1,
        "mild_samples": 1,
    })
    cfg, model = build_model(cfg)
    names, weight_dict, loss_fn = make_criterion(cfg)
    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))

    out = str(tmp_path / "run")
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=2,
          batch_items=1, seed=0, log_itr=1, vis_itr=2)

    assert os.path.exists(os.path.join(out, "log.txt"))
    assert len(glob.glob(os.path.join(out, "ckp", "*"))) >= 1
    assert len(glob.glob(os.path.join(out, "vis", "vis_*.png"))) >= 1
    assert os.path.exists(os.path.join(out, "log.txt.png"))


def test_val_best_checkpoint_and_resume(tmp_path):
    """Validation loop + best-checkpoint protocol (parity: best_val_stats
    in every checkpoint, previous-best backup rename, rolling retention —
    scripts/train.py:173,196-214) and resume-with-best."""
    import json

    from brainfm_tpu.train.checkpoint import latest_checkpoint, read_extra

    cfg = AttrDict.from_nested({
        "task": {"T1": True},
        "generator": {"left_hemis_only": False, "size": [16, 16, 16],
                      "max_rotation": 10, "max_shear": 0.1, "max_scaling": 0.1,
                      "nonlinear_transform": True},
        "losses": {"uncertainty": None, "image_grad": False},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15],
        "weights": {"image": 1.0},
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "n_epochs": 3, "all_samples": 1,
        "mild_samples": 1,
    })
    cfg, model = build_model(cfg)
    _, weight_dict, loss_fn = make_criterion(cfg)
    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))

    out = str(tmp_path / "run")
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=2,
          batch_items=1, seed=0, log_itr=1, val_itr=1, n_val_items=1,
          keep_ckpt=2)

    ckp = os.path.join(out, "ckp")
    # rolling GC: only the last 2 epoch checkpoints survive
    assert len(glob.glob(os.path.join(ckp, "ckpt_[0-9]*"))) == 2
    # best protocol: a best exists; with 3 validations the previous best
    # was renamed to the backup at least once
    assert os.path.isdir(os.path.join(ckp, "ckpt_best"))
    best_extra = read_extra(os.path.join(ckp, "ckpt_best"))
    assert "best_val_stats" in best_extra
    assert "loss_total" in best_extra["best_val_stats"]
    # every epoch checkpoint carries best_val_stats
    latest = latest_checkpoint(ckp)
    extra = read_extra(latest)
    assert extra["best_val_stats"] is not None
    # val metrics are logged per epoch
    with open(os.path.join(out, "log.txt")) as f:
        lines = [json.loads(line) for line in f]
    assert all("val_loss_total" in ln for ln in lines)

    # resume from the latest epoch checkpoint: best_val_stats must carry
    # over and training continues at the right epoch
    cfg.n_epochs = 4
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=2,
          batch_items=1, seed=0, log_itr=1, val_itr=1, n_val_items=1,
          keep_ckpt=2, resume=latest)
    with open(os.path.join(out, "log.txt")) as f:
        lines = [json.loads(line) for line in f]
    assert lines[-1]["epoch"] == 3
    assert read_extra(latest_checkpoint(ckp))["best_val_stats"] is not None


def test_hemis_config_end_to_end(tmp_path):
    """The shipped left-hemisphere config pair (brain_id_hemis +
    joint_hemis, parity: reference cfgs of the same names) must train end
    to end: the synth engine's 18-channel LABELS_LEFT one-hot and
    2-channel lp/lw distance stack have to line up with the model head
    widths that process_args derives from the same flag
    (Trainer/models/__init__.py:37-125), through the criterion to a
    finite loss."""
    import json

    from brainfm_tpu.config import load_config
    from brainfm_tpu.models.build import LABELS_LEFT

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                       "brain_id_hemis"],
                      cfg_dir=os.path.join(root, "cfgs/generator/train"))
    cfg = load_config([os.path.join(root, "cfgs/trainer/default_train.yaml"),
                       "joint_hemis"],
                      cfg_dir=os.path.join(root, "cfgs/trainer/train"))
    for k, v in gen.items():
        if k not in cfg:
            cfg[k] = v
    assert cfg.generator.left_hemis_only and cfg.generator.photo_prob > 0
    # shrink for CPU test speed; keep the hemis semantics untouched
    cfg.f_maps, cfg.num_levels, cfg.task_f_maps = 8, 2, [8]
    cfg.generator.size = [16, 16, 16]
    cfg.generator.all_samples, cfg.generator.mild_samples = 2, 1
    cfg.n_epochs = 1

    cfg, model = build_model(cfg)
    assert cfg.n_labels == len(LABELS_LEFT) == 18
    assert cfg.out_channels["distance"] == 2
    _, weight_dict, loss_fn = make_criterion(cfg)
    bank = SubjectBank(bank_shape=(24, 24, 24))
    bank.add_debug_subject(seed=0, extent=(20, 20, 20))

    out = str(tmp_path / "run")
    train(cfg, model, weight_dict, loss_fn, bank, out, itr_per_epoch=2,
          batch_items=1, seed=0, log_itr=1, val_itr=1, n_val_items=1)

    with open(os.path.join(out, "log.txt")) as f:
        lines = [json.loads(line) for line in f]
    assert lines, "no training log lines"
    import math
    assert all(math.isfinite(ln["train_loss_total"])
               and math.isfinite(ln["val_loss_total"]) for ln in lines)
