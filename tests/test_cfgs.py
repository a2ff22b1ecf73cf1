"""Every shipped config must parse, cascade onto its default, and build a
model + criterion (parity: the reference's cfg families are public surface,
SURVEY.md §1)."""

import glob
import os

import pytest

from brainfm_tpu.config import load_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _merged(gen_name, train_name):
    gen = load_config([os.path.join(ROOT, "cfgs/generator/default.yaml"),
                       gen_name],
                      cfg_dir=os.path.join(ROOT, "cfgs/generator/train"))
    tr = load_config([os.path.join(ROOT, "cfgs/trainer/default_train.yaml"),
                      train_name],
                     cfg_dir=os.path.join(ROOT, "cfgs/trainer/train"))
    for k, v in gen.items():
        if k not in tr:
            tr[k] = v
    # shrink for CPU test speed
    tr.f_maps, tr.num_levels, tr.task_f_maps = 8, 2, [8]
    tr.generator.size = [16, 16, 16]
    return tr


GEN_TRAIN = sorted(os.path.basename(p)[:-5] for p in
                   glob.glob(os.path.join(ROOT, "cfgs/generator/train/*.yaml")))
TRAIN = sorted(os.path.basename(p)[:-5] for p in
               glob.glob(os.path.join(ROOT, "cfgs/trainer/train/*.yaml")))


def test_all_cfgs_parse():
    for f in glob.glob(os.path.join(ROOT, "cfgs/**/*.yaml"), recursive=True):
        load_config([f])


@pytest.mark.parametrize("train_name", TRAIN)
def test_trainer_variants_build(train_name):
    from brainfm_tpu.models import build_model
    from brainfm_tpu.models.build import build_inpaint_model
    from brainfm_tpu.models.criterion import make_criterion

    cfg = _merged("brain_id", train_name)
    if "+" in (cfg.backbone or ""):
        cfg2, pm, tm = build_inpaint_model(cfg)
        assert pm is not None and tm is not None
        return
    cfg, model = build_model(cfg)
    names, weight_dict, loss_fn = make_criterion(cfg)
    assert weight_dict


@pytest.mark.parametrize("gen_name", GEN_TRAIN)
def test_generator_variants_build(gen_name):
    from brainfm_tpu.models import build_model
    from brainfm_tpu.synth.params import SynthStatic

    cfg = _merged(gen_name, "joint_seg")
    cfg, model = build_model(cfg)
    static = SynthStatic.from_cfg(cfg)
    assert static.all_samples >= 1
