"""Full-output end-to-end inference parity vs the reference (VERDICT r2 #5):
one shared random-init torch checkpoint -> torch .pth file ->
`Inferencer(ckpt_path=...)` on one side, and the reference's own
processor + postprocessor chain (the real functions from
Trainer/models/joiner.py:get_processors and
Trainer/models/__init__.py:get_postprocessor, the body of
utils/test_utils.py:290-312 evaluate_image) on the other — then every
output key is diffed at fp32 tolerance: T1, CT (x1000), bias_field,
segmentation, label (FreeSurfer ids), lp/lw/rp/rw, fake_cortical,
regx/regy/regz, plus `get_deformed_atlas` (test_utils.py:45-57).

A postprocessor-semantics drift (tanh render constants, FS-label table,
exp/clamp order) that stage-level tests can't see fails here.
"""

import os
import types

import numpy as np
import pytest

from _refstub import stub_reference_deps

stub_reference_deps()
import torch  # noqa: E402
from Trainer.models.unet3d.model import UNet3D as TorchUNet3D  # noqa: E402
from Trainer.models.head import TaskHead as TorchTaskHead  # noqa: E402
from Trainer.models.joiner import get_processors  # noqa: E402
from Trainer.models import (  # noqa: E402
    get_postprocessor,
    label_list_segmentation_brainseg_with_extracerebral as REF_LABELS,
)

import jax.numpy as jnp  # noqa: E402

from brainfm_tpu.config import AttrDict  # noqa: E402
from brainfm_tpu.infer.api import Inferencer, get_deformed_atlas  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle tier

TASKS = ["T1", "CT", "bias_field", "segmentation", "distance",
         "registration"]
N_LABELS = len(REF_LABELS)
SIZE = (24, 24, 24)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


class _TorchJoiner(torch.nn.Module):
    def __init__(self, backbone, head):
        super().__init__()
        self.backbone = backbone
        self.head = head


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    """One random-init torch model + its .pth + the Inferencer loading it."""
    torch.manual_seed(0)
    out_channels = {"T1": 1, "CT": 1, "bias_field_log": 1,
                    "segmentation": N_LABELS, "distance": 4,
                    "registration": 3}
    t_backbone = TorchUNet3D(1, f_maps=8, layer_order="gcl", num_groups=8,
                             num_levels=3)
    t_head = TorchTaskHead(None, f_maps_list=[8], out_channels=out_channels,
                           is_3d=True, out_feat_level=-1)
    t_model = _TorchJoiner(t_backbone, t_head).eval()
    pth = str(tmp_path_factory.mktemp("ckpt") / "shared_init.pth")
    torch.save({"model": t_model.state_dict()}, pth)

    cfg = AttrDict.from_nested({
        "task": {t: True for t in TASKS},
        "generator": {"left_hemis_only": False, "size": list(SIZE)},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 3, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "max_surf_distance": 3.0,
    })
    inf = Inferencer(cfg, ckpt_path=pth, exact=True)
    # the label tables must literally agree before any forward runs
    assert list(inf.cfg.label_list_segmentation) == list(REF_LABELS)
    return t_model, inf


def _reference_chain(t_model, x_t):
    """The reference evaluate_image body (test_utils.py:300-312) on a
    prebuilt model: forward -> get_processors -> get_postprocessor."""
    gen_args = _ns(
        tasks=list(TASKS),
        generator=_ns(left_hemis_only=False),
        max_surf_distance=3.0,
        label_list_segmentation=list(REF_LABELS),
    )
    train_args = _ns(losses=_ns(uncertainty=None, implicit_pathol=False),
                     output_names=[])
    with torch.no_grad():
        feats = t_model.backbone.get_feature(x_t)
        outs = dict(t_model.head(feats))
        outs["feat"] = feats
        outputs = [outs]
        samples = [{"input": x_t}]
        for proc in get_processors(gen_args, train_args, gen_args.tasks,
                                   "cpu"):
            outputs = proc(outputs, samples)
        outputs, _, _ = get_postprocessor(gen_args, train_args, outputs,
                                          samples, target=None, feats=None,
                                          tasks=gen_args.tasks)
    return outputs[0]


def _to_torch_layout(a):
    """(B, D, H, W, C) -> (B, C, D, H, W) numpy."""
    return np.transpose(np.asarray(a), (0, 4, 1, 2, 3))


def test_full_output_dict_parity(shared, rng):
    t_model, inf = shared
    x = rng.standard_normal((1, 1, *SIZE)).astype(np.float32)

    ref = _reference_chain(t_model, torch.tensor(x))
    got = inf.evaluate_image(jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                             run_postprocess=True, keep_feat=True)

    # the reference's full non-feat output key set must be present
    ref_keys = {k for k in ref if k != "feat"}
    assert ref_keys == {"T1", "CT", "bias_field", "segmentation", "label",
                        "lp", "lw", "rp", "rw", "fake_cortical",
                        "regx", "regy", "regz"}
    missing = ref_keys - set(got)
    assert not missing, f"missing output keys vs reference: {missing}"

    for k in sorted(ref_keys - {"label"}):
        r = ref[k].numpy()
        g = _to_torch_layout(got[k])
        # atol scales with the output's magnitude (CT is x1000, the
        # cortical render is O(100) — fp32 noise scales with them)
        np.testing.assert_allclose(
            g, r, rtol=2e-4, atol=2e-4 * max(1.0, float(np.abs(r).max())),
            err_msg=f"output '{k}' drifted from the reference chain")

    # label: integer FreeSurfer ids from argmax — identical up to argmax
    # flips on numerically-tied logits (random-init outputs)
    r_lab = ref["label"].numpy()
    g_lab = _to_torch_layout(got["label"])
    frac = float((r_lab != g_lab).mean())
    assert frac < 1e-3, f"label id mismatch fraction {frac}"
    assert set(np.unique(g_lab)) <= set(REF_LABELS)

    # feat pyramid rides along like the reference's (decoder levels)
    assert len(got["feat"]) == len(ref["feat"])


def test_deformed_atlas_parity(shared, rng):
    """get_deformed_atlas vs the reference formula (test_utils.py:45-57)
    evaluated with the reference's own fast_3D_interp_torch on the real
    gca.mgz atlas."""
    from Generator.utils import fast_3D_interp_torch  # noqa: E402

    import brainfm_tpu.utils.nifti as nifti

    mni, aff2 = nifti.load_nifti("/root/reference/files/gca.mgz")
    A = np.linalg.inv(aff2).astype(np.float32)
    # MGH payloads are big-endian; torch refuses non-native byte order
    mni_t = torch.tensor(
        np.ascontiguousarray(mni.astype(np.float32)), dtype=torch.float32)
    A_t = torch.tensor(A)

    t_model, inf = shared
    x = rng.standard_normal((1, 1, *SIZE)).astype(np.float32)
    got = inf.evaluate_image(jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
                             run_postprocess=True, keep_feat=False)
    regx = np.asarray(got["regx"])[0, ..., 0]
    regy = np.asarray(got["regy"])[0, ..., 0]
    regz = np.asarray(got["regz"])[0, ..., 0]
    labels = np.asarray(got["label"])[0, ..., 0]

    # reference formula on the same predictions
    M = torch.tensor(labels > 0)
    rx, ry, rz = (torch.tensor(v) for v in (regx, regy, regz))
    xx, yy, zz = 100 * rx[M], 100 * ry[M], 100 * rz[M]
    ii = A_t[0, 0] * xx + A_t[0, 1] * yy + A_t[0, 2] * zz + A_t[0, 3]
    jj = A_t[1, 0] * xx + A_t[1, 1] * yy + A_t[1, 2] * zz + A_t[1, 3]
    kk = A_t[2, 0] * xx + A_t[2, 1] * yy + A_t[2, 2] * zz + A_t[2, 3]
    vals = fast_3D_interp_torch(mni_t, ii, jj, kk, "linear")
    ref_def = torch.zeros_like(rx)
    ref_def[M] = vals

    ours = np.asarray(get_deformed_atlas(
        jnp.asarray(labels), jnp.asarray(regx), jnp.asarray(regy),
        jnp.asarray(regz)))
    np.testing.assert_allclose(ours, ref_def.numpy(), rtol=2e-4, atol=2e-3)
