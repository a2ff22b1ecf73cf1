"""Smoke tests for the inference demo CLI (scripts/demo_test.py): whole
volume, tiled, and multi-chip --mesh modes end-to-end — NIfTI in, NIfTI
predictions out (parity: /root/reference/scripts/demo_test.py test/
test_tile flows)."""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load_demo():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "demo_test", os.path.join(root, "scripts", "demo_test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def input_nifti(tmp_path_factory):
    from brainfm_tpu.utils.nifti import viewVolume

    d = tmp_path_factory.mktemp("demo_in")
    vol = np.random.default_rng(0).random((40, 36, 38)).astype(np.float32)
    paths = viewVolume(vol, names=["img"], save_dir=str(d))
    return paths[0] if isinstance(paths, (list, tuple)) else \
        os.path.join(str(d), "img.nii.gz")


@pytest.fixture(scope="module")
def small_cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_cfg")
    p = os.path.join(str(d), "small.yaml")
    with open(p, "w") as f:
        f.write(
            "task:\n  T1: true\n  segmentation: true\n"
            "backbone: unet3d\nf_maps: 4\nnum_levels: 2\nnum_groups: 4\n"
            "layer_order: gcl\nunit_feat: false\ntask_f_maps: [4]\n"
            "losses:\n  uncertainty:\n"
            "label_list_segmentation_with_csf: [0, 14, 15, 16, 24, 77, 85]\n")
    return p


def _run(argv, monkeypatch):
    demo = _load_demo()
    monkeypatch.setattr(sys, "argv", ["demo_test.py"] + argv)
    demo.main()


def test_demo_whole_volume(input_nifti, small_cfg, tmp_path, monkeypatch):
    out = str(tmp_path / "out")
    _run([input_nifti, "--save_dir", out, "--win", "32", "32", "32",
          "--train_cfg", small_cfg], monkeypatch)
    assert os.path.exists(os.path.join(out, "out_T1.nii.gz"))
    assert os.path.exists(os.path.join(out, "out_label.nii.gz"))


def test_demo_mesh_mode(input_nifti, small_cfg, tmp_path, monkeypatch):
    """--mesh 1x8: the volume runs depth-sharded over all 8 virtual
    devices through the same CLI."""
    out = str(tmp_path / "out_mesh")
    _run([input_nifti, "--save_dir", out, "--win", "32", "32", "32",
          "--train_cfg", small_cfg, "--mesh", "1x8"], monkeypatch)
    assert os.path.exists(os.path.join(out, "out_T1.nii.gz"))


def test_demo_tiled(input_nifti, small_cfg, tmp_path, monkeypatch):
    out = str(tmp_path / "out_tiled")
    _run([input_nifti, "--save_dir", out, "--win", "32", "32", "32",
          "--tiled", "--tile_win", "24", "24", "24",
          "--stride", "16", "16", "16", "--train_cfg", small_cfg],
         monkeypatch)
    assert os.path.exists(os.path.join(out, "out_T1.nii.gz"))
