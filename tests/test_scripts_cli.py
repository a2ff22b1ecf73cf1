"""CLI surface of scripts/test.py: the file-pair scoring mode with the
metric table and scores.json output (parity: the metric loop of
/root/reference/scripts/test.py)."""

import json
import os
import runpy
import sys

import numpy as np

from brainfm_tpu.utils.nifti import save_nifti


def test_pair_eval_cli(tmp_path, rng, capsys):
    for i in range(2):
        gt = rng.random((12, 12, 12)).astype(np.float32)
        save_nifti(str(tmp_path / f"case{i}.out.nii.gz"), gt + 0.02)
        save_nifti(str(tmp_path / f"case{i}.out.gt.nii.gz"), gt)
    save_dir = str(tmp_path / "scores")
    argv = ["test.py",
            "--pred_glob", str(tmp_path / "*.out.nii.gz"),
            "--gt_suffix", ".gt.nii.gz",
            "--metrics", "recon_l1", "recon_psnr",
            "--save_dir", save_dir]
    old = sys.argv
    sys.argv = argv
    try:
        # run_name != __main__ so the script's main() isn't auto-invoked
        # (its __main__ guard hard-exits); call it from the namespace
        mod = runpy.run_path("/root/repo/scripts/test.py",
                             run_name="not_main")
        mod["main"]()
    finally:
        sys.argv = old
    captured = capsys.readouterr()
    assert "metric table" in captured.out
    with open(os.path.join(save_dir, "scores.json")) as f:
        scores = json.load(f)
    assert len(scores["per_case"]) == 2
    assert 0.0 < scores["mean"]["recon_l1"] < 0.05
    assert scores["mean"]["recon_psnr"] > 20.0
