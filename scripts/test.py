"""Batch evaluation over dataset splits (parity: /root/reference/scripts/
test.py): run inference over files, compute metrics vs ground truth."""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from brainfm_tpu.config import load_config
from brainfm_tpu.infer.api import Inferencer
from brainfm_tpu.infer.prepare import prepare_image
from brainfm_tpu.models.evaluator import Evaluator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_glob", required=True)
    ap.add_argument("--gt_suffix", default=None,
                    help="suffix replacing the input's to locate ground truth")
    ap.add_argument("--ckp_path", default=None)
    ap.add_argument("--save_dir", default="outs/test")
    ap.add_argument("--win", type=int, nargs=3, default=[220, 220, 220])
    ap.add_argument("--metrics", nargs="+",
                    default=["recon_l1", "recon_psnr", "recon_ssim"])
    ap.add_argument("--gen_cfg", default=None)
    ap.add_argument("--train_cfg", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                       os.path.join(root, "cfgs/trainer/default_train.yaml"),
                       os.path.join(root, "cfgs/trainer/default_val.yaml"),
                       args.gen_cfg, args.train_cfg])

    inf = Inferencer(cfg, ckpt_path=args.ckp_path)
    ev = Evaluator(args.metrics, labels=cfg.label_list_segmentation)

    paths = sorted(glob.glob(args.input_glob))
    print(f"{len(paths)} inputs")
    all_res = []
    # only fetch the outputs the requested metrics read — the full output
    # dict includes multi-GB soft segmentations per case
    needed = {"label", "pathology"}
    for name in args.metrics:
        pre = name.rsplit("_", 1)[0]
        needed.add({"recon": "T1", "sr": "high_res", "bf": "bias_field",
                    "feat": "T1"}.get(pre, pre))
    for p in paths:
        im, aff, _, _ = prepare_image(p, list(args.win))
        outs = inf.evaluate_image(im)
        outs = {k: np.asarray(v)[0] for k, v in outs.items()
                if k in needed and hasattr(v, "ndim")}
        if args.gt_suffix:
            # strip the full NIfTI extension from the basename only
            # (str.replace mangled .nii.gz names and directory components)
            stem = p[: -len(".nii.gz")] if p.endswith(".nii.gz") else \
                p[: -len(".nii")] if p.endswith(".nii") else p
            gt_path = stem + args.gt_suffix
            if os.path.isfile(gt_path):
                gt, _, _, _ = prepare_image(gt_path, list(args.win))
                res = ev.eval(outs, {"T1": np.asarray(gt)})
                all_res.append(res)
                print(p, res)
    if all_res:
        keys = all_res[0].keys()
        print("mean:", {k: float(np.mean([r[k] for r in all_res]))
                        for k in keys})


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
