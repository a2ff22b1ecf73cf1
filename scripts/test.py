"""Batch evaluation over dataset splits (parity: /root/reference/scripts/
test.py:23-232): multi-model x multi-resolution setups, per-subject
inference with output dumps, hemisphere-mask LUT, deformed-atlas rendering,
and file-pair metric scoring with shape alignment + one-hot dice over the
evaluation label LUT. Emits a per-setup metric table.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (backend config must precede brainfm imports)

from brainfm_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from brainfm_tpu.config import load_config
from brainfm_tpu.models.evaluator import Evaluator, hemis_mask_from


def parse_setups(spacings, add_bf_opts):
    """(parity: the `setups` grid of scripts/test.py:129-141)."""
    out = []
    for sp in spacings:
        for bf in add_bf_opts:
            out.append((None if sp == "native" else
                        [float(v) for v in sp.split(",")], bf))
    return out


def run_inference_cases(args, cfg, setups):
    """Per-model x per-setup inference over the input glob, dumping outputs
    (parity: scripts/test.py:152-226)."""
    from brainfm_tpu.infer.api import Inferencer
    from brainfm_tpu.infer.prepare import prepare_image
    from brainfm_tpu.utils.nifti import load_nifti, save_nifti

    for m in args.models:
        if "=" not in m:
            raise SystemExit(
                f"--models entry {m!r} must be <postfix>=<ckpt_path> "
                "(e.g. joint=ckp/brainfm_pretrained.pth)")
    if args.models and args.ckp_path:
        print("note: --models given; ignoring --ckp_path")
    models = [tuple(m.split("=", 1)) for m in args.models] or \
        [("default", args.ckp_path)]
    paths = sorted(glob.glob(args.input_glob))
    print(f"{len(paths)} inputs; {len(models)} models; {len(setups)} setups")
    for postfix, ckp in models:
        inf = Inferencer(cfg, ckpt_path=ckp or None)
        for spacing, add_bf in setups:
            tag = postfix + ("_BF" if add_bf else "")
            tag += "_" + ("-".join(str(s) for s in spacing)
                          if spacing else "1-1-1")
            save_dir = os.path.join(args.save_dir, tag)
            os.makedirs(save_dir, exist_ok=True)
            print(f"\nSetup {tag} -> {save_dir}")
            for p in paths:
                subj = os.path.basename(p).split(".")[0]
                subj_dir = os.path.join(save_dir, subj)
                os.makedirs(subj_dir, exist_ok=True)
                im, aff, _, extras = prepare_image(
                    p, list(args.win), spacing=spacing, add_bf=add_bf)
                hemis = None
                if args.hemis_seg_suffix:
                    stem = _stem(p)
                    seg_p = stem + args.hemis_seg_suffix
                    regx_p = stem + args.hemis_regx_suffix
                    if os.path.isfile(seg_p) and os.path.isfile(regx_p):
                        seg, _, _, _ = prepare_image(seg_p, list(args.win),
                                                     is_label=True,
                                                     rescale=False)
                        rx, _, _, _ = prepare_image(regx_p, list(args.win),
                                                    rescale=False)
                        hemis = hemis_mask_from(np.asarray(seg),
                                                np.asarray(rx))
                        save_nifti(os.path.join(subj_dir, "hemis_mask.nii.gz"),
                                   hemis, aff)
                        im = im * jax.numpy.asarray(hemis)
                outs = inf.evaluate_image(im)
                # deformed-atlas rendering from predicted MNI coords
                # (parity: scripts/test.py:223-224)
                if all(k in outs for k in ("regx", "regy", "regz", "label")) \
                        and args.atlas and os.path.isfile(args.atlas):
                    from brainfm_tpu.infer.api import get_deformed_atlas
                    outs["deformed_atlas"] = get_deformed_atlas(
                        outs["label"][0, ..., 0] > 0,
                        outs["regx"][0, ..., 0], outs["regy"][0, ..., 0],
                        outs["regz"][0, ..., 0], args.atlas)[None, ..., None]
                for k, v in outs.items():
                    if k == "feat" or not hasattr(v, "ndim") or v.ndim < 3:
                        continue
                    arr = np.asarray(v[0], np.float32)
                    if hemis is not None and arr.shape[:3] == hemis.shape:
                        arr = arr * hemis[..., None]
                    save_nifti(os.path.join(subj_dir, f"out_{k}.nii.gz"),
                               np.squeeze(arr), aff)
                print("  done:", subj)


def _stem(p):
    from brainfm_tpu.models.evaluator import path_stem

    return path_stem(p)


def run_pair_eval(args, cfg):
    """File-pair metric scoring with the full reference protocol
    (Evaluator.eval_files: align, flip, kill-labels, mask, one-hot LUT
    dice). Prints a per-metric table and writes scores.json."""
    ev = Evaluator(args.metrics, labels=None)
    preds = sorted(glob.glob(args.pred_glob))
    rows = []
    for p in preds:
        gt = _stem(p) + args.gt_suffix
        if not os.path.isfile(gt):
            continue
        res = ev.eval_files(
            p, gt, is_seg=args.is_seg or None, clamp=args.clamp,
            normalize=args.normalize, add_mask=args.add_mask,
            flip=args.flip,
            kill_target_labels=[int(v) for v in args.kill_labels])
        rows.append((os.path.basename(p), res))
        print(p, res)
    if rows:
        keys = list(rows[0][1])
        table = {k: float(np.mean([r[k] for _, r in rows])) for k in keys}
        print("\n== metric table (mean over %d pairs) ==" % len(rows))
        width = max(len(k) for k in keys)
        for k in keys:
            print(f"  {k:<{width}}  {table[k]:.4f}")
        os.makedirs(args.save_dir, exist_ok=True)
        with open(os.path.join(args.save_dir, "scores.json"), "w") as f:
            json.dump({"per_case": {n: r for n, r in rows},
                       "mean": table}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_glob", default=None,
                    help="run inference over these volumes")
    ap.add_argument("--pred_glob", default=None,
                    help="score these predictions against ground truth")
    ap.add_argument("--gt_suffix", default=".gt.nii.gz")
    ap.add_argument("--ckp_path", default=None)
    ap.add_argument("--models", nargs="*", default=[],
                    help="name=ckpt pairs (multi-model setups)")
    ap.add_argument("--spacings", nargs="*", default=["native"],
                    help='e.g. native 1,1,1 1.5,1.5,5 (multi-resolution)')
    ap.add_argument("--add_bf", action="store_true",
                    help="also run with a synthetic bias field applied")
    ap.add_argument("--save_dir", default="outs/test")
    ap.add_argument("--win", type=int, nargs=3, default=[220, 220, 220])
    ap.add_argument("--metrics", nargs="+",
                    default=["recon_l1", "recon_psnr", "recon_ssim"])
    ap.add_argument("--is_seg", action="store_true")
    ap.add_argument("--clamp", action="store_true")
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument("--add_mask", action="store_true")
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--kill_labels", nargs="*", default=[])
    ap.add_argument("--hemis_seg_suffix", default=None,
                    help="suffix of the cerebral label map (hemis masking)")
    ap.add_argument("--hemis_regx_suffix", default=".mni_reg.x.nii.gz")
    ap.add_argument("--gen_cfg", default=None)
    ap.add_argument("--train_cfg", default=None)
    ap.add_argument("--atlas", default=None,
                    help="MNI atlas for deformed-atlas rendering; defaults "
                         "to the `atlas_path` config key, then "
                         "$BRAINFM_ATLAS_PATH, then the reference fixture")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                       os.path.join(root, "cfgs/trainer/default_train.yaml"),
                       os.path.join(root, "cfgs/trainer/default_val.yaml"),
                       args.gen_cfg, args.train_cfg])
    if args.atlas is None:
        from brainfm_tpu.infer.api import default_atlas_path
        args.atlas = default_atlas_path(cfg)

    if args.input_glob:
        setups = parse_setups(args.spacings, [False, True] if args.add_bf
                              else [False])
        run_inference_cases(args, cfg, setups)
    if args.pred_glob:
        run_pair_eval(args, cfg)


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
