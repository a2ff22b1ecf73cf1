"""Feature extraction demo (parity: /root/reference/scripts/
demo_get_feature.py:27-55 `get_brainid_feat`): the 64-channel last-decoder
feature map for any input volume."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (backend config must precede brainfm imports)

from brainfm_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from brainfm_tpu.config import load_config
from brainfm_tpu.infer.api import Inferencer


def get_brainid_feat(img_path, ckp_path=None, win_size=None, cfg_paths=()):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                       os.path.join(root, "cfgs/trainer/default_train.yaml"),
                       *cfg_paths])
    inf = Inferencer(cfg, ckpt_path=ckp_path)
    feat = inf.get_feature(img_path, win_size)
    return feat  # (1, D, H, W, 64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_path")
    ap.add_argument("--ckp_path", default=None)
    ap.add_argument("--save_path", default=None)
    ap.add_argument("--train_cfg", default=None)
    ap.add_argument("--win", type=int, nargs=3, default=None)
    args = ap.parse_args()
    feat = get_brainid_feat(args.img_path, args.ckp_path,
                            win_size=args.win,
                            cfg_paths=(args.train_cfg,) if args.train_cfg
                            else ())
    print("feature:", feat.shape, feat.dtype)
    if args.save_path:
        np.save(args.save_path, np.asarray(feat))
        print("saved to", args.save_path)


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
