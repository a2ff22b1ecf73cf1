"""Whole-volume and tiled inference demo.

Parity with /root/reference/scripts/demo_test.py: `test()` whole-volume and
`test_tile()` sliding-window inference with deformed-atlas rendering — with
the model built and jitted once (the reference reloads it per tile).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (backend config must precede brainfm imports)

from brainfm_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp

from brainfm_tpu.config import load_config
from brainfm_tpu.infer.api import (Inferencer, default_atlas_path,
                                   get_deformed_atlas)
from brainfm_tpu.infer.prepare import prepare_image
from brainfm_tpu.utils.nifti import viewVolume


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_path")
    ap.add_argument("--ckp_path", default=None)
    ap.add_argument("--save_dir", default="outs/demo_test")
    ap.add_argument("--tiled", action="store_true")
    ap.add_argument("--win", type=int, nargs=3, default=[220, 220, 220])
    ap.add_argument("--tile_win", type=int, nargs=3, default=[160, 160, 160])
    ap.add_argument("--stride", type=int, nargs=3, default=[80, 80, 80])
    ap.add_argument("--gen_cfg", default=None)
    ap.add_argument("--train_cfg", default=None)
    ap.add_argument("--atlas", default=None,
                    help="MNI atlas volume for deformed-atlas rendering; "
                         "defaults to the `atlas_path` config key, then "
                         "$BRAINFM_ATLAS_PATH, then the reference fixture")
    ap.add_argument("--exact", action="store_true",
                    help="fp32 highest-precision matmuls (reference parity);"
                         " default is bf16 compute (~6x faster)")
    ap.add_argument("--mesh", default=None, metavar="DATAxSPACE",
                    help="multi-chip whole-volume inference: shard the"
                         " volume depth-wise over the mesh 'space' axis"
                         " (e.g. 1x8); volumes beyond one chip's HBM run"
                         " untiled")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([
        os.path.join(root, "cfgs/generator/default.yaml"),
        os.path.join(root, "cfgs/trainer/default_train.yaml"),
        os.path.join(root, "cfgs/trainer/default_val.yaml"),
        args.gen_cfg, args.train_cfg])
    if args.atlas is None:
        args.atlas = default_atlas_path(cfg)

    mesh = None
    if args.mesh:
        from brainfm_tpu.parallel.mesh import make_mesh

        d, sp = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_mesh(data=d, space=sp)
    inf = Inferencer(cfg, ckpt_path=args.ckp_path,
                     compute_dtype=jnp.float32 if args.exact else jnp.bfloat16,
                     exact=args.exact, mesh=mesh)
    im, aff, crop_start, orig_shp = prepare_image(args.img_path,
                                                  list(args.win))
    os.makedirs(args.save_dir, exist_ok=True)

    if args.tiled:
        outs = inf.evaluate_tiled(im, tuple(args.stride), tuple(args.tile_win))
    else:
        outs = inf.evaluate_image(im)
        outs = {k: (v[0] if hasattr(v, "ndim") and v.ndim >= 4 else v)
                for k, v in outs.items() if k != "feat"}

    # deformed-atlas rendering from predicted MNI coords
    # (parity: demo_test.py:61-63,102-104)
    if all(k in outs for k in ("regx", "regy", "regz", "label")) \
            and os.path.isfile(args.atlas):
        atlas = get_deformed_atlas(outs["label"][..., 0] > 0,
                                   outs["regx"][..., 0],
                                   outs["regy"][..., 0],
                                   outs["regz"][..., 0], args.atlas)
        outs["deformed_atlas"] = atlas

    for k, v in outs.items():
        if hasattr(v, "ndim"):
            arr = np.asarray(v).squeeze()
            viewVolume(arr, aff, names=[f"out_{k}"], save_dir=args.save_dir)
            print("saved", k, arr.shape)


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
