"""Generator visualization demo (parity: /root/reference/scripts/
demo_generator.py:35-123): dump synthesized inputs and targets per
deformation/sample to NIfTI for inspection."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (backend config must precede brainfm imports)

from brainfm_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from brainfm_tpu.config import load_config
from brainfm_tpu.synth import SynthStatic, synth_item
from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack
from brainfm_tpu.utils.nifti import viewVolume


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_cfg", default=None)
    ap.add_argument("--save_dir", default="outs/demo_generator")
    ap.add_argument("--num_deformations", type=int, default=2)
    ap.add_argument("--mode", default="synth",
                    choices=["synth", "T1", "T2", "FLAIR", "CT"])
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                       args.gen_cfg],
                      cfg_dir=os.path.join(root, "cfgs/generator/train"))
    scfg = SynthStatic.from_cfg(cfg)
    tasks = tuple(k for k, v in dict(cfg.task).items() if v)

    from scripts.train import build_bank

    bank = build_bank(cfg)
    knobs = build_knobs_stack(scfg, args.mode)
    os.makedirs(args.save_dir, exist_ok=True)

    subject = bank.to_device(0)
    if args.mode != "synth":
        # real-image branch reads subject['image'] (parity: read_input,
        # Generator/datasets.py:572-588)
        if args.mode not in subject:
            raise SystemExit(f"subject has no {args.mode} volume")
        subject = dict(subject)
        subject["image"] = subject[args.mode]

    for d in range(args.num_deformations):
        t0 = time.time()
        target, samples = synth_item(jax.random.PRNGKey(d), subject,
                                     scfg, tasks, args.mode, knobs)
        jax.block_until_ready(samples)
        print(f"deformation {d}: {time.time() - t0:.2f}s")
        for s in range(scfg.all_samples):
            viewVolume(np.asarray(samples["input"][s, ..., 0]),
                       names=[f"d{d}_s{s}_input"], save_dir=args.save_dir)
        for name in ("T1", "segmentation", "distance", "registration"):
            if name in target:
                arr = np.asarray(target[name])
                if name == "segmentation":
                    arr = arr.argmax(-1).astype(np.float32)
                else:
                    arr = arr[..., 0]
                viewVolume(arr, names=[f"d{d}_target_{name}"],
                           save_dir=args.save_dir)
    print("outputs in", args.save_dir)


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
