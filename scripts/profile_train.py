"""Train-step timing across remat modes on the flagship L6 model.

Measures the jitted joint train step (BASELINE.md tertiary line:
128^3 single-chip crop, bf16 compute / fp32 params) under each
rematerialization mode so the default can be the measured-fastest one
that fits HBM:

  False        save everything (most memory; OOMs the flagship at 128^3)
  'full'       recompute each DoubleConv block in the backward pass
  'save_convs' keep MXU-bound conv outputs, recompute only the HBM-bound
               GroupNorm/LeakyReLU chain (models/unet3d._remat_block)

    python scripts/profile_train.py                 # 128^3 flagship, all modes
    python scripts/profile_train.py --size 32 --cpu # smoke
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--f_maps", type=int, default=64)
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="full,save_convs",
                    help="comma list from {off,full,save_convs}")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ledger", action="store_true",
                    help="print XLA cost analysis (FLOPs incl. remat "
                         "recompute, HBM bytes) for each mode's compiled "
                         "step instead of timing it — the train-step MFU "
                         "ledger (BASELINE.md). CPU-safe: lowering only, "
                         "no execution")
    args = ap.parse_args()

    valid_modes = {"off", "full", "save_convs"}
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    bad = [m for m in modes if m not in valid_modes]
    if bad:
        ap.error(f"unknown --modes {bad}; valid: {sorted(valid_modes)}")

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from brainfm_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.models import build_model
    from brainfm_tpu.models.criterion import make_criterion
    from brainfm_tpu.train.step import (TrainState, build_optimizer,
                                        make_train_step)

    s = args.size
    rng0 = np.random.default_rng(1)
    ts = (s, s, s)
    xt = jnp.asarray(rng0.random((1, *ts, 1)), jnp.float32)
    batch = {
        "samples": {"input": xt[None],
                    "bias_field_log": jnp.zeros((1, 1, *ts, 1))},
        "targets": {
            "T1": jnp.asarray(rng0.random((1, 1, *ts, 1)), jnp.float32),
            "segmentation": jax.nn.one_hot(jnp.asarray(
                rng0.integers(0, 56, (1, 1, *ts)), jnp.int32), 56),
            "distance": jnp.asarray(rng0.random((1, 1, *ts, 4)),
                                    jnp.float32),
            "registration": jnp.asarray(rng0.random((1, 1, *ts, 3)),
                                        jnp.float32),
        },
    }

    for mode in modes:
        remat = {"off": False, "full": True, "save_convs": "save_convs"}[mode]
        cfg = AttrDict.from_nested({
            "task": {"T1": True, "segmentation": True, "distance": True,
                     "registration": True, "bias_field": True},
            "generator": {"left_hemis_only": False, "size": list(ts)},
            "losses": {"uncertainty": None, "image_grad": True,
                       "registration_grad": True,
                       "bias_field_log_type": "l2"},
            "weights": {k: 1.0 for k in ("seg_ce", "seg_dice", "image",
                                         "image_grad", "bias_field_log",
                                         "distance", "registration",
                                         "registration_grad")},
            "backbone": "unet3d", "f_maps": args.f_maps,
            "num_levels": args.levels, "num_groups": 8,
            "layer_order": "gcl", "unit_feat": False, "task_f_maps": [64],
            "max_surf_distance": 3.0,
            "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
            "optimizer": "adamw", "lr": 1e-4, "weight_decay": 0.0,
            "clip_max_norm": 1.0, "all_samples": 1, "remat": remat,
        })
        cfg, model = build_model(cfg, compute_dtype=jnp.bfloat16)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xt)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        step = make_train_step(model, cfg, wd, loss_fn, opt, donate=True)
        if args.ledger:
            # XLA's own accounting of the compiled step: FLOPs here INCLUDE
            # remat recompute (the HLO contains the recomputed ops), and
            # bytes-accessed is post-fusion HBM traffic — the two numbers
            # the MFU ledger needs. Optimizer state traffic is reported
            # separately from first principles (adamw: read p,m,v,g; write
            # p,m,v — 7 fp32 streams over the param count).
            try:
                lowered = step.lower(state, batch, 1e-4, 0.0)
                ca = lowered.compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0))
                byts = float(ca.get("bytes accessed", 0.0))
                n_par = sum(np.prod(x.shape) for x in
                            jax.tree_util.tree_leaves(params))
                opt_gb = 7 * 4 * n_par / 1e9
                print(f"{mode:<12s} XLA flops {flops / 1e12:8.2f} TF   "
                      f"bytes {byts / 2**30:7.2f} GiB @{s}^3 "
                      f"L{args.levels} f{args.f_maps}")
                print(f"{'':<12s} params {n_par / 1e6:.1f} M -> adamw "
                      f"traffic ~{opt_gb:.1f} GB/step (7 fp32 streams)")
            except Exception as e:
                print(f"{mode:<12s} LEDGER FAILED: {type(e).__name__}: {e}")
            del state, params, step, model
            import gc
            gc.collect()
            continue
        try:
            # both the warm-up AND the timed reps can fail (OOM may first
            # appear once donated steady-state buffers settle) — either
            # degrades to a FAILED line and the sweep continues
            state, m = step(state, batch, 1e-4, 0.0)
            np.asarray(m["loss_total"])  # fence (relay dispatch is async)
            t0 = time.time()
            for _ in range(args.reps):
                state, m = step(state, batch, 1e-4, 0.0)
            np.asarray(m["loss_total"])
            dt = (time.time() - t0) / args.reps * 1e3
            print(f"{mode:<12s} {dt:9.1f} ms / step @{s}^3 "
                  f"L{args.levels} f{args.f_maps}")
        except Exception as e:
            print(f"{mode:<12s} FAILED: {type(e).__name__}: {e}")
        finally:
            # release this mode's params/opt-state/compiled step before the
            # next mode allocates (a FAILED mode must not inflate the next
            # mode's HBM pressure)
            del state, params, step, model
            import gc
            gc.collect()


if __name__ == "__main__":
    main()
    import os
    os._exit(0)  # axon relay thread is non-daemon; normal exit can hang
