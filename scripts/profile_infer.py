"""Stage-level timing of the whole-volume flagship forward.

Locates where the 220^3 L6 single-dispatch inference time goes
(BASELINE.md primary metric): encoder tower vs full backbone vs
heads+processors vs postprocess, each as its own jitted graph with a
dependent-transfer fence. Run on the real chip:

    python scripts/profile_infer.py                # 220^3 flagship
    python scripts/profile_infer.py --size 64      # small/CPU smoke
    python scripts/profile_infer.py --trace DIR    # + jax.profiler trace

Roofline context (BASELINE.md "Delivered chip rooflines", 2026-08-19):
the L6/f64 forward at 220^3 is ~21 bf16 TFLOP; the chip delivers
113 TF/s matmul but only 28-40 TF/s on cout=64 convs (MXU lane
underfill) vs 82-223 TF/s on wide ones. After the phase-upconv rewrite
the whole-volume pass measures 493 ms = 42.8 TF/s sustained = 38% of
measured matmul peak, ~80% of the op-mix roofline. Use this script to
confirm the split stays conv-bound (encoders+decoders >> heads+
postprocess) and to catch regressions, not to chase nominal peaks.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=220)
    ap.add_argument("--f_maps", type=int, default=64)
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins JAX_PLATFORMS=axon; env overrides are "
                         "ignored, only jax.config works)")
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of one rep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from brainfm_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.infer.api import Inferencer

    cfg = AttrDict.from_nested({
        "task": {"T1": True, "T2": True, "FLAIR": True, "CT": True,
                 "segmentation": True, "distance": True,
                 "registration": True, "bias_field": True},
        "generator": {"left_hemis_only": False, "size": [160, 160, 160]},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": args.f_maps,
        "num_levels": args.levels, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [64],
        "max_surf_distance": 3.0,
    })
    t0 = time.time()
    inf = Inferencer(cfg, ckpt_path=None, compute_dtype=jnp.bfloat16,
                     exact=False)
    print(f"# init: {time.time()-t0:.1f}s", file=sys.stderr)

    s = args.size
    vol = jnp.asarray(np.random.default_rng(0).random((s, s, s)), jnp.float32)
    x = vol[None, ..., None]

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[0])

    def bench(name, fn, *fargs):
        out = fn(*fargs)
        fence(out)  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*fargs)
            fence(out)
        dt = (time.time() - t0) / args.reps * 1e3
        print(f"{name:<28s} {dt:9.1f} ms")
        return dt

    model, params = inf.model, inf.params

    # 1. encoder tower only (everything else dead-coded: return the
    # bottleneck's corner so XLA keeps the whole tower but no decoder)
    @jax.jit
    def enc_only(p, x):
        feats = model.apply(p, x, method=lambda m, x: m.backbone.encoders(x))
        return [f[:1, :1, :1, :1, :1] for f in feats]

    # 2. full backbone (encoders + decoders), heads dead-coded
    @jax.jit
    def backbone_only(p, x):
        feats = model.apply(
            p, x, method=lambda m, x: m.backbone.get_feature(x))
        return feats[-1][:1, :1, :1, :1, :1]

    # 3. backbone + final decoder level materialized (is the final-level
    # output write/keep itself expensive?)
    @jax.jit
    def backbone_full_out(p, x):
        feats = model.apply(
            p, x, method=lambda m, x: m.backbone.get_feature(x))
        return feats[-1]

    enc = bench("encoders (dead-coded out)", enc_only, params, x)
    bb = bench("backbone (corner out)", backbone_only, params, x)
    bbf = bench("backbone (full final out)", backbone_full_out, params, x)
    full = bench("forward+heads+processors",
                 lambda p, v: inf._jitted(p, v, keep_feat=False), params, x)
    out = inf._jitted(params, x, keep_feat=False)
    post = bench("postprocess", inf._jitted_post, out, x)

    print(f"{'decoders (bb - enc)':<28s} {bb-enc:9.1f} ms")
    print(f"{'heads+proc (full - bb_out)':<28s} {full-bbf:9.1f} ms")
    print(f"{'total fwd+post':<28s} {full+post:9.1f} ms")

    if args.trace:
        import jax.profiler as jp

        with jp.trace(args.trace):
            fence(inf._jitted(params, x, keep_feat=False))
        print(f"# trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
    # The axon relay's native thread is non-daemon; normal interpreter
    # exit can hang after TPU work.
    import os
    os._exit(0)
