"""Training entry point.

Parity with /root/reference/scripts/train.py:56-249: cascading config load,
dataset/model/criterion build, schedule construction, resume, epoch loop
with checkpointing. The torch.multiprocessing/NCCL launch stack
(utils/multiprocessing.py) is replaced by `jax.distributed.initialize` +
one mesh.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (backend config must precede brainfm imports)

from brainfm_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from brainfm_tpu.config import load_config, update_out_dir
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.synth.engine import SubjectBank
from brainfm_tpu.train.loop import train


def build_bank(cfg, bank_shape=(192, 192, 192)):
    """Assemble the subject bank from the configured data root; falls back to
    procedural debug subjects when no data is present (this environment)."""
    bank = SubjectBank(bank_shape=bank_shape)
    root = cfg.data_root or ""
    t1s = sorted(glob.glob(os.path.join(root, "*T1w.nii*"))) if root else []

    def find(base, suffix):
        # companions may be .nii or .nii.gz regardless of the T1's extension
        for ext in (".nii", ".nii.gz"):
            p = base + suffix + ext
            if os.path.isfile(p):
                return p
        return None

    subj_paths = []
    for t1 in t1s:
        base = t1.split(".T1w.nii")[0]
        paths = {"T1": t1}
        gen = find(base, ".generation_labels")
        seg = find(base, f".{cfg.segment_prefix}")
        if not gen:
            print("skipping (no generation labels):", t1)
            continue
        paths["gen"] = gen
        if seg:
            paths["seg"] = seg
        dist = [find(base, f".{k}_dist_map") for k in ("lp", "lw", "rp", "rw")]
        if all(dist):
            paths["dist"] = dist
        reg = [find(base, f".mni_reg.{a}") for a in ("x", "y", "z")]
        if all(reg):
            paths["reg"] = reg
        subj_paths.append(paths)
    if subj_paths:
        # batched parallel ingest through the native codec (volcodec.cpp)
        bank.add_many(subj_paths)
    if len(bank) == 0:
        print("NOTE: no dataset found under", root,
              "- using procedural debug subjects")
        for s in range(4):
            bank.add_debug_subject(seed=s, extent=(180, 180, 180))
    return bank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_cfg", default=None)
    ap.add_argument("--train_cfg", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--itr_per_epoch", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--eval_only", action="store_true",
                    help="restore a checkpoint and score the val set only")
    ap.add_argument("--mesh", default=None,
                    help="multi-chip mesh 'DATA' or 'DATAxSPACE', e.g. 8 "
                         "or 4x2 (batch over data, volume D over space)")
    ap.add_argument("--batch_items", type=int, default=0,
                    help="items per step (0 = cfg.batch_size)")
    ap.add_argument("--remat", default=None,
                    choices=["off", "full", "save_convs"],
                    help="override cfg.remat (memory/speed trade: 'full' "
                         "fits the largest single-chip crops, 'save_convs' "
                         "is ~13%% faster when it fits)")
    ap.add_argument("--no_amp", action="store_true",
                    help="disable mixed precision (bf16 compute / fp32 "
                         "params+grads). AMP is the default, mirroring the "
                         "reference's autocast+GradScaler training loop "
                         "(scripts/train.py:164, Trainer/engine.py:92); on "
                         "TPU bf16 needs no loss scaler")
    ap.add_argument("--fsdp", action="store_true",
                    help="with --mesh: shard params + optimizer state over "
                         "the data axis (ZeRO; parallel/fsdp.py) instead of "
                         "replicating")
    ap.add_argument("--staging", default=None, choices=["cache", "host"],
                    help="override cfg.subject_staging: 'host' ships each "
                         "drawn subject uncached and frees it before the "
                         "step peak — required for S=4 @128^3 on one chip "
                         "(brain_id_128_s4.yaml); 'cache' (default) keeps "
                         "an LRU of device-resident subjects")
    ap.add_argument("--grad_accum", type=int, default=None, metavar="K",
                    help="override cfg.grad_accum_samples: run the "
                         "intra-subject sample stack as K sequential "
                         "microbatches inside one jitted step (EXACT — "
                         "per-sample loss means; train/step.py). K must "
                         "divide all_samples")
    args = ap.parse_args()
    if args.fsdp and not args.mesh:
        ap.error("--fsdp requires --mesh (state shards over the mesh "
                 "'data' axis; without a mesh it would silently stay "
                 "replicated)")

    if args.mesh:
        # must run before ANY backend-touching call (build_datasets puts
        # subject banks on device) — jax.distributed.initialize() refuses
        # to run once the XLA backend exists
        from brainfm_tpu.parallel.mesh import init_distributed

        init_distributed()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen_cfg = load_config([os.path.join(root, "cfgs/generator/default.yaml"),
                           args.gen_cfg],
                          cfg_dir=os.path.join(root, "cfgs/generator/train"))
    train_cfg = load_config([os.path.join(root, "cfgs/trainer/default_train.yaml"),
                             args.train_cfg],
                            cfg_dir=os.path.join(root, "cfgs/trainer/train"))
    # merge generator tree into the trainer cfg the way build_model
    # expects — RECURSIVELY: a shallow 'if k not in' merge would drop the
    # entire generator default subtree the moment the trainer cfg carries
    # any same-named section (e.g. a generator: {size: ...} override)
    def _merge_missing(dst, src):
        for k, v in src.items():
            if k not in dst or dst[k] is None:
                dst[k] = v
            elif hasattr(dst[k], "items") and hasattr(v, "items"):
                _merge_missing(dst[k], v)

    _merge_missing(train_cfg, gen_cfg)
    if args.remat is not None:
        train_cfg.remat = {"off": False, "full": True,
                           "save_convs": "save_convs"}[args.remat]
    if args.staging is not None:
        train_cfg.subject_staging = args.staging
    if args.grad_accum is not None:
        train_cfg.grad_accum_samples = args.grad_accum
    if args.epochs is not None:
        train_cfg.n_epochs = args.epochs
    if args.debug:
        train_cfg.n_epochs = 1

    # 'a+b' backbones (twostage.yaml) train two-stage: stage-0 pathology
    # predictor -> masked, mask-conditioned stage-1 task model (parity:
    # build_inpaint_model Trainer/models/__init__.py:441 +
    # train_one_epoch_twostage engine.py:193-318 — which the reference
    # defines but never drives from its own train.py; see PARITY.md)
    import jax.numpy as jnp

    amp = (not args.no_amp) and bool(train_cfg.get("amp", True))
    cdtype = jnp.bfloat16 if amp else jnp.float32
    twostage_models = None
    if "+" in str(train_cfg.get("backbone") or ""):
        from brainfm_tpu.models.build import build_inpaint_model

        cfg, pathol_model, task_model = build_inpaint_model(
            train_cfg, compute_dtype=cdtype)
        twostage_models = (pathol_model, task_model)
        model = None
    else:
        cfg, model = build_model(train_cfg, compute_dtype=cdtype)
    _, weight_dict, loss_fn = make_criterion(cfg)

    out_dir = args.out_dir or update_out_dir(cfg).out_dir
    # multi-dataset registry: per-dataset banks, modality tables, and
    # probability-weighted mixing (parity: build_datasets scripts/
    # train.py:124 + ConcatDataset + DistributedWeightedSampler)
    from brainfm_tpu.synth.datasets import build_datasets

    datasets = build_datasets(cfg, cfg.tasks)
    stream = datasets["_concat"]
    n_subj = {n: len(d) for n, d in datasets.items() if n != "_concat"}
    print("datasets:", n_subj)
    mesh = None
    if args.mesh:
        from brainfm_tpu.parallel.mesh import make_mesh

        parts = [int(v) for v in args.mesh.lower().split("x")]
        mesh = make_mesh(data=parts[0],
                         space=parts[1] if len(parts) > 1 else 1)
    itr = 2 if args.debug else args.itr_per_epoch
    batch_items = args.batch_items or int(cfg.get("batch_size") or 1)
    if (args.eval_only or cfg.get("eval_only")) and twostage_models:
        ap.error("--eval_only is not wired for two-stage configs — use "
                 "infer.api.TwoStageInferencer / scripts/demo_test.py")
    if args.eval_only or cfg.get("eval_only"):
        # (parity: the eval_only short-circuit, scripts/train.py:176-183):
        # restore and score the fixed-seed val set, no training
        if not args.resume:
            ap.error("--eval_only requires --resume <checkpoint>: scoring "
                     "a randomly initialized model would print plausible-"
                     "looking val losses of untrained weights")
        if args.fsdp:
            ap.error("--eval_only does not implement FSDP state sharding; "
                     "evaluate on a chip that fits the replicated params "
                     "(the flagship fits inference comfortably in bf16) or "
                     "resume training with --fsdp and read the val lines")
        cfg.n_epochs = 0
        from brainfm_tpu.train.loop import make_eval_step, make_val_set_stream

        # same seed/n_items/batch_items as train()'s stream val loop — the
        # scores must be comparable to the recorded best_val_stats
        vb, vnames = make_val_set_stream(stream, seed=0, n_items=2,
                                         batch_items=batch_items)
        print("val set spans datasets:", sorted(set(vnames)))
        from brainfm_tpu.infer.api import Inferencer

        # thread the mesh through so a --mesh eval shards the forward the
        # same way serving does (space axis) instead of silently running
        # single-device
        inf = Inferencer(cfg, ckpt_path=args.resume, mesh=mesh)
        # mirror train()'s critic so eval scores stay comparable to the
        # checkpoint's recorded best_val_stats
        from brainfm_tpu.models.build import build_critic_from_cfg

        critic, critic_params, ckey = build_critic_from_cfg(cfg)
        ev = make_eval_step(model, cfg, weight_dict, loss_fn, critic=critic,
                            critic_image_key=ckey or "T1")
        for i, b in enumerate(vb):
            losses = ev(inf.params, b, critic_params)
            print(f"val[{i}]:",
                  {k: round(float(v), 4) for k, v in losses.items()})
        return
    state = train(cfg, model, weight_dict, loss_fn, None, out_dir,
                  itr_per_epoch=itr, resume=args.resume, stream=stream,
                  mesh=mesh, batch_items=batch_items, fsdp=args.fsdp,
                  twostage_models=twostage_models)
    print("training done; final step", int(state.step))
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        if peak:
            print(f"device HBM peak: {peak / 2**30:.2f} GiB "
                  f"(limit {ms.get('bytes_limit', 0) / 2**30:.2f} GiB)")
    except Exception:
        pass  # backend without memory_stats (e.g. CPU)


if __name__ == "__main__":
    main()
    sys.stdout.flush()  # os._exit skips stdio flushing
    sys.stderr.flush()
    os._exit(0)
