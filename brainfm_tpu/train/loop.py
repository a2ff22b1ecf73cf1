"""Training driver loop.

Parity with /root/reference/Trainer/engine.py:66-188 (`train_one_epoch`) and
the epoch orchestration of scripts/train.py:56-243: per-iteration schedule
lookup, metric logging, periodic visualization, epoch-granular
checkpointing with previous-file retention, loss-curve logging.

TPU design: the generator is a jitted device function (no DataLoader
workers); item synthesis for step k+1 is dispatched before step k's result
is consumed, so synthesis and training overlap on the async stream.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..synth import SynthStatic, synth_item
from ..synth.engine import build_knobs_stack, knobs_from_cfg
from ..synth.sharded import sharded_synth_batch, stack_items
from ..utils.logging import MetricLogger, setup_logging, write_log_line
from .checkpoint import save_checkpoint
from .schedules import build_schedules
from .step import TrainState, build_optimizer, make_train_step




def make_batch(keys, subject, scfg, tasks, input_mode, knobs):
    """Synthesize B items (one per key) and stack into a train batch."""
    targets, samples = [], []
    for k in keys:
        t, s = synth_item(k, subject, scfg, tasks, input_mode, knobs)
        targets.append(t)
        samples.append(s)
    return stack_items(targets, samples)


def apply_condition(batch, condition: str | None):
    """Mask/flip conditioning of a train batch (parity: Trainer/
    engine.py:102-112): 'mask' zeroes the anomaly out of the input and
    conditions on the pathology target; 'flip' conditions on the sagittally
    flipped input; 'mask+flip' concatenates both."""
    if not condition:
        return batch
    samples = dict(batch["samples"])
    targets = batch["targets"]
    x = samples["input"]  # (B, S, D, H, W, C)
    cond = None
    if "mask" in condition:
        p = targets["pathology"].astype(x.dtype)
        x = x * (1.0 - p)
        cond = jnp.broadcast_to(p, x.shape)
    if "flip" in condition:
        xf = jnp.flip(x, axis=2)
        cond = xf if cond is None else jnp.concatenate([xf, cond], axis=-1)
    samples["input"] = x
    out = dict(batch)
    out["samples"] = samples
    out["cond"] = cond
    return out


def make_eval_step(model, cfg, weight_dict, loss_fn):
    """Jitted validation step: forward + criterion, no grad."""
    from ..models.build import apply_processors
    from ..models.criterion import weighted_total

    def per_item(params, samples, targets):
        outputs = apply_processors(model.apply(params, samples["input"]), cfg)
        return loss_fn(outputs, targets, samples)

    def step(params, batch):
        losses = jax.vmap(lambda s, t: per_item(params, s, t))(
            batch["samples"], batch["targets"])
        losses = {k: jnp.mean(v) for k, v in losses.items()}
        total = weighted_total(losses, weight_dict)
        losses["loss_total"] = total
        return losses

    return jax.jit(step)


def make_val_set(bank, scfg, tasks, input_modes, knobs, seed: int,
                 n_items: int = 2, batch_items: int = 1):
    """A fixed-seed set of synthetic validation batches — reproducible
    across epochs and resumes (the val analog of the reference's held-out
    split; synthesized since training data itself is synthetic)."""
    key = jax.random.PRNGKey(100_000 + seed)
    rng = np.random.default_rng(seed + 7)
    batches = []
    for _ in range(n_items):
        key, *iks = jax.random.split(key, batch_items + 1)
        subj = bank.to_device(int(rng.integers(len(bank))))
        mode = input_modes[int(rng.integers(len(input_modes)))]
        batches.append(make_batch(iks, subj, scfg, tasks, mode, knobs[mode]))
    return batches


def train(cfg, model, weight_dict, loss_fn, bank, out_dir: str,
          itr_per_epoch: int = 100, batch_items: int = 1,
          input_modes=("synth",), seed: int = 0, log_itr: int = 10,
          resume: str | None = None, vis_itr: int = 0, val_itr: int = 1,
          n_val_items: int = 2, keep_ckpt: int = 2, stream=None, mesh=None,
          fsdp: bool = False):
    """Run the full training loop. `bank`: SubjectBank; `cfg`: processed
    trainer config (with .generator etc.).

    `stream`: optional synth.datasets.ConcatStream — the multi-dataset
    registry path (parity: build_datasets + ConcatDataset prob mixing +
    per-dataset modality roulette, Generator/__init__.py:18,
    Generator/utils.py:18-29). When given it replaces the flat-bank
    subject sampling; `bank` may be None (val set then draws from the
    stream's first dataset).

    `mesh`: optional jax.sharding.Mesh with a 'data' axis (and optionally
    'space') — the multi-chip path (parity: the DDP wrap of
    scripts/train.py:154-158). Batches are sharded batch-over-'data'
    (volumes additionally D-over-'space' when the axis exists), state is
    replicated, and every step runs under jax.sharding.set_mesh so XLA
    inserts the gradient psum and conv halo exchanges (and the UNet's
    deep-level replication guard engages). batch_items must be a
    multiple of the 'data' axis size. Synthesis also runs per-rank
    (synth/sharded.py): each device generates only its own batch items —
    the TPU analog of the reference's per-rank DataLoader workers — and
    in stream mode the dataset/modality roulette is drawn once per batch
    (ConcatStream.epoch_grouped) so a batch is one SPMD program.

    `fsdp`: with a mesh (required — raises without one), shard params AND
    optimizer state over the 'data' axis (ZeRO/FSDP; parallel/fsdp.py)
    instead of replicating — per-device state memory drops by the
    data-axis size, XLA all-gathers params on use and reduce-scatters
    grads. Fresh starts build the state via init_sharded (each device
    only ever holds its own shards); resume loads the checkpoint into a
    replicated template first, then re-shards. Math identical to the
    replicated path (fp64-exact, tests/test_fsdp.py).

    Validation + best checkpoint (parity: best_val_stats carried in every
    checkpoint and the pre-save backup rename, scripts/train.py:173,196-214):
    every `val_itr` epochs the fixed-seed val set is scored; a new best
    val loss_total saves ckp/ckpt_best (previous best renamed to
    ckpt_best_bk). `keep_ckpt` bounds the rolling epoch checkpoints."""
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logging(os.path.join(out_dir, "train.log"))
    scfg = SynthStatic.from_cfg(cfg)
    tasks = tuple(cfg.tasks)

    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a mesh with a 'data' axis — "
                         "without one the state would silently stay "
                         "single-device fully replicated")
    optimizer = build_optimizer(cfg)
    size = tuple(cfg.generator.size)
    x0 = jnp.zeros((scfg.all_samples, *size, 1), jnp.float32)

    def _make_state(rng, x):
        p = model.init(rng, x)
        return TrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))

    if fsdp and not resume:
        # fresh FSDP start: jit state construction with out-shardings so
        # each device only ever holds its own shards — the full params +
        # Adam moments never materialize on one chip (the whole point
        # when the state exceeds single-chip HBM). Resume instead loads
        # into the replicated template below, then re-shards.
        from ..parallel.fsdp import init_sharded

        state = init_sharded(_make_state, mesh, jax.random.PRNGKey(seed), x0)
    else:
        state = jax.jit(_make_state)(jax.random.PRNGKey(seed), x0)
    start_epoch = 0
    best_val_stats = None
    if resume:
        from .checkpoint import load_checkpoint, read_extra, step_from_path

        state = load_checkpoint(resume, state)
        start_epoch = int(state.step) // itr_per_epoch
        best_val_stats = read_extra(resume).get("best_val_stats")
        logger.info(f"resumed from {resume} at epoch {start_epoch} "
                    f"(best_val_stats: {best_val_stats})")

    lr_sched, wd_sched = build_schedules(cfg, itr_per_epoch)
    step_fn = make_train_step(model, cfg, weight_dict, loss_fn, optimizer)
    knobs = {m: knobs_from_cfg(cfg, scfg, m) for m in set(input_modes)}

    # multi-chip: replicate state, shard batches, run under set_mesh
    import contextlib

    mesh_scope = contextlib.nullcontext
    shard_train_batch = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert "data" in mesh.axis_names, mesh.axis_names
        assert batch_items % mesh.shape["data"] == 0, \
            (batch_items, dict(mesh.shape))
        mesh_scope = lambda: jax.sharding.set_mesh(mesh)  # noqa: E731
        repl = NamedSharding(mesh, P())
        has_space = mesh.shape.get("space", 1) > 1
        vol_spec = NamedSharding(
            mesh, P("data", None, "space") if has_space else P("data"))
        flat_spec = NamedSharding(mesh, P("data"))
        if fsdp:
            from ..parallel.fsdp import shard_state

            # no-op for a fresh init_sharded state (shardings already
            # match); re-shards the replicated template after a resume
            state = shard_state(state, mesh)
        else:
            state = jax.tree.map(lambda a: jax.device_put(a, repl), state)

        def shard_train_batch(b):
            return jax.tree.map(
                lambda a: jax.device_put(
                    a, vol_spec if a.ndim >= 3 else flat_spec), b)

    # weighted subject sampling + modality roulette (parity:
    # DistributedWeightedSampler utils/misc.py:523 + read_input
    # datasets.py:563-589)
    from ..synth.sampler import WeightedSubjectSampler, choose_modality

    if stream is not None and bank is None:
        bank = stream.datasets[stream.names[0]].bank
    sampler = None
    if stream is None:
        sampler = WeightedSubjectSampler([len(bank)], seed=seed,
                                         process_index=jax.process_index())
    input_prob = dict(cfg.get("input_prob") or {}) if hasattr(cfg, "get") \
        else {}

    key = jax.random.PRNGKey(seed + 1)
    n_epochs = int(cfg.n_epochs)
    rng_host = np.random.default_rng(seed)

    stats: dict = {}
    val_batches = None  # built lazily at the first validation epoch
    eval_step = None
    for epoch in range(start_epoch, n_epochs):
        mlog = MetricLogger()
        t_ep = time.time()
        if stream is not None:
            if mesh is not None:
                # grouped plan: one dataset per batch so the whole batch is
                # one SPMD synthesis program, each item on its own rank
                group_plan = list(stream.epoch_grouped(
                    epoch, itr_per_epoch, batch_items))
            else:
                item_iter = stream.epoch(epoch, itr_per_epoch * batch_items,
                                         jax.random.fold_in(key, epoch))
        else:
            sampler.set_epoch(epoch)
            subj_plan = sampler.sample(itr_per_epoch)
        for it in range(itr_per_epoch):
            gstep = epoch * itr_per_epoch + it
            if stream is not None and mesh is not None:
                name, idxs = group_plan[it]
                key, *item_keys = jax.random.split(key, batch_items + 1)
                batch = stream.datasets[name].get_batch_sharded(
                    mesh, idxs, jnp.stack(item_keys))
            elif stream is not None:
                items = [next(item_iter) for _ in range(batch_items)]
                batch = stack_items([t for _, t, _ in items],
                                    [s for _, _, s in items])
            else:
                key, *item_keys = jax.random.split(key, batch_items + 1)
                subj = bank.to_device(subj_plan[it][1])
                if input_prob:
                    avail = set(bank.subjects[subj_plan[it][1]].keys())
                    mode = choose_modality(rng_host, input_prob, avail)
                    if mode != "synth" and mode in subj:
                        subj = dict(subj)
                        subj["image"] = subj[mode]
                    if mode not in knobs:
                        knobs[mode] = knobs_from_cfg(cfg, scfg, mode)
                else:
                    mode = input_modes[rng_host.integers(len(input_modes))]
                if mesh is not None:
                    # per-rank synthesis: item i computed on data-rank i
                    batch = sharded_synth_batch(
                        mesh, jnp.stack(item_keys), subj, scfg, tasks, mode,
                        knobs[mode])
                else:
                    batch = make_batch(item_keys, subj, scfg, tasks, mode,
                                       knobs[mode])
            batch = apply_condition(batch, cfg.get("condition"))
            if shard_train_batch is not None:
                batch = shard_train_batch(batch)
            lr = jnp.float32(lr_sched[min(gstep, len(lr_sched) - 1)])
            wd = jnp.float32(wd_sched[min(gstep, len(wd_sched) - 1)])
            with mesh_scope():
                state, metrics = step_fn(state, batch, lr, wd)
            if it % log_itr == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                mlog.update(**host_metrics)
                logger.info(f"epoch {epoch} it {it}/{itr_per_epoch} "
                            f"lr {float(lr):.2e} "
                            f"loss {host_metrics['loss_total']:.4f}")
            if vis_itr and gstep % vis_itr == 0:
                # periodic montage (parity: engine.py:167-179)
                from ..models.build import apply_processors
                from ..utils.visualizer import FeatVisualizer, TaskVisualizer

                vcfg = cfg.get("visualizer") if hasattr(cfg, "get") else None
                outs = apply_processors(
                    model.apply(state.params, batch["samples"]["input"][0]),
                    cfg)
                if vcfg is not None and vcfg.get("feat_vis"):
                    # decoder-feature strips (parity: FeatVisualizer wiring,
                    # scripts/train.py:143)
                    FeatVisualizer(
                        os.path.join(out_dir, "vis_feat"),
                        n_channels=int(vcfg.get("feat_vis_num") or 10)
                    ).visualize(gstep, outs["feat"][-1])
                if vcfg is not None and vcfg.get("make_results"):
                    # NIfTI volume dumps (parity: make_results,
                    # Trainer/engine.py:21-62,173-174)
                    from ..utils.nifti import viewVolume

                    rdir = os.path.join(out_dir, "vis", f"results_{gstep}")
                    os.makedirs(rdir, exist_ok=True)
                    viewVolume(np.asarray(
                        batch["samples"]["input"][0, 0, ..., 0]),
                        names=["input"], save_dir=rdir)
                    for k in ("T1", "label", "bias_field_log"):
                        if k in outs:
                            viewVolume(np.asarray(outs[k][0]).squeeze(),
                                       names=[f"pd_{k}"], save_dir=rdir)
                        if k in batch["targets"]:
                            viewVolume(np.asarray(
                                batch["targets"][k][0, 0]).squeeze(),
                                names=[f"gt_{k}"], save_dir=rdir)
                TaskVisualizer(os.path.join(out_dir, "vis")).visualize(
                    gstep, {k: v[0] for k, v in batch["samples"].items()},
                    {k: v[0] for k, v in batch["targets"].items()},
                    {k: v for k, v in outs.items() if k != "feat"})
        stats = {f"train_{k}": m.global_avg for k, m in mlog.meters.items()}
        stats.update({"epoch": epoch, "epoch_time": time.time() - t_ep})

        if val_itr and (epoch + 1) % val_itr == 0:
            if val_batches is None:
                val_batches = make_val_set(bank, scfg, tasks, input_modes,
                                           knobs, seed, n_val_items,
                                           batch_items)
                eval_step = make_eval_step(model, cfg, weight_dict, loss_fn)
            acc: dict = {}
            for vb in val_batches:
                vl = eval_step(state.params, vb)
                for k, v in vl.items():
                    acc[k] = acc.get(k, 0.0) + float(v) / len(val_batches)
            stats.update({f"val_{k}": v for k, v in acc.items()})
            logger.info(f"epoch {epoch} val loss {acc['loss_total']:.4f}")
            if (best_val_stats is None
                    or acc["loss_total"] < best_val_stats["loss_total"]):
                best_val_stats = acc
                from .checkpoint import save_best_checkpoint

                save_best_checkpoint(
                    os.path.join(out_dir, "ckp"),
                    (epoch + 1) * itr_per_epoch, state,
                    extra={"epoch": epoch, "best_val_stats": best_val_stats})
                logger.info(f"epoch {epoch} new best "
                            f"({acc['loss_total']:.4f}) -> ckp/ckpt_best")

        write_log_line(os.path.join(out_dir, "log.txt"), stats)
        # async: the 264M-param flagship state serializes to disk in a
        # background thread while the next epoch trains (finalized before
        # the next save / at train end)
        save_checkpoint(os.path.join(out_dir, "ckp"),
                        (epoch + 1) * itr_per_epoch, state,
                        extra={"epoch": epoch,
                               "best_val_stats": best_val_stats},
                        keep=keep_ckpt, block=False)
    from .checkpoint import finalize_pending

    finalize_pending()
    if stats:
        from ..utils.logging import plot_loss

        plot_loss(os.path.join(out_dir, "log.txt"),
                  keys=[k for k in stats if k.startswith("train_loss")])
    return state
