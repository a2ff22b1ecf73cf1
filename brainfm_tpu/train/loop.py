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
from ..utils.logging import setup_logging, write_log_line
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


def make_eval_step(model, cfg, weight_dict, loss_fn, critic=None,
                   critic_image_key: str = "T1", sample_accum: int = 1):
    """Jitted validation step: forward + criterion, no grad. `critic`
    mirrors make_train_step's frozen implicit-pathology critic so val
    losses stay comparable to training (critic_params threaded as data:
    step(params, batch, critic_params)).

    `sample_accum`: evaluate the S-sample stack in sequential chunks
    (lax.scan) — EXACT like the train-side twin (step.py sample_accum:
    the criterion means per-sample losses, so chunk means average back
    to the S mean). The S=4 @128^3 envelope needs it at validation too:
    the monolithic S=4 eval forward RESOURCE_EXHAUSTs next to the
    resident train state (measured 2026-08-21)."""
    from ..models.build import apply_processors, implicit_pathol_outputs
    from ..models.criterion import weighted_total

    def per_item(params, samples, targets, cond, critic_params):
        outputs = apply_processors(
            model.apply(params, samples["input"], cond=cond), cfg)
        if critic is not None and critic_params is not None:
            outputs = implicit_pathol_outputs(critic, critic_params, outputs,
                                              targets, critic_image_key)
        return loss_fn(outputs, targets, samples)

    def batch_losses(params, batch, critic_params):
        # mirror make_train_step: conditioned batches carry 'cond' and the
        # model must see it at validation too, or (a) the conv input width
        # mismatches and (b) val loss would score unconditioned forwards
        cond = batch.get("cond")
        if cond is None:
            losses = jax.vmap(
                lambda s, t: per_item(params, s, t, None, critic_params))(
                batch["samples"], batch["targets"])
        else:
            losses = jax.vmap(
                lambda s, t, c: per_item(params, s, t, c, critic_params))(
                batch["samples"], batch["targets"], cond)
        return {k: jnp.mean(v) for k, v in losses.items()}

    def step(params, batch, critic_params=None):
        k = sample_accum
        S = jax.tree.leaves(batch["samples"])[0].shape[1]
        if k > 1 and S % k == 0 and S > 1:
            samples = batch["samples"]
            cond = batch.get("cond")

            def split(a):  # (B, S, ...) -> (k, B, S/k, ...)
                b = a.reshape(a.shape[0], k, S // k, *a.shape[2:])
                return jnp.moveaxis(b, 1, 0)

            def chunk(_, xs):
                msamp, mc = xs
                mb = dict(batch)
                mb["samples"] = msamp
                mb["cond"] = mc
                return None, batch_losses(params, mb, critic_params)

            msamples = jax.tree.map(split, samples)
            if cond is None:
                _, stacked = jax.lax.scan(
                    lambda c, x: chunk(c, (x, None)), None, msamples)
            else:
                _, stacked = jax.lax.scan(chunk, None,
                                          (msamples, split(cond)))
            losses = {kk: jnp.mean(vv) for kk, vv in stacked.items()}
        else:
            losses = batch_losses(params, batch, critic_params)
        total = weighted_total(losses, weight_dict)
        losses["loss_total"] = total
        return losses

    return jax.jit(step)


def make_val_set(bank, scfg, tasks, input_modes, knobs, seed: int,
                 n_items: int = 2, batch_items: int = 1,
                 stage_host: bool = False):
    """A fixed-seed set of synthetic validation batches — reproducible
    across epochs and resumes (the val analog of the reference's held-out
    split; synthesized since training data itself is synthetic).

    stage_host: subjects ship uncached (SubjectBank.stage) and the built
    batches are pulled back to HOST memory — at the S=4x128^3 single-chip
    envelope neither the bank nor ~0.6 GiB/val-batch may stay
    HBM-resident across training steps; the caller re-ships each batch at
    validation time (see train())."""
    key = jax.random.PRNGKey(100_000 + seed)
    rng = np.random.default_rng(seed + 7)
    batches = []
    for _ in range(n_items):
        key, *iks = jax.random.split(key, batch_items + 1)
        i = int(rng.integers(len(bank)))
        subj = bank.stage(i) if stage_host else bank.to_device(i)
        mode = input_modes[int(rng.integers(len(input_modes)))]
        b = make_batch(iks, subj, scfg, tasks, mode, knobs[mode])
        if stage_host:
            b = jax.tree.map(np.asarray, b)
        batches.append(b)
    return batches


def make_val_set_stream(stream, seed: int, n_items: int = 2,
                        batch_items: int = 1):
    """Fixed-seed validation batches drawn ACROSS the stream's datasets
    with the training mixture's probabilities (VERDICT r2: a multi-dataset
    run must not validate only on whichever dataset sorts first; reference
    analog: the dedicated val generator config,
    cfgs/trainer/default_val.yaml + scripts/train.py:173). Reproducible
    across epochs/resumes: a dedicated sampler epoch far outside the
    training range seeds the draw. Returns (batches, dataset_names)."""
    VAL_EPOCH = 1_000_000_007
    key = jax.random.PRNGKey(100_000 + seed)
    stream.sampler.set_epoch(VAL_EPOCH + seed)
    for n in stream.names:
        stream.datasets[n].reseed(VAL_EPOCH + seed)
    plan = stream.sampler.sample_grouped(n_items, batch_items)
    batches = []
    for d, idxs in plan:
        ds = stream.datasets[stream.names[d]]
        key, *iks = jax.random.split(key, batch_items + 1)
        items = [ds.get(i, k) for i, k in zip(idxs, iks)]
        batches.append(stack_items([t for t, _ in items],
                                   [s for _, s in items]))
    return batches, [stream.names[d] for d, _ in plan]


def make_twostage_eval_step(pathol_model, task_model, cfg, weight_dict,
                            loss_fn):
    """Validation twin of make_twostage_train_step: chained stage-0 mask →
    masked stage-1 forward → criterion, no grad."""
    from ..models.build import twostage_forward
    from ..models.criterion import weighted_total

    from ..models.build import apply_processors

    def per_item(params, samples, targets):
        out = twostage_forward(pathol_model, task_model, params["pathol"],
                               params["task"], samples["input"], cfg)
        # mirror the training twin (step.py twostage per_item): processors
        # run (seg softmax/log, distance clip, uncertainty split) but the
        # stage-0 pathology is already sigmoided — keep it, don't
        # double-squash it
        pathol = out.get("pathology")
        out = apply_processors(out, cfg)
        if pathol is not None:
            out["pathology"] = pathol
        return loss_fn(out, targets, samples)

    def step(params, batch, critic_params=None):
        del critic_params  # twostage has no implicit critic
        losses = jax.vmap(lambda s, t: per_item(params, s, t))(
            batch["samples"], batch["targets"])
        losses = {k: jnp.mean(v) for k, v in losses.items()}
        losses["loss_total"] = weighted_total(losses, weight_dict)
        return losses

    return jax.jit(step)


def train(cfg, model, weight_dict, loss_fn, bank, out_dir: str,
          itr_per_epoch: int = 100, batch_items: int = 1,
          input_modes=("synth",), seed: int = 0, log_itr: int = 10,
          resume: str | None = None, vis_itr: int = 0, val_itr: int = 1,
          n_val_items: int = 2, keep_ckpt: int = 2, stream=None, mesh=None,
          fsdp: bool = False, twostage_models=None):
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

    if twostage_models is not None:
        # two-stage mask-then-inpaint training (parity:
        # train_one_epoch_twostage, Trainer/engine.py:193-318 — which the
        # reference defines but never drives from its own scripts/train.py;
        # here the shipped twostage.yaml config reaches it, see PARITY.md).
        # params = {'pathol': ..., 'task': ...} under ONE optimizer.
        pathol_model, task_model = twostage_models

        def _make_state(rng, x):
            r1, r2 = jax.random.split(rng)
            p = {"pathol": pathol_model.init(r1, x),
                 "task": task_model.init(r2, x, cond=jnp.zeros_like(x))}
            return TrainState(p, optimizer.init(p), jnp.zeros((), jnp.int32))
    else:
        # conditioned training (cfg.condition 'mask'/'flip'/'mask+flip'):
        # the step applies the model WITH cond channels concatenated
        # (step.py per_item -> Joiner concat), so init must see a cond of
        # the same width or the first conv kernel is built 1-channel and
        # the first step crashes on a param-shape mismatch
        cond_terms = sum(t in str(cfg.get("condition") or "")
                         for t in ("mask", "flip"))

        def _make_state(rng, x):
            if cond_terms:
                p = model.init(rng, x, cond=jnp.concatenate(
                    [jnp.zeros_like(x)] * cond_terms, axis=-1))
            else:
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
    # frozen implicit-pathology critic (parity: PatholSeg built by
    # get_processors under losses.implicit_pathol, joiner.py:90-133,
    # run every iteration at engine.py:115). Its params ride every batch
    # as data — never closure constants — so the jitted step stays
    # checkpoint-agnostic.
    from ..models.build import build_critic_from_cfg

    critic, critic_params, critic_key = build_critic_from_cfg(cfg)
    if critic is not None:
        logger.info(f"implicit-pathology critic on (scores '{critic_key}')")
    # subject_staging 'host' (used at the step build and the draw sites):
    # ship each drawn subject uncached and drop it before the step runs,
    # so no bank volume is HBM-resident at the step's peak — required
    # headroom for the reference's S=4 sample stack at 128^3 on one chip
    # (SubjectBank.stage; NOTES_r04.md envelope)
    stage_host = str(cfg.get("subject_staging") or "cache") == "host" \
        if hasattr(cfg, "get") else False
    if twostage_models is not None:
        if critic is not None:
            raise ValueError("losses.implicit_pathol is not supported with "
                             "two-stage training (the reference's twostage "
                             "engine has no PatholSeg critic either)")
        if cfg.get("condition"):
            # apply_condition would erase the ground-truth pathology from
            # the input BEFORE stage-0 ever sees it (and the cond channel
            # is not consumed by the twostage step) — stage-0 would train
            # to predict pathology from images where it is already gone
            raise ValueError("cfg.condition is not supported with two-stage "
                             "training: stage-1 is conditioned on stage-0's "
                             "predicted mask internally")
        from .step import make_twostage_train_step

        step_fn = make_twostage_train_step(
            pathol_model, task_model, cfg, weight_dict, loss_fn, optimizer,
            train_stage0=bool(cfg.get("train_stage0", True)
                              if hasattr(cfg, "get") else True),
            sample_accum=int(cfg.get("grad_accum_samples") or 1)
            if hasattr(cfg, "get") else 1)
    else:
        # under host staging the batch is also DONATED to the step (the
        # one-hot seg target alone is 0.44 GiB of reusable backward
        # scratch) — valid only when nothing reads the batch afterward:
        # no visualizer read-back, no critic params threaded through it,
        # and no mesh resharding
        donate_batch = (stage_host and not vis_itr and mesh is None
                        and critic_params is None)
        if donate_batch:
            logger.info("batch donation: on (host staging, no vis/critic)")
        sample_accum = int(cfg.get("grad_accum_samples") or 1) \
            if hasattr(cfg, "get") else 1
        if sample_accum > 1:
            logger.info(f"gradient accumulation over the sample stack: "
                        f"{sample_accum} microbatches (exact; step.py)")
        step_fn = make_train_step(model, cfg, weight_dict, loss_fn, optimizer,
                                  critic=critic,
                                  critic_image_key=critic_key or "T1",
                                  donate_batch=donate_batch,
                                  sample_accum=sample_accum)
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
            # critic params are model weights riding the batch — they must
            # replicate, never shard over 'data' (their leading dim is a
            # conv kernel extent, not a batch axis)
            cp = b.pop("critic_params", None)
            out = jax.tree.map(
                lambda a: jax.device_put(
                    a, vol_spec if a.ndim >= 3 else flat_spec), b)
            if cp is not None:
                out["critic_params"] = cp
            return out

        if critic_params is not None:
            critic_params = jax.device_put(critic_params, repl)

    # weighted subject sampling + modality roulette (parity:
    # DistributedWeightedSampler utils/misc.py:523 + read_input
    # datasets.py:563-589)
    from ..synth.sampler import WeightedSubjectSampler, choose_modality

    sampler = None
    if stream is None:
        sampler = WeightedSubjectSampler([len(bank)], seed=seed,
                                         process_index=jax.process_index())
    if stage_host:
        logger.info("subject staging: host (uncached per-draw H2D; no "
                    "bank residency during the train step)")
    input_prob = dict(cfg.get("input_prob") or {}) if hasattr(cfg, "get") \
        else {}
    if stream is None and not input_prob and tuple(input_modes) == ("synth",):
        # make the default explicit — a bare bank with neither input_modes
        # nor cfg.input_prob trains on synthetic contrast ONLY
        logger.info("input modes: synth only (no input_prob/modality table "
                    "configured — pass input_modes or cfg.input_prob to mix "
                    "real images)")

    base_key = jax.random.PRNGKey(seed + 1)
    n_epochs = int(cfg.n_epochs)

    stats: dict = {}
    val_batches = None  # built lazily at the first validation epoch
    eval_step = None
    vis_fwd = None  # lazily jitted vis forward: an eager model.apply pays
    # the ~25 ms relay round-trip PER OP (api.py measurement) — a deep
    # UNet forward is hundreds of ops, minutes per vis_itr trigger
    for epoch in range(start_epoch, n_epochs):
        # per-epoch reseed from (seed, epoch): a resumed run draws the
        # SAME modality roulette and synthesis keys as an uninterrupted
        # one (the stream path reseeds its datasets the same way —
        # datasets.py reseed; the bank path previously restarted both
        # rngs from scratch on resume)
        key = jax.random.fold_in(base_key, epoch)
        rng_host = np.random.default_rng((seed, epoch))
        metric_hist: list = []
        t_ep = time.time()
        if stream is not None:
            if mesh is not None:
                # grouped plan: one dataset per batch so the whole batch is
                # one SPMD synthesis program, each item on its own rank
                group_plan = list(stream.epoch_grouped(
                    epoch, itr_per_epoch, batch_items))
            else:
                # key is already folded per epoch above
                item_iter = stream.epoch(epoch, itr_per_epoch * batch_items,
                                         key)
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
                subj = (bank.stage(subj_plan[it][1]) if stage_host
                        else bank.to_device(subj_plan[it][1]))
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
                if stage_host:
                    # drop the only reference: jax frees the subject
                    # buffers once the (already-enqueued) synthesis has
                    # consumed them — before the step's peak allocation
                    subj = None
            batch = apply_condition(batch, cfg.get("condition"))
            if critic_params is not None:
                batch["critic_params"] = critic_params
            if shard_train_batch is not None:
                batch = shard_train_batch(batch)
            lr = jnp.float32(lr_sched[min(gstep, len(lr_sched) - 1)])
            wd = jnp.float32(wd_sched[min(gstep, len(wd_sched) - 1)])
            with mesh_scope():
                state, metrics = step_fn(state, batch, lr, wd)
            # EVERY step's metrics enter the epoch average (the reference
            # logs per iteration, engine.py log_every; sampling every
            # log_itr-th step biased the curves) — kept as device scalars
            # so no per-iteration host sync; one stack+transfer per epoch
            metric_hist.append(metrics)
            if it % log_itr == 0:
                logger.info(f"epoch {epoch} it {it}/{itr_per_epoch} "
                            f"lr {float(lr):.2e} "
                            f"loss {float(metrics['loss_total']):.4f}")
            if vis_itr and gstep % vis_itr == 0:
                # periodic montage (parity: engine.py:167-179)
                from ..models.build import apply_processors, twostage_forward
                from ..utils.visualizer import FeatVisualizer, TaskVisualizer

                vcfg = cfg.get("visualizer") if hasattr(cfg, "get") else None
                if twostage_models is not None:
                    if vis_fwd is None:
                        vis_fwd = jax.jit(
                            lambda pp, tp, x: twostage_forward(
                                pathol_model, task_model, pp, tp, x, cfg))
                    outs = vis_fwd(state.params["pathol"],
                                   state.params["task"],
                                   batch["samples"]["input"][0])
                    outs = {("feat" if k == "feat_task" else k): v
                            for k, v in outs.items() if k != "feat_pathol"}
                    pathol = outs.get("pathology")
                    outs = apply_processors(outs, cfg)
                    if pathol is not None:
                        outs["pathology"] = pathol  # already sigmoided
                else:
                    if vis_fwd is None:
                        vis_fwd = jax.jit(
                            lambda p, x, c: apply_processors(
                                model.apply(p, x, cond=c), cfg))
                    c = batch.get("cond")
                    outs = vis_fwd(state.params,
                                   batch["samples"]["input"][0],
                                   None if c is None else c[0])
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
        # nanmean: skipped steps report NaN losses (step.py _finite_update)
        # and must not poison the epoch averages; 'skipped' itself is 0/1
        # so its mean stays the skip fraction
        ep_mean = jax.tree.map(lambda *xs: jnp.nanmean(jnp.stack(xs)),
                               *metric_hist)
        stats = {f"train_{k}": float(v) for k, v in ep_mean.items()}
        stats.update({"epoch": epoch, "epoch_time": time.time() - t_ep})

        if val_itr and (epoch + 1) % val_itr == 0:
            if val_batches is None:
                if stream is not None:
                    # mixture-representative val (one batch per draw of the
                    # training mixture; each dataset's own modality roulette)
                    val_batches, val_names = make_val_set_stream(
                        stream, seed, n_val_items, batch_items)
                    logger.info("val set spans datasets: "
                                f"{sorted(set(val_names))}")
                    if stage_host:
                        # same memory rule as the bank path: at the S=4
                        # @128^3 envelope the val set must not stay
                        # HBM-resident next to the train state; batches
                        # re-ship one at a time via eval_step's arg
                        # transfer (fenced by the float() reads)
                        val_batches = [jax.tree.map(np.asarray, b)
                                       for b in val_batches]
                else:
                    val_batches = make_val_set(bank, scfg, tasks, input_modes,
                                               knobs, seed, n_val_items,
                                               batch_items,
                                               stage_host=stage_host)
                # same conditioning as training (mask/flip channels) so
                # val losses are comparable and the conditioned model sees
                # the input width it was built with. Host-staged batches
                # stay numpy here (apply_condition works elementwise on
                # either) and re-ship per validation below.
                val_batches = [apply_condition(b, cfg.get("condition"))
                               for b in val_batches]
                if stage_host:
                    val_batches = [jax.tree.map(np.asarray, b)
                                   for b in val_batches]
                if twostage_models is not None:
                    eval_step = make_twostage_eval_step(
                        pathol_model, task_model, cfg, weight_dict, loss_fn)
                else:
                    eval_step = make_eval_step(
                        model, cfg, weight_dict, loss_fn, critic=critic,
                        critic_image_key=critic_key or "T1",
                        sample_accum=int(cfg.get("grad_accum_samples") or 1)
                        if hasattr(cfg, "get") else 1)
            acc: dict = {}
            for vb in val_batches:
                vl = eval_step(state.params, vb, critic_params)
                # host-staged val batches were shipped by eval_step's
                # arg transfer; the float() reads below fence each batch
                # so at most one is HBM-resident at a time
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
