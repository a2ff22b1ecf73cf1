"""The jitted training step.

Parity with the reference hot loop (/root/reference/Trainer/engine.py:66-188
`train_one_epoch` per-iteration body): forward over the intra-subject
sample stack, output processors, weighted multi-task criterion, non-finite
loss skipping (engine.py:131-145), gradient clipping, adamw with
per-iteration lr/wd lookup.

TPU design: one pure function jitted once; data parallelism comes from
sharding the leading sample/batch axis over the mesh 'data' axis — XLA
inserts the gradient psum the reference gets from DDP hooks
(scripts/train.py:154). bf16 compute / fp32 params replaces AMP+GradScaler
(no loss scaling needed on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.build import apply_processors
from ..models.criterion import weighted_total


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def clip_per_parameter(clip: float):
    """Per-parameter-tensor L2 clipping (parity: utils/misc.py:1329-1339 —
    the reference clips EACH tensor to clip_max_norm independently, not
    the global norm; with ~100 tensors the global-norm semantics would be
    ~10x tighter on a uniformly-large gradient)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def c(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, clip / (n + 1e-6))

        return jax.tree.map(c, updates), state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg):
    """(parity: build_optimizer, Trainer/models/__init__.py:362-372).
    lr/wd are injected per step via optax.inject_hyperparams.
    cfg.clip_mode: 'per_param' (default — reference clip_gradients
    semantics) or 'global' (optax global-norm)."""
    name = (cfg.optimizer or "adamw").lower()
    clip = float(cfg.clip_max_norm or 0.0)
    clip_mode = str(cfg.get("clip_mode") or "per_param")

    def make(learning_rate=1e-4, weight_decay=0.0):
        chain = []
        if clip > 0:
            chain.append(optax.clip_by_global_norm(clip)
                         if clip_mode == "global"
                         else clip_per_parameter(clip))
        if name == "adam":
            chain.append(optax.adam(learning_rate))
        elif name == "adamw":
            chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
        elif name == "sgd":
            chain.append(optax.sgd(learning_rate, momentum=0.9))
        elif name == "lars":
            chain.append(optax.lars(learning_rate, weight_decay=weight_decay))
        else:
            raise ValueError(f"unknown optimizer {name}")
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(learning_rate=float(cfg.lr or 1e-4),
                                          weight_decay=float(cfg.weight_decay
                                                             or 0.0))


def _finite_update(state: TrainState, optimizer, total, losses, grads,
                   lr, wd):
    """Shared skip-on-non-finite optimizer update (parity:
    engine.py:131-145 — the reference hard-skips the whole optimizer.step
    on a bad batch, so params AND opt state (Adam moments, bias-correction
    count) must be untouched). Skipped steps report their loss metrics as
    NaN so the epoch aggregation (nanmean, train/loop.py) excludes them —
    the reference `continue`s before logging, so its curves never contain
    the bad value either; 'skipped' stays 0/1 so its mean is the skip
    fraction."""
    finite = jnp.isfinite(total)
    for g in jax.tree.leaves(grads):
        finite = finite & jnp.all(jnp.isfinite(g))
    grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = lr
    opt_state.hyperparams["weight_decay"] = wd
    updates, new_opt = optimizer.update(grads, opt_state, state.params)
    updates = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), updates)
    new_params = optax.apply_updates(state.params, updates)
    new_opt = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                           new_opt, opt_state)
    nan = jnp.asarray(jnp.nan, jnp.float32)
    metrics = {k: jnp.where(finite, v, nan) for k, v in losses.items()}
    metrics["loss_total"] = jnp.where(finite, total, nan)
    metrics["skipped"] = 1.0 - finite.astype(jnp.float32)
    return TrainState(new_params, new_opt, state.step + 1), metrics


def make_train_step(model, cfg, weight_dict, loss_fn: Callable, optimizer,
                    donate: bool = True, critic=None,
                    critic_image_key: str = "T1",
                    donate_batch: bool = False, sample_accum: int = 1):
    """Returns jitted `step(state, batch, lr, wd) -> (state, metrics)`.

    batch: {'samples': {...leading S axis...}, 'targets': {... leading 1...},
            'cond': optional, 'critic_params': optional frozen critic weights
            (threaded as data, never as closure constants)}.
    `critic`: a built pathol critic model (models.build.build_pathol_critic)
    enabling the implicit-pathology losses (PatholSeg parity).
    `donate_batch`: additionally donate the batch arg — XLA may alias its
    ~0.6 GiB into outputs/scratch. Only valid when the caller never
    touches the batch after the step (no visualizer read-back, no
    critic_params threaded through it — those would be freed too).
    `sample_accum`: split the intra-subject sample stack S into this many
    sequential microbatches inside ONE jitted step (lax.scan) and average
    the gradients — EXACT: the criterion means per-sample losses over S
    (SetMultiCriterion parity), the mean of k S/k-sample means equals the
    S-sample mean, and nothing in the model couples samples (GroupNorm
    stats are per-sample). The scan carry is one fp32 grad tree; peak
    activation memory drops to one microbatch's. This is what fits the
    reference's full S=4 stack (Generator/datasets.py:728-750) at 128^3
    on one 15.75 GiB chip: the monolithic S=4 step plans 15.78 GiB —
    over by 36 MB — with ~4.2 GiB of 2.0x lane padding in the full-res
    decoder wgrad copies that no remat mode avoids (measured 2026-08-21;
    cfg grad_accum_samples, cfgs/generator/train/brain_id_128_s4.yaml).
    """

    def per_item(params, samples, targets, cond, critic_params):
        outputs = model.apply(params, samples["input"], cond=cond)
        outputs = apply_processors(outputs, cfg)
        if critic is not None and critic_params is not None:
            from ..models.build import implicit_pathol_outputs

            outputs = implicit_pathol_outputs(critic, critic_params, outputs,
                                              targets, critic_image_key)
        return loss_fn(outputs, targets, samples)

    def loss_and_metrics(params, batch):
        # batch leaves carry a leading item axis B (data-parallel over the
        # mesh 'data' axis); each item holds its intra-subject sample stack S
        samples = batch["samples"]
        targets = batch["targets"]
        cond = batch.get("cond")
        critic_params = batch.get("critic_params")
        if cond is None:
            losses = jax.vmap(lambda s, t: per_item(params, s, t, None,
                                                    critic_params))(
                samples, targets)
        else:
            losses = jax.vmap(lambda s, t, c: per_item(params, s, t, c,
                                                       critic_params))(
                samples, targets, cond)
        losses = {k: jnp.mean(v) for k, v in losses.items()}
        total = weighted_total(losses, weight_dict)
        return total, losses

    def step(state: TrainState, batch, lr, wd):
        (total, losses), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True)(state.params, batch)
        return _finite_update(state, optimizer, total, losses, grads, lr, wd)

    def step_accum(state: TrainState, batch, lr, wd):
        k = sample_accum
        samples = batch["samples"]
        rest = {kk: vv for kk, vv in batch.items() if kk != "samples"}
        S = jax.tree.leaves(samples)[0].shape[1]
        assert S % k == 0, (
            f"sample_accum={k} must divide the intra-subject stack S={S}")

        def split(a):  # (B, S, ...) -> (k, B, S/k, ...) microbatch-major
            b = a.reshape(a.shape[0], k, S // k, *a.shape[2:])
            return jnp.moveaxis(b, 1, 0)

        msamples = jax.tree.map(split, samples)
        mcond = None
        if rest.get("cond") is not None:
            mcond = split(rest["cond"])

        def micro(gacc, xs):
            msamp, mc = xs
            mb = dict(rest)
            mb["samples"] = msamp
            mb["cond"] = mc
            (t, l), g = jax.value_and_grad(
                loss_and_metrics, has_aux=True)(state.params, mb)
            gacc = jax.tree.map(jnp.add, gacc, g)
            return gacc, (t, l)

        gzero = jax.tree.map(jnp.zeros_like, state.params)
        if mcond is None:
            # scan xs must be arrays: carry a dummy None-free cond slot
            grads, (totals, losses) = jax.lax.scan(
                lambda c, x: micro(c, (x, None)), gzero, msamples)
        else:
            grads, (totals, losses) = jax.lax.scan(
                micro, gzero, (msamples, mcond))
        grads = jax.tree.map(lambda g: g / k, grads)
        total = jnp.mean(totals)
        losses = {kk: jnp.mean(vv) for kk, vv in losses.items()}
        return _finite_update(state, optimizer, total, losses, grads, lr, wd)

    argnums = (0,) if donate else ()
    if donate_batch:
        argnums = argnums + (1,)
    return jax.jit(step if sample_accum == 1 else step_accum,
                   donate_argnums=argnums)


def make_twostage_train_step(pathol_model, task_model, cfg, weight_dict,
                             loss_fn, optimizer, train_stage0: bool = True,
                             donate: bool = True, sample_accum: int = 1):
    """Two-stage inpainting step (parity: train_one_epoch_twostage,
    Trainer/engine.py:193-318): stage-0 predicts the pathology mask from the
    input; stage-1 sees input*(1-mask) conditioned on the mask. Both stages
    train jointly under one optimizer (params = {'pathol':..., 'task':...});
    set train_stage0=False to freeze the pathology predictor.
    `sample_accum`: same exact sample-axis microbatching as
    make_train_step (cfg grad_accum_samples applies uniformly)."""

    def per_item(params, samples, targets):
        x = samples["input"]
        pp = params["pathol"]
        if not train_stage0:
            pp = jax.lax.stop_gradient(pp)
        out_p = pathol_model.apply(pp, x)
        pathol = jax.nn.sigmoid(out_p["pathology"])
        masked = x * (1.0 - pathol)
        out = dict(task_model.apply(params["task"], masked, cond=pathol))
        out["pathology"] = pathol
        out = apply_processors(out, cfg)
        out["pathology"] = pathol  # keep the sigmoid (not double-squashed)
        return loss_fn(out, targets, samples)

    def loss_and_metrics(params, batch):
        losses = jax.vmap(lambda s, t: per_item(params, s, t))(
            batch["samples"], batch["targets"])
        losses = {k: jnp.mean(v) for k, v in losses.items()}
        return weighted_total(losses, weight_dict), losses

    def step(state: TrainState, batch, lr, wd):
        (total, losses), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True)(state.params, batch)
        return _finite_update(state, optimizer, total, losses, grads, lr, wd)

    def step_accum(state: TrainState, batch, lr, wd):
        k = sample_accum
        samples = batch["samples"]
        rest = {kk: vv for kk, vv in batch.items() if kk != "samples"}
        S = jax.tree.leaves(samples)[0].shape[1]
        assert S % k == 0, (
            f"sample_accum={k} must divide the intra-subject stack S={S}")

        def split(a):
            b = a.reshape(a.shape[0], k, S // k, *a.shape[2:])
            return jnp.moveaxis(b, 1, 0)

        def micro(gacc, msamp):
            mb = dict(rest)
            mb["samples"] = msamp
            (t, l), g = jax.value_and_grad(
                loss_and_metrics, has_aux=True)(state.params, mb)
            return jax.tree.map(jnp.add, gacc, g), (t, l)

        gzero = jax.tree.map(jnp.zeros_like, state.params)
        grads, (totals, losses) = jax.lax.scan(
            micro, gzero, jax.tree.map(split, samples))
        grads = jax.tree.map(lambda g: g / k, grads)
        total = jnp.mean(totals)
        losses = {kk: jnp.mean(vv) for kk, vv in losses.items()}
        return _finite_update(state, optimizer, total, losses, grads, lr, wd)

    return jax.jit(step if sample_accum == 1 else step_accum,
                   donate_argnums=(0,) if donate else ())
