"""Intra-subject gradient accumulation (train/step.py sample_accum):
splitting the S-sample stack into sequential microbatches inside the
jitted step must be EXACT — the criterion means per-sample losses over S
(SetMultiCriterion parity, models/criterion.py) and nothing in the model
couples samples, so the mean of k (S/k)-sample means equals the S-sample
mean and gradients match by linearity. This is what fits the reference's
full S=4 stack (Generator/datasets.py:728-750) at 128^3 on one chip —
the monolithic S=4 step plans 36 MB over the 15.75 GiB HBM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.train.step import TrainState, build_optimizer, \
    make_train_step


def _cfg(size):
    return AttrDict.from_nested({
        "task": {"T1": True, "segmentation": True},
        "generator": {"left_hemis_only": False, "size": list(size)},
        "losses": {"uncertainty": None, "image_grad": True},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 8,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
        "weights": {"seg_ce": 1.0, "seg_dice": 1.0, "image": 1.0,
                    "image_grad": 1.0},
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 1e-4,
        "clip_max_norm": 1.0,
    })


def _batch(rng, size, n_lab, B=1, S=4, dtype=jnp.float64):
    return {
        "samples": {
            "input": jnp.asarray(rng.random((B, S, *size, 1)), dtype),
            "bias_field_log": jnp.asarray(rng.random((B, S, *size, 1)),
                                          dtype),
        },
        "targets": {
            "T1": jnp.asarray(rng.random((B, 1, *size, 1)), dtype),
            "segmentation": jax.nn.one_hot(
                jnp.asarray(rng.integers(0, n_lab, (B, 1, *size))), n_lab,
                dtype=dtype),
        },
    }


def test_sample_accum_exact_fp64():
    """sample_accum=2 over an S=4 stack: loss, metrics, and updated params
    must match the monolithic step at fp64 (rel-L2 < 1e-9)."""
    jax.config.update("jax_enable_x64", True)
    try:
        size = (8, 8, 8)
        cfg = _cfg(size)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        rng = np.random.default_rng(0)
        batch = _batch(rng, size, cfg.n_labels)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))

        mono = make_train_step(model, cfg, wd, loss_fn, opt, donate=False)
        accum = make_train_step(model, cfg, wd, loss_fn, opt, donate=False,
                                sample_accum=2)
        s1, m1 = mono(state, batch, 1e-3, 1e-4)
        s2, m2 = accum(state, batch, 1e-3, 1e-4)
        assert np.isfinite(float(m1["loss_total"]))
        np.testing.assert_allclose(float(m2["loss_total"]),
                                   float(m1["loss_total"]), rtol=1e-12)
        for k in m1:
            np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                       rtol=1e-9, atol=1e-12, err_msg=k)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert err < 1e-9, f"param rel-L2 {err:.2e} (shape {a.shape})"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_eval_sample_accum_exact_fp64():
    """The validation twin (loop.make_eval_step sample_accum): chunked
    eval losses must match the monolithic eval at fp64."""
    from brainfm_tpu.train.loop import make_eval_step

    jax.config.update("jax_enable_x64", True)
    try:
        size = (8, 8, 8)
        cfg = _cfg(size)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        rng = np.random.default_rng(2)
        batch = _batch(rng, size, cfg.n_labels)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        mono = make_eval_step(model, cfg, wd, loss_fn)
        chunked = make_eval_step(model, cfg, wd, loss_fn, sample_accum=2)
        l1 = mono(params, batch)
        l2 = chunked(params, batch)
        assert set(l1) == set(l2)
        for k in l1:
            np.testing.assert_allclose(float(l2[k]), float(l1[k]),
                                       rtol=1e-9, atol=1e-12, err_msg=k)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_sample_accum_composes_with_mesh_fp64():
    """sample_accum under a data x space mesh (the --mesh path with an
    S=4-style config): the scanned microbatch gradients must psum
    correctly — fp64-exact vs the unsharded accumulated step (same
    protocol as tests/test_fsdp.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from brainfm_tpu.parallel.mesh import make_mesh

    jax.config.update("jax_enable_x64", True)
    try:
        size = (16, 16, 16)
        cfg = _cfg(size)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        rng = np.random.default_rng(3)
        batch = _batch(rng, size, cfg.n_labels, B=4)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        step = make_train_step(model, cfg, wd, loss_fn, opt, donate=False,
                               sample_accum=2)

        ref_state, ref_m = step(state, batch, 1e-3, 0.0)
        assert np.isfinite(float(ref_m["loss_total"]))

        mesh = make_mesh(data=4, space=2)
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        sp_batch = jax.tree.map(lambda a: jax.device_put(a, data_sh), batch)
        sp_state = jax.tree.map(lambda a: jax.device_put(a, repl), state)
        with jax.sharding.set_mesh(mesh):
            sp_state2, sp_m = step(sp_state, sp_batch, 1e-3, 0.0)
        np.testing.assert_allclose(float(sp_m["loss_total"]),
                                   float(ref_m["loss_total"]), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(sp_state2.params)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert err < 1e-9, f"param rel-L2 {err:.2e} (shape {a.shape})"
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_sample_accum_composes_with_fsdp_fp64():
    """sample_accum + FSDP/ZeRO (--fsdp with an S=4-style config): the
    scan's gradient carry lives on sharded params; the accumulated FSDP
    step must match the replicated accumulated step exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from brainfm_tpu.parallel.fsdp import shard_state
    from brainfm_tpu.parallel.mesh import make_mesh

    jax.config.update("jax_enable_x64", True)
    try:
        size = (8, 8, 8)
        cfg = _cfg(size)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        rng = np.random.default_rng(5)
        batch = _batch(rng, size, cfg.n_labels, B=4)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        step = make_train_step(model, cfg, wd, loss_fn, opt, donate=False,
                               sample_accum=2)
        ref_state, ref_m = step(state, batch, 1e-3, 0.0)

        mesh = make_mesh(data=4, space=2)
        data_sh = NamedSharding(mesh, P("data"))
        sp_batch = jax.tree.map(lambda a: jax.device_put(a, data_sh), batch)
        fsdp_state = shard_state(state, mesh)
        with jax.sharding.set_mesh(mesh):
            fsdp2, fsdp_m = step(fsdp_state, sp_batch, 1e-3, 0.0)
        np.testing.assert_allclose(float(fsdp_m["loss_total"]),
                                   float(ref_m["loss_total"]), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(fsdp2.params)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert err < 1e-9, f"param rel-L2 {err:.2e} (shape {a.shape})"
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_twostage_sample_accum_exact_fp64():
    """grad_accum_samples applies uniformly: the two-stage step's
    accumulated variant must match its monolithic twin at fp64."""
    from brainfm_tpu.models.build import build_inpaint_model
    from brainfm_tpu.train.step import make_twostage_train_step

    jax.config.update("jax_enable_x64", True)
    try:
        size = (8, 8, 8)
        cfg = AttrDict.from_nested({
            "task": {"T1": True, "segmentation": True, "pathology": True},
            "generator": {"left_hemis_only": False, "size": list(size)},
            "losses": {"uncertainty": None, "image_grad": False},
            "backbone": "unet3d+unet3d", "f_maps": 8, "num_levels": 2,
            "num_groups": 8, "layer_order": "gcl", "unit_feat": False,
            "task_f_maps": [8],
            "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
            "weights": {k: 1.0 for k in ("seg_ce", "seg_dice", "pathol_ce",
                                         "pathol_dice", "image")},
            "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
            "clip_max_norm": 0.0,
        })
        cfg, pm, tm = build_inpaint_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((1, 4, *size, 1)), jnp.float64)
        batch = {
            "samples": {"input": x},
            "targets": {
                "T1": jnp.asarray(rng.random((1, 1, *size, 1)), jnp.float64),
                "segmentation": jax.nn.one_hot(
                    jnp.asarray(rng.integers(0, cfg.n_labels, (1, 1, *size))),
                    cfg.n_labels, dtype=jnp.float64),
                "pathology": jnp.asarray(
                    (rng.random((1, 1, *size, 1)) > 0.9).astype(np.float64)),
            },
        }
        params = {"pathol": pm.init(jax.random.PRNGKey(0), x[0]),
                  "task": tm.init(jax.random.PRNGKey(1),
                                  jnp.concatenate([x[0], x[0]], -1))}
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        mono = make_twostage_train_step(pm, tm, cfg, wd, loss_fn, opt,
                                        donate=False)
        accum = make_twostage_train_step(pm, tm, cfg, wd, loss_fn, opt,
                                         donate=False, sample_accum=2)
        s1, m1 = mono(state, batch, 1e-3, 0.0)
        s2, m2 = accum(state, batch, 1e-3, 0.0)
        np.testing.assert_allclose(float(m2["loss_total"]),
                                   float(m1["loss_total"]), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert err < 1e-9, f"param rel-L2 {err:.2e} (shape {a.shape})"
    finally:
        jax.config.update("jax_enable_x64", False)


def test_sample_accum_must_divide_S():
    size = (8, 8, 8)
    cfg = _cfg(size)
    cfg, model = build_model(cfg)
    _, wd, loss_fn = make_criterion(cfg)
    opt = build_optimizer(cfg)
    rng = np.random.default_rng(1)
    batch = _batch(rng, size, cfg.n_labels, S=3, dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch["samples"]["input"][0])
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, cfg, wd, loss_fn, opt, donate=False,
                           sample_accum=2)
    with pytest.raises(AssertionError, match="must divide"):
        step(state, batch, 1e-3, 0.0)
