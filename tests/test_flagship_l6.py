"""Flagship L6 model (cfgs/trainer/train/joint.yaml:26: num_levels 6,
2048-ch bottleneck, f_maps 64; crop 160^3 per
cfgs/generator/train/brain_id.yaml:53) on the 8-device virtual CPU mesh.

The 160^3 L6 train step does not fit one chip (remote compile OOM,
measured 2026-08-17); the flagship crop trains spatially sharded over the
mesh 'space' axis via GSPMD (XLA partitions the convs and inserts halo
exchanges). These tests assert that the sharded step is numerically the
unsharded step, at a realistic shape with the FULL architecture.

All tests here are slow (single host core emulates 8 devices): marked
`slow`, deselect with -m "not slow".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.parallel.mesh import make_mesh
from brainfm_tpu.train.step import TrainState, build_optimizer, \
    make_train_step

# NOTE: no module-level `slow` mark, but the flagship160 tests below carry
# BOTH markers: `-m` on the command line REPLACES the addopts
# `-m "not flagship160"` exclusion, so a bare `-m "not slow"` fast-tier run
# would otherwise pull in these ~1e14-FLOP runs and hang the host for hours
# (this happened: it stalled a whole build session). With both markers,
# every tier excludes them unless explicitly requested via
# `-m flagship160`; to run the slow tier use `-m "slow and not flagship160"`.


def _l6_cfg(size, f_maps=64):
    return AttrDict.from_nested({
        "task": {"T1": True, "segmentation": True, "distance": True,
                 "registration": True, "bias_field": True},
        "generator": {"left_hemis_only": False, "size": list(size)},
        "losses": {"uncertainty": None, "image_grad": True,
                   "registration_grad": True, "bias_field_log_type": "l2"},
        "weights": {k: 1.0 for k in ("seg_ce", "seg_dice", "image",
                                     "image_grad", "bias_field_log",
                                     "distance", "registration",
                                     "registration_grad")},
        "backbone": "unet3d", "f_maps": f_maps, "num_levels": 6,
        "num_groups": 8, "layer_order": "gcl", "unit_feat": False,
        "task_f_maps": [f_maps], "max_surf_distance": 3.0,
        "label_list_segmentation_with_csf": [0, 14, 15, 16, 24, 77, 85],
        "optimizer": "adamw", "lr": 1e-4, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "all_samples": 1, "remat": True,
    })


def _l6_batch(size, n_lab, B=1, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "samples": {
            "input": jnp.asarray(rng.random((B, 1, *size, 1)), jnp.float32),
            "bias_field_log": jnp.zeros((B, 1, *size, 1), jnp.float32),
        },
        "targets": {
            "T1": jnp.asarray(rng.random((B, 1, *size, 1)), jnp.float32),
            "segmentation": jax.nn.one_hot(jnp.asarray(
                rng.integers(0, n_lab, (B, 1, *size)), jnp.int32), n_lab),
            "distance": jnp.asarray(rng.random((B, 1, *size, 4)),
                                    jnp.float32),
            "registration": jnp.asarray(rng.random((B, 1, *size, 3)),
                                        jnp.float32),
        },
    }


def _make_loss(model, cfg, weight_dict, loss_fn):
    from brainfm_tpu.models.build import apply_processors
    from brainfm_tpu.models.criterion import weighted_total

    def loss_of(params, batch):
        def per_item(s, t):
            out = apply_processors(model.apply(params, s["input"]), cfg)
            return loss_fn(out, t, s)

        losses = jax.vmap(per_item)(batch["samples"], batch["targets"])
        return weighted_total({k: jnp.mean(v) for k, v in losses.items()},
                              weight_dict)

    return loss_of


def _assert_grads_close(ref_grads, sp_grads, rel_l2=2e-3):
    """Per-leaf relative-L2 gradient agreement. (After an ADAM step,
    reassociation noise flips update signs on near-zero grads — comparing
    stepped params would need a 2*lr tolerance that hides real errors;
    grads are the continuous quantity.)"""
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(sp_grads)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        err = np.linalg.norm(a - b) / denom
        assert err < rel_l2, f"grad rel-L2 {err:.2e} (leaf shape {a.shape})"


@pytest.mark.slow
def test_l6_spatial_shard_matches_unsharded_48():
    """Flagship DEPTH (L6: 6 levels — the part GSPMD partitioning can get
    wrong: conv halos, GroupNorm cross-shard stats, nearest-upsample
    re-sharding, and DEGENERATELY SMALL deep extents where the jax-0.9
    partitioner produces wrong gradients unless the UNet replicates them,
    models/unet3d.py _replicate_if_degenerate). 48^3 exercises odd level
    extents (48,24,12,6,3,1). Runs in fp64 so sharded-vs-unsharded is an
    EXACT criterion (in fp32 the deep net amplifies reassociation noise
    to percent-level on some grad leaves, masking real errors — measured:
    fp64 agrees to 1e-9, fp32 differs ~4e-2 on one decoder leaf with
    identical losses). Width f_maps 16: this host emulates 8 devices on
    ONE core; the f_maps-64 variant runs via -m flagship160.
    Correctness evidence for training the 160^3 crop spatially sharded
    (VERDICT next #2b/#8)."""
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    try:
        size = (48, 48, 48)
        cfg = _l6_cfg(size, f_maps=16)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)

        batch = _l6_batch(size, cfg.n_labels, B=2)
        batch = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, batch)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        vg = jax.jit(jax.value_and_grad(_make_loss(model, cfg, wd, loss_fn)))

        # unsharded (single-device) reference
        ref_loss, ref_grads = vg(params, batch)
        ref_loss = float(ref_loss)
        assert np.isfinite(ref_loss)

        # spatially-sharded: batch over 'data', volume D axis over 'space'
        mesh = make_mesh(data=2, space=4)
        repl = NamedSharding(mesh, P())
        sp = NamedSharding(mesh, P("data", None, "space"))
        sp_batch = jax.tree.map(
            lambda a: jax.device_put(a, sp) if a.ndim >= 3
            else jax.device_put(a, repl), batch)
        sp_params = jax.tree.map(lambda a: jax.device_put(a, repl), params)
        # set_mesh makes the mesh ambient so the UNet's deep-level
        # replication constraint engages
        with jax.sharding.set_mesh(mesh):
            sp_loss, sp_grads = vg(sp_params, sp_batch)

        np.testing.assert_allclose(float(sp_loss), ref_loss, rtol=1e-12)
        _assert_grads_close(ref_grads, sp_grads, rel_l2=1e-6)
    finally:
        _jax.config.update("jax_enable_x64", False)


@pytest.mark.flagship160
@pytest.mark.slow
def test_l6_full_width_spatial_shard_matches_unsharded_64():
    """The f_maps-64 (264M-param) variant of the equality test above —
    ~16x the FLOPs; run explicitly with -m flagship160 on a host with
    real cores. fp64 for the same reason as the 48-cube test: in fp32,
    reassociation noise alone reaches ~5e-2 rel-L2 on the deepest decoder
    conv leaf (3,3,3,3072,1024) — measured 4.69e-2 with losses agreeing
    to 3e-5 (2026-08-18) — which would force a tolerance loose enough to
    hide real partitioner errors. fp64 makes sharded==unsharded an exact
    criterion at full width too."""
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    try:
        size = (64, 64, 64)
        cfg = _l6_cfg(size, f_maps=64)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        batch = _l6_batch(size, cfg.n_labels, B=2)
        batch = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, batch)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        vg = jax.jit(jax.value_and_grad(_make_loss(model, cfg, wd, loss_fn)))
        ref_loss, ref_grads = vg(params, batch)
        mesh = make_mesh(data=2, space=4)
        repl = NamedSharding(mesh, P())
        sp = NamedSharding(mesh, P("data", None, "space"))
        sp_batch = jax.tree.map(
            lambda a: jax.device_put(a, sp) if a.ndim >= 3
            else jax.device_put(a, repl), batch)
        sp_params = jax.tree.map(lambda a: jax.device_put(a, repl), params)
        with jax.sharding.set_mesh(mesh):
            sp_loss, sp_grads = vg(sp_params, sp_batch)
        np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                                   rtol=1e-12)
        _assert_grads_close(ref_grads, sp_grads, rel_l2=1e-6)
    finally:
        _jax.config.update("jax_enable_x64", False)


@pytest.mark.flagship160
@pytest.mark.slow
def test_l6_sharded_train_160_runs():
    """The actual flagship configuration: 160^3 crop, L6, spatially
    sharded over 8 devices. Executes one train step and asserts a finite
    loss. (~1e14 FLOP on a single emulated core — run explicitly with
    -m flagship160; the driver-visible evidence lives in BASELINE.md.)"""
    size = (160, 160, 160)
    cfg = _l6_cfg(size)
    cfg, model = build_model(cfg, compute_dtype=jnp.bfloat16)
    _, wd, loss_fn = make_criterion(cfg)
    opt = build_optimizer(cfg)

    batch = _l6_batch(size, cfg.n_labels, B=1)
    params = model.init(jax.random.PRNGKey(0), batch["samples"]["input"][0])
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, cfg, wd, loss_fn, opt, donate=True)

    mesh = make_mesh(data=1, space=8)
    repl = NamedSharding(mesh, P())
    sp = NamedSharding(mesh, P("data", None, "space"))
    batch = jax.tree.map(
        lambda a: jax.device_put(a, sp) if a.ndim >= 3
        else jax.device_put(a, repl), batch)
    state = jax.tree.map(lambda a: jax.device_put(a, repl), state)
    with jax.sharding.set_mesh(mesh):
        state, metrics = step(state, batch, jnp.float32(1e-4),
                              jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss_total"]))
