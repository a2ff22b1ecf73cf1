"""ZeRO/FSDP parameter + optimizer-state sharding (parallel/fsdp.py).

The reference's only strategy is DDP with fully replicated params
(/root/reference/scripts/train.py:154-158); FSDP is the TPU-native
extension for state that outgrows one chip's HBM. These tests prove the
sharded math IS the replicated math (fp64-exact) and that the train step
keeps the state sharded across steps (no silent re-replication)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from brainfm_tpu.config import AttrDict
from brainfm_tpu.models import build_model
from brainfm_tpu.models.criterion import make_criterion
from brainfm_tpu.parallel.fsdp import (fsdp_spec, init_sharded, shard_state,
                                       state_shardings)
from brainfm_tpu.parallel.mesh import make_mesh
from brainfm_tpu.train.step import TrainState, build_optimizer, \
    make_train_step


def _cfg(size=(16, 16, 16)):
    return AttrDict.from_nested({
        "task": {"T1": True, "segmentation": True},
        "generator": {"left_hemis_only": False, "size": list(size)},
        "losses": {"uncertainty": None, "image_grad": False},
        "weights": {"seg_ce": 1.0, "seg_dice": 1.0, "image": 1.0},
        "backbone": "unet3d", "f_maps": 8, "num_levels": 2, "num_groups": 4,
        "layer_order": "gcl", "unit_feat": False, "task_f_maps": [8],
        "label_list_segmentation_with_csf": [0, 14, 15],
        "optimizer": "adamw", "lr": 1e-3, "weight_decay": 0.0,
        "clip_max_norm": 1.0, "all_samples": 1,
    })


def _batch(size, n_lab, B, seed=3, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return {
        "samples": {
            "input": jnp.asarray(rng.random((B, 1, *size, 1)), dtype),
        },
        "targets": {
            "T1": jnp.asarray(rng.random((B, 1, *size, 1)), dtype),
            "segmentation": jax.nn.one_hot(jnp.asarray(
                rng.integers(0, n_lab, (B, 1, *size)), jnp.int32), n_lab,
                dtype=dtype),
        },
    }


def test_fsdp_spec_rule():
    # largest divisible dim is sharded; scalars/odd tensors replicate
    assert fsdp_spec((3, 3, 3, 8, 16), 8) == P(None, None, None, None, "data")
    assert fsdp_spec((16,), 8) == P("data")
    assert fsdp_spec((), 8) == P()
    assert fsdp_spec((3, 5, 7), 8) == P()
    # ties go to the largest, not the first, qualifying dim
    assert fsdp_spec((8, 24), 8) == P(None, "data")


def _leaf_is_sharded(a):
    return any(s is not None for s in (a.sharding.spec or ()))


def test_fsdp_step_matches_replicated_fp64():
    """One full train step, FSDP-sharded over 'data' composed with a
    'space' axis on the batch, vs the single-device step — fp64 so
    equality is exact (same protocol as tests/test_flagship_l6.py)."""
    jax.config.update("jax_enable_x64", True)
    try:
        size = (16, 16, 16)
        cfg = _cfg(size)
        cfg, model = build_model(cfg, compute_dtype=jnp.float64)
        _, wd, loss_fn = make_criterion(cfg)
        opt = build_optimizer(cfg)
        B = 4
        batch = _batch(size, cfg.n_labels, B, dtype=jnp.float64)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["samples"]["input"][0])
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        step = make_train_step(model, cfg, wd, loss_fn, opt, donate=False)

        ref_state, ref_m = step(state, batch, 1e-3, 0.0)
        assert np.isfinite(float(ref_m["loss_total"]))

        mesh = make_mesh(data=4, space=2)
        sp_state = shard_state(state, mesh)
        # some leaves must actually be sharded (the point of FSDP)
        sharded = [a for a in jax.tree.leaves(sp_state.params)
                   if _leaf_is_sharded(a)]
        assert sharded, "no parameter leaf was sharded"
        vol = NamedSharding(mesh, P("data", None, "space"))
        repl = NamedSharding(mesh, P())
        sp_batch = jax.tree.map(
            lambda a: jax.device_put(a, vol if a.ndim >= 3 else repl), batch)
        with jax.sharding.set_mesh(mesh):
            sp_state2, sp_m = step(sp_state, sp_batch, 1e-3, 0.0)

        np.testing.assert_allclose(float(sp_m["loss_total"]),
                                   float(ref_m["loss_total"]), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(sp_state2.params)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            err = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
            assert err < 1e-9, f"param rel-L2 {err:.2e} (shape {a.shape})"

        # the updated state must STAY sharded (a partitioner that
        # re-replicates would silently undo the memory saving)
        for old, new in zip(jax.tree.leaves(sp_state.params),
                            jax.tree.leaves(sp_state2.params)):
            assert old.sharding.spec == new.sharding.spec, \
                (old.sharding.spec, new.sharding.spec, old.shape)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_init_sharded_matches_device_put():
    """init_sharded computes the state directly into its shards (out-
    shardings jit) — same values and placement as init-then-shard."""
    size = (16, 16, 16)
    cfg = _cfg(size)
    cfg, model = build_model(cfg)
    opt = build_optimizer(cfg)
    mesh = make_mesh(data=8, space=1)
    x0 = jnp.zeros((1, *size, 1), jnp.float32)

    def make_state(rng, x):
        p = model.init(rng, x)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    st = init_sharded(make_state, mesh, jax.random.PRNGKey(0), x0)
    ref = make_state(jax.random.PRNGKey(0), x0)
    want = state_shardings(ref, mesh)
    for a, b, sh in zip(jax.tree.leaves(st), jax.tree.leaves(ref),
                        jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-7)
        assert a.sharding.spec == sh.spec, (a.sharding.spec, sh.spec)


def test_train_fsdp_requires_mesh(tmp_path):
    """fsdp=True without a mesh must raise, not silently train a fully
    replicated single-device state (scripts/train.py --fsdp sans --mesh)."""
    from brainfm_tpu.train.loop import train

    cfg = _cfg((16, 16, 16))
    cfg2, model = build_model(cfg)
    _, weight_dict, loss_fn = make_criterion(cfg2)
    with pytest.raises(ValueError, match="fsdp"):
        train(cfg2, model, weight_dict, loss_fn, None, str(tmp_path / "r"),
              itr_per_epoch=1, fsdp=True)


@pytest.mark.slow
def test_train_loop_fsdp_smoke(tmp_path):
    """The training loop runs end to end with fsdp=True on a data x space
    mesh (scripts/train.py --mesh 4x2 --fsdp)."""
    from brainfm_tpu.synth.datasets import ConcatStream, build_datasets
    from brainfm_tpu.train.loop import train

    cfg = _cfg()
    cfg.generator.max_rotation = 10
    cfg.generator.max_shear = 0.1
    cfg.generator.max_scaling = 0.1
    cfg.generator.nonlinear_transform = True
    cfg.n_epochs = 1
    cfg.mild_samples = 1
    cfg.dataset_names = ["ADHD"]
    cfg.dataset_probs = [1.0]
    cfg.bank_shape = [24, 24, 24]
    ds = build_datasets(cfg, tasks=("T1", "segmentation"))
    d = ds["ADHD"]
    d.bank.subjects.clear()
    d.bank.bank_shape = (24, 24, 24)
    d.bank.add_debug_subject(seed=0, extent=(20, 20, 20))
    stream = ConcatStream({"ADHD": d}, [1.0])
    cfg2, model = build_model(cfg)
    _, weight_dict, loss_fn = make_criterion(cfg2)
    mesh = make_mesh(data=4, space=2)
    state = train(cfg2, model, weight_dict, loss_fn, None,
                  str(tmp_path / "run"), itr_per_epoch=2, batch_items=4,
                  seed=0, log_itr=1, val_itr=1, n_val_items=1, stream=stream,
                  mesh=mesh, fsdp=True)
    assert int(state.step) == 2
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert any(_leaf_is_sharded(a) for a in leaves)

    # resume: the orbax save of the SHARDED state restores unsharded, the
    # loop re-shards, and training continues one more epoch
    from brainfm_tpu.train.checkpoint import latest_checkpoint

    ck = latest_checkpoint(str(tmp_path / "run" / "ckp"))
    assert ck is not None
    cfg2.n_epochs = 2
    state2 = train(cfg2, model, weight_dict, loss_fn, None,
                   str(tmp_path / "run"), itr_per_epoch=2, batch_items=4,
                   seed=0, log_itr=1, val_itr=1, n_val_items=1,
                   stream=stream, mesh=mesh, fsdp=True, resume=ck)
    assert int(state2.step) == 4
    assert any(_leaf_is_sharded(a) for a in jax.tree.leaves(state2.params))
