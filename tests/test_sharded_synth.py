"""Per-rank sharded synthesis (synth/sharded.py): the shard_map batch
maker must reproduce the serial `make_batch` items bit-for-bit while
placing each item's computation on its own data-rank — the TPU analog of
the reference's per-rank DataLoader workers (scripts/train.py:154-158)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.parallel.mesh import make_mesh
from brainfm_tpu.synth import SynthStatic, synth_item
from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack
from brainfm_tpu.synth.sharded import sharded_synth_batch, stack_items

SIZE = (32, 32, 32)
TASKS = ("T1", "segmentation", "distance", "registration", "bias_field")


@pytest.fixture(scope="module")
def bank():
    b = SubjectBank(bank_shape=(48, 48, 48))
    b.add_debug_subject(seed=0, extent=(40, 44, 42))
    b.add_debug_subject(seed=1, extent=(40, 44, 42))
    return b


@pytest.fixture(scope="module")
def cfg():
    return SynthStatic(size=SIZE, all_samples=2, mild_samples=1)


def _serial_batch(keys, subjects, cfg, knobs, mode="synth"):
    targets, samples = [], []
    for k, subj in zip(keys, subjects):
        t, s = synth_item(k, subj, cfg, TASKS, mode, knobs)
        targets.append(t)
        samples.append(s)
    return stack_items(targets, samples)


def _assert_tree_equal(a, b):
    ka, kb = sorted(a), sorted(b)
    assert ka == kb, (ka, kb)
    for k in ka:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


@pytest.mark.parametrize("mode", ["synth", "T1"])
def test_sharded_matches_serial(bank, cfg, mode):
    mesh = make_mesh(data=4, space=2)
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, mode)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    batch = sharded_synth_batch(mesh, keys, subj, cfg, TASKS, mode, knobs)
    ref = _serial_batch(list(keys), [subj] * B, cfg, knobs, mode)

    _assert_tree_equal(batch["samples"], ref["samples"])
    _assert_tree_equal(batch["targets"], ref["targets"])
    # the batch comes out sharded over 'data' — no reshard needed before
    # the data-parallel train step
    sh = batch["samples"]["input"].sharding
    spec = sh.spec if hasattr(sh, "spec") else None
    assert spec is not None and spec[0] in (("data",), "data"), spec


def test_sharded_per_item_subjects(bank, cfg):
    """Each rank synthesizes from its OWN subject (stream mode: distinct
    subjects per batch item, stacked on the leading axis)."""
    mesh = make_mesh(data=4, space=2)
    s0, s1 = bank.to_device(0), bank.to_device(1)
    knobs = build_knobs_stack(cfg, "synth")
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    order = [0, 1, 1, 0]
    subs = [(s0, s1)[i] for i in order]
    stacked = {k: jnp.stack([s[k] for s in subs]) for k in s0}

    batch = sharded_synth_batch(mesh, keys, stacked, cfg, TASKS, "synth",
                                knobs, per_item_subject=True)
    ref = _serial_batch(list(keys), subs, cfg, knobs)
    _assert_tree_equal(batch["samples"], ref["samples"])
    _assert_tree_equal(batch["targets"], ref["targets"])
    # sanity: the two subjects actually produce different items
    x = np.asarray(batch["samples"]["input"])
    assert not np.array_equal(x[0], x[1])


def test_sharded_all_axes(bank, cfg):
    """B == n_devices items sharded over the flattened (data, space) mesh:
    every device synthesizes exactly one item."""
    mesh = make_mesh(data=4, space=2)
    subj = bank.to_device(0)
    knobs = build_knobs_stack(cfg, "T1")
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    batch = sharded_synth_batch(mesh, keys, subj, cfg, TASKS, "T1", knobs,
                                axes=("data", "space"))
    ref = _serial_batch(list(keys), [subj] * B, cfg, knobs, mode="T1")
    _assert_tree_equal(batch["samples"], ref["samples"])
