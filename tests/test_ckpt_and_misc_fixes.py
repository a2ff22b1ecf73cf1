"""Round-2 code-review regressions: checkpoint resume glob, NIfTI path
stems, and process-stable dataset reseeding. Fast tier (no device work)."""

import os
import subprocess
import sys

import numpy as np


def test_latest_checkpoint_ignores_best_dirs(tmp_path):
    from brainfm_tpu.train.checkpoint import latest_checkpoint, step_from_path

    for d in ("ckpt_000002", "ckpt_000010", "ckpt_best", "ckpt_best_bk"):
        os.makedirs(tmp_path / d)
    p = latest_checkpoint(str(tmp_path))
    # 'b' sorts after digits — a bare ckpt_* glob would return ckpt_best_bk
    assert p.endswith("ckpt_000010")
    assert step_from_path(p) == 10


def test_path_stem():
    from brainfm_tpu.models.evaluator import path_stem

    assert path_stem("./preds/case1.nii.gz") == "./preds/case1"
    assert path_stem("outs/run.v2/pred.nii.gz") == "outs/run.v2/pred"
    assert path_stem("a/b.nii") == "a/b"
    assert path_stem("a/b.mgz") == "a/b"


def test_reseed_stable_across_processes():
    """The modality roulette must draw the same stream in a resumed run —
    i.e. the seed derivation cannot use the per-process-salted str hash."""
    prog = (
        "import numpy as np, zlib\n"
        "from brainfm_tpu.synth.datasets import SynthDataset\n"
        "import brainfm_tpu.synth.datasets as D\n"
        "class B:\n"
        "    pass\n"
        "d = SynthDataset.__new__(SynthDataset)\n"
        "d.name = 'ADHD'\n"
        "d.reseed(3)\n"
        "print(list(d._rng.integers(0, 1000, 4)))\n"
    )
    outs = []
    for hs in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=hs,
                   PYTHONPATH="/root/repo")
        r = subprocess.run([sys.executable, "-c", prog], env=env,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1], f"reseed differs across processes: {outs}"


def test_clip_per_parameter_semantics():
    """Reference clip_gradients (utils/misc.py:1329-1339) clips each
    tensor independently; a small-gradient tensor must be untouched even
    when another tensor is huge (global-norm clipping would shrink both)."""
    import jax.numpy as jnp

    from brainfm_tpu.train.step import clip_per_parameter

    tx = clip_per_parameter(1.0)
    grads = {"big": jnp.full((4,), 100.0), "small": jnp.full((4,), 0.01)}
    out, _ = tx.update(grads, tx.init(grads))
    bn = float(jnp.linalg.norm(out["big"]))
    assert abs(bn - 1.0) < 1e-4, bn
    np.testing.assert_allclose(np.asarray(out["small"]),
                               np.asarray(grads["small"]), rtol=1e-6)


def test_async_checkpoint_roundtrip(tmp_path):
    """block=False returns before the disk write finishes; finalize_pending
    makes it durable (extra.json + GC deferred until then) and the state
    restores exactly. Also: latest_checkpoint never surfaces the in-flight
    tmp dir."""
    import jax.numpy as jnp

    from brainfm_tpu.train.checkpoint import (finalize_pending,
                                              latest_checkpoint,
                                              load_checkpoint,
                                              read_extra, save_checkpoint)
    from brainfm_tpu.train.step import TrainState

    state = TrainState(
        {"params": {"w": jnp.arange(6.0).reshape(2, 3)}},
        {"m": jnp.zeros((2, 3))}, jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckp")
    for step in (1, 2, 3):
        save_checkpoint(d, step, state, extra={"epoch": step - 1},
                        keep=2, block=False)
    finalize_pending()
    # GC kept the last 2; extras written after finalize
    names = sorted(os.listdir(d))
    assert names == ["ckpt_000002", "ckpt_000003"], names
    assert read_extra(os.path.join(d, "ckpt_000003")) == {"epoch": 2}
    p = latest_checkpoint(d)
    assert p.endswith("ckpt_000003")
    restored = load_checkpoint(p, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]),
        np.arange(6.0).reshape(2, 3))
    assert int(restored.step) == 7


def test_extras_survive_crash_before_finalize(tmp_path):
    """An async save's extras must be durable from the moment save_checkpoint
    returns: if the run dies mid-next-epoch (before the deferred finalize),
    resume must still see epoch/best_val_stats — otherwise the next
    validation clobbers ckpt_best with a potentially worse model. The
    sidecar <path>.extra.json is written synchronously at save time;
    read_extra falls back to it, and latest_checkpoint never mistakes the
    sidecar FILE for a checkpoint dir."""
    import jax.numpy as jnp

    from brainfm_tpu.train import checkpoint as C
    from brainfm_tpu.train.step import TrainState

    state = TrainState({"params": {"w": jnp.ones((2,))}},
                       {"m": jnp.zeros((2,))}, jnp.asarray(1, jnp.int32))
    d = str(tmp_path / "ckp")
    extra = {"epoch": 4, "best_val_stats": {"loss_total": 0.5}}
    path = C.save_checkpoint(d, 5, state, extra=extra, keep=2, block=False)
    # sidecar is on disk immediately (the orbax dir may still be a tmp)
    assert os.path.isfile(path + ".extra.json")
    # simulate the process dying before finalize: let the background orbax
    # write land (a crash after the rename is the interesting case), then
    # drop the pending finalize exactly as a dead process would
    C._ASYNC["ckptr"].wait_until_finished()
    C._ASYNC["pending"] = None
    assert not os.path.isfile(os.path.join(path, "extra.json"))
    assert C.read_extra(path) == extra
    p = C.latest_checkpoint(d)
    assert p is not None and p.endswith("ckpt_000005") and os.path.isdir(p)
