"""Checkpointing: orbax save/restore + reference-.pth import.

Parity with the reference save/load protocol (/root/reference/
scripts/train.py:196-214 epoch-granular save with previous-best backup;
utils/checkpoint.py:409-458 load). The reference's fuzzy state-dict
alignment (checkpoint.py:538-680) is replaced by the explicit importer in
models/torch_import.py; the reference's optimizer-restore typo bug
(checkpoint.py:454 'optimizaer') is not reproduced — optimizer state
restores correctly here.
"""

from __future__ import annotations

import glob
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


# async save bookkeeping: orbax's StandardCheckpointer is an
# AsyncCheckpointer — `save` returns once the device->host gather is done
# and serializes to disk in a background thread. One checkpointer instance
# is kept so at most one save is in flight; the post-save filesystem work
# (extra.json, GC) is deferred until that save finalizes (orbax only
# renames the tmp dir into place then).
_ASYNC = {"ckptr": None, "pending": None}


def _get_ckptr():
    if _ASYNC["ckptr"] is None:
        _ASYNC["ckptr"] = ocp.StandardCheckpointer()
    return _ASYNC["ckptr"]


def finalize_pending():
    """Block until the in-flight async save (if any) is durable, then move
    its sidecar extra.json into the checkpoint dir and run the rolling GC.
    Call at train end (the loop does) and before reading a just-saved
    checkpoint."""
    pend = _ASYNC["pending"]
    if pend is None:
        return
    _ASYNC["ckptr"].wait_until_finished()
    _ASYNC["pending"] = None
    path, keep, ckpt_dir = pend
    # filesystem surgery around the collective save is NOT multihost-aware
    # in orbax — master-only, like the reference's save_on_master
    # (utils/misc.py:432)
    if jax.process_index() == 0:
        # the extras were written DURABLY as a sidecar at save time (the
        # orbax dir only appears when its background rename lands — a crash
        # mid-epoch must not lose best_val_stats); canonicalize in-dir now
        side = path + ".extra.json"
        if os.path.isfile(side) and os.path.isdir(path):
            os.replace(side, os.path.join(path, "extra.json"))
        if keep > 0:
            import shutil

            # numeric sort: lexicographic puts ckpt_1000000 BEFORE
            # ckpt_999999, so past step 1e6 a name sort would GC the
            # newest checkpoints and keep stale ones
            old = sorted((p for p in glob.glob(
                os.path.join(ckpt_dir, "ckpt_[0-9]*"))
                if "tmp" not in os.path.basename(p)
                and os.path.isdir(p)), key=step_from_path)[:-keep]
            for p in old:
                shutil.rmtree(p, ignore_errors=True)
                if os.path.isfile(p + ".extra.json"):
                    os.remove(p + ".extra.json")


def save_checkpoint(ckpt_dir: str, step: int, state, extra: dict | None = None,
                    keep: int = 0, block: bool = True):
    """Save params/opt_state/step (+ json-able extras) at `ckpt_dir/step`.

    `keep`: if >0, garbage-collect older step checkpoints so at most `keep`
    ckpt_* dirs remain (the reference keeps a rolling 2: the live
    brainfm_pretrained.pth + its _bk rename, scripts/train.py:196-198;
    best-checkpoint dirs are never collected).

    `block=False` makes the save asynchronous: the call returns after the
    device->host gather and disk serialization proceeds in a background
    thread while training continues (at flagship scale a blocking save of
    the 264M-param state stalls the step stream). The previous async save
    is always finalized first, so at most one is in flight."""
    finalize_pending()
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:06d}")
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    _get_ckptr().save(path, payload, force=True)  # multihost-collective
    if extra and jax.process_index() == 0:
        # sidecar write NOW, not at finalize: the json is tiny and host-
        # side, and deferring it a full epoch means a crash loses the
        # epoch/best_val_stats of an otherwise-durable checkpoint
        import json

        with open(path + ".extra.json", "w") as f:
            json.dump(extra, f)
    _ASYNC["pending"] = (path, keep, ckpt_dir)
    if block:
        finalize_pending()
    return path


def save_best_checkpoint(ckpt_dir: str, step: int, state,
                         extra: dict | None = None):
    """Save the new best checkpoint at `ckpt_dir/ckpt_best`, renaming the
    previous best to ckpt_best_bk first (parity: the pre-save rename of
    brainfm_pretrained.pth -> brainfm_pretrained_bk.pth,
    /root/reference/scripts/train.py:196-198)."""
    import shutil

    finalize_pending()
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    best = os.path.join(ckpt_dir, "ckpt_best")
    bk = os.path.join(ckpt_dir, "ckpt_best_bk")
    # the rename/rmtree surgery must run on exactly one process (the orbax
    # save below is multihost-collective; this isn't), and every process
    # must wait for it before saving into the vacated path
    if jax.process_index() == 0 and os.path.isdir(best):
        shutil.rmtree(bk, ignore_errors=True)
        os.rename(best, bk)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("brainfm_best_ckpt_rename")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    ckptr.save(best, payload, force=True)
    ckptr.wait_until_finished()
    if extra and jax.process_index() == 0:
        import json

        with open(os.path.join(best, "extra.json"), "w") as f:
            json.dump(extra, f)
    return best


def read_extra(path: str) -> dict:
    """Read the json extras (epoch, best_val_stats, ...) saved next to a
    checkpoint; {} if absent. Checks the canonical in-dir extra.json first,
    then the save-time sidecar (present when a run died before the async
    save's finalize)."""
    import json

    path = os.path.abspath(path)
    for p in (os.path.join(path, "extra.json"), path + ".extra.json"):
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
    return {}


def latest_checkpoint(ckpt_dir: str):
    """Newest STEP checkpoint (parity: the resume glob of
    scripts/train.py:176-183). The digit pattern keeps ckpt_best /
    ckpt_best_bk out — 'b' sorts after every digit, so a bare ckpt_* glob
    would resume from a stale best instead of the newest step."""
    finalize_pending()  # an in-flight async save only exists as a tmp dir
    paths = sorted((p for p in glob.glob(
        os.path.join(ckpt_dir, "ckpt_[0-9]*"))
        if "tmp" not in os.path.basename(p) and os.path.isdir(p)),
        key=step_from_path)  # numeric: names sort wrong past step 1e6
    return paths[-1] if paths else None


def load_checkpoint(path: str, abstract_state):
    """Restore into the structure of `abstract_state` (a TrainState-shaped
    pytree of ShapeDtypeStructs or concrete arrays)."""
    ckptr = ocp.StandardCheckpointer()
    # pass the step leaf through unwrapped: np.asarray on a
    # ShapeDtypeStruct yields a 0-d OBJECT array orbax cannot restore
    # into, breaking the documented abstract-pytree use
    step_t = abstract_state.step
    if not isinstance(step_t, jax.ShapeDtypeStruct):
        step_t = np.asarray(step_t)
    target = {"params": abstract_state.params,
              "opt_state": abstract_state.opt_state,
              "step": step_t}
    restored = ckptr.restore(os.path.abspath(path), target)
    from .step import TrainState

    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])


def load_reference_pth(path: str, target=None, exclude_key: str | None = None,
                       to_match: dict | None = None):
    """Import a reference torch checkpoint into flax params
    (see models/torch_import.py).

    With ``target`` (a live model's params pytree), the import goes through
    the fuzzy aligner so partial/renamed/2D checkpoints load and excluded
    keys keep their live init (parity: load_checkpoint(..., exclude_key=
    'supervised_seg'), /root/reference/scripts/train.py:182)."""
    from ..models.torch_import import (import_checkpoint,
                                       import_checkpoint_aligned)

    if target is not None:
        return import_checkpoint_aligned(path, target,
                                         exclude_key=exclude_key,
                                         to_match=to_match)
    return import_checkpoint(path)


def step_from_path(path: str) -> int:
    m = re.search(r"ckpt_(\d+)", path)
    return int(m.group(1)) if m else 0
