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


def save_checkpoint(ckpt_dir: str, step: int, state, extra: dict | None = None):
    """Save params/opt_state/step (+ json-able extras) at `ckpt_dir/step`."""
    if jax.process_index() != 0 and jax.process_count() > 1:
        pass  # orbax handles multihost; single-host master-only is implicit
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:06d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if extra:
        import json

        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
    return path


def latest_checkpoint(ckpt_dir: str):
    """(parity: the resume glob of scripts/train.py:176-183)"""
    paths = sorted(glob.glob(os.path.join(ckpt_dir, "ckpt_*")))
    return paths[-1] if paths else None


def load_checkpoint(path: str, abstract_state):
    """Restore into the structure of `abstract_state` (a TrainState-shaped
    pytree of ShapeDtypeStructs or concrete arrays)."""
    ckptr = ocp.StandardCheckpointer()
    target = {"params": abstract_state.params,
              "opt_state": abstract_state.opt_state,
              "step": np.asarray(abstract_state.step)}
    restored = ckptr.restore(os.path.abspath(path), target)
    from .step import TrainState

    return TrainState(restored["params"], restored["opt_state"],
                      restored["step"])


def load_reference_pth(path: str):
    """Import a reference torch checkpoint into flax params
    (see models/torch_import.py)."""
    from ..models.torch_import import import_checkpoint

    return import_checkpoint(path)


def step_from_path(path: str) -> int:
    m = re.search(r"ckpt_(\d+)", path)
    return int(m.group(1)) if m else 0
