"""Cascading YAML configuration.

Capability parity with the reference config stack
(/root/reference/utils/config.py:70-122, utils/process_cfg.py:9-68,
utils/misc.py:378-405,611-633): a list of YAML files is merged
left-to-right (later files override earlier ones, recursively), the result
is an attribute-accessible dict, and out-dirs are timestamped per run.

Design departure: no argparse.Namespace trees — a single `AttrDict` type is
used end-to-end, and anything that must cross the jit boundary is converted
to arrays / static hashables explicitly at the call site.
"""

from __future__ import annotations

import copy
import os
import re
import time
from types import SimpleNamespace

import yaml


class AttrDict(dict):
    """dict with attribute access; missing keys read as None."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            return None

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    @staticmethod
    def from_nested(d):
        if isinstance(d, dict):
            return AttrDict({k: AttrDict.from_nested(v) for k, v in d.items()})
        if isinstance(d, list):
            return [AttrDict.from_nested(v) for v in d]
        return d

    def to_plain(self):
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)


_SCI_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


class _SciFloatLoader(yaml.SafeLoader):
    """SafeLoader + implicit float resolver for dot-less scientific
    notation ('1e-4'), which YAML 1.1 parses as str (the reference fixes
    the same quirk with an explicit resolver, utils/config.py:80-90).
    Implicit resolvers fire only on PLAIN (unquoted) scalars, so a quoted
    string like \"1e5\" stays a string — the post-hoc string coercion this
    replaced could not tell the two apart."""


_SciFloatLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _SCI_FLOAT, list("-+0123456789."))


def recursive_update(base: dict, overrides: dict) -> dict:
    """Merge `overrides` into `base` in place, recursing into nested dicts
    (parity: utils/config.py:122)."""
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            recursive_update(base[k], v)
        else:
            base[k] = v
    return base


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=_SciFloatLoader) or {}


def load_config(cfg_files, cfg_dir: str = "") -> AttrDict:
    """Cascade-merge a list of YAML files (parity: utils/process_cfg.py:54-68).

    Entries that are None are skipped. Relative entries are resolved against
    `cfg_dir` if they do not exist as given.
    """
    merged: dict = {}
    for f in cfg_files:
        if f is None or f == "":
            continue
        path = f
        if not os.path.isfile(path) and cfg_dir:
            path = os.path.join(cfg_dir, f)
        if not os.path.isfile(path) and not path.endswith((".yaml", ".yml")):
            path = path + ".yaml"
        recursive_update(merged, load_yaml(path))
    return AttrDict.from_nested(merged)


def preprocess_cfg(cfg_files, cfg_dir: str = "") -> AttrDict:
    """Reference-API-compatible entry (utils/misc.py:378)."""
    return load_config(cfg_files, cfg_dir)


def update_out_dir(cfg: AttrDict, out_root: str = "outs") -> AttrDict:
    """Timestamp the output directory per run (parity: utils/process_cfg.py:9-29).

    Multi-host: every process must compute the SAME directory (orbax
    checkpoint saves are collectives over one path; per-process
    time.strftime can straddle a second boundary and split the run), so
    the timestamp is process-0's, broadcast to all."""
    t = int(time.time())
    try:
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            import numpy as _np

            t = int(multihost_utils.broadcast_one_to_all(
                _np.int64(t)))
    except Exception:
        pass  # no backend yet / single process — local time is fine
    stamp = time.strftime("%Y%m%d-%H%M%S", time.localtime(t))
    job = cfg.job_name or "job"
    exp = cfg.exp_name or "exp"
    cfg.out_dir = os.path.join(out_root, f"{job}-{exp}-{stamp}")
    return cfg


def to_namespace(d):
    """Nested dict -> SimpleNamespace tree, for call sites that want
    reference-style `args.x.y` access (utils/misc.py:611)."""
    if isinstance(d, dict):
        return SimpleNamespace(**{k: to_namespace(v) for k, v in d.items()})
    if isinstance(d, list):
        return [to_namespace(v) for v in d]
    return d
