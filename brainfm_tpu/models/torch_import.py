"""PyTorch checkpoint importer.

Maps the reference's state dicts (torch NCDHW `nn.Module` trees, e.g.
`backbone.encoders.0.basic_module.SingleConv1.conv.weight`) onto the flax
parameter pytrees of brainfm_tpu models. Replaces the reference's fuzzy
suffix-matching loader (/root/reference/utils/checkpoint.py:409-680) with an
explicit, auditable key table; layout transposes: conv OIDHW -> DHWIO,
linear (out,in) -> (in,out).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv_w(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 4, 1, 0))


def _conv_w_2d(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _lin_w(t):
    return np.transpose(np.asarray(t, np.float32), (1, 0))


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax_params(state: Dict[str, np.ndarray], prefix: str = "backbone.",
                         sep_decoders: bool = False) -> dict:
    """Convert a reference Joiner state dict to flax params for
    models.build.Joiner (UNet3D backbone + TaskHead).

    Handles:
      backbone.encoders.N.basic_module.SingleConvK.{conv,groupnorm}.*
      backbone.decoders*.N.basic_module.SingleConvK.*
      head.final_conv_<name>.{weight,bias}
      head.layers.N.main.*   head.pool_layers / final_linearK_<name>
    """
    params: dict = {}
    # bare-backbone checkpoints (UNet3D state dicts without the Joiner
    # wrapper) carry no 'backbone.' prefix — auto-detect, mirroring the
    # reference's fuzzy key alignment (utils/checkpoint.py:538-680)
    keys = [k[len("module."):] if k.startswith("module.") else k
            for k in state]
    if prefix and not any(k.startswith(prefix) for k in keys) and \
            any(k.startswith(("encoders.", "decoders")) for k in keys):
        prefix = ""
    for key, val in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith(prefix):
            rest = key[len(prefix):]
            m = re.match(
                r"encoders\.(\d+)\.basic_module\.(SingleConv[12])\.(conv|groupnorm)\.(weight|bias)",
                rest)
            if m:
                i, sc, kind, wb = m.groups()
                dest = ["backbone", "encoders", f"encoder{i}", sc]
                if kind == "conv":
                    _set(params, dest + ["conv",
                         "kernel" if wb == "weight" else "bias"],
                         _conv_w(val) if wb == "weight" else np.asarray(val, np.float32))
                else:
                    _set(params, dest + ["groupnorm",
                         "scale" if wb == "weight" else "bias"],
                         np.asarray(val, np.float32))
                continue
            m = re.match(
                r"decoders(_normal|_pathol)?\.(\d+)\.basic_module\.(SingleConv[12])\.(conv|groupnorm)\.(weight|bias)",
                rest)
            if m:
                which, i, sc, kind, wb = m.groups()
                stack = {None: "decoders", "_normal": "decoders_normal",
                         "_pathol": "decoders_pathol"}[which]
                pfx = {None: "decoder", "_normal": "decoder_normal",
                       "_pathol": "decoder_pathol"}[which]
                dest = ["backbone", stack, f"{pfx}{i}", sc]
                if kind == "conv":
                    _set(params, dest + ["conv",
                         "kernel" if wb == "weight" else "bias"],
                         _conv_w(val) if wb == "weight" else np.asarray(val, np.float32))
                else:
                    _set(params, dest + ["groupnorm",
                         "scale" if wb == "weight" else "bias"],
                         np.asarray(val, np.float32))
                continue
        if key.startswith("head."):
            rest = key[len("head."):]
            m = re.match(r"final_conv_(\w+)\.(weight|bias)", rest)
            if m:
                name, wb = m.groups()
                _set(params, ["head", f"final_conv_{name}",
                     "kernel" if wb == "weight" else "bias"],
                     _conv_w(val) if wb == "weight" else np.asarray(val, np.float32))
                continue
            m = re.match(r"layers\.(\d+)\.main\.(weight|bias)", rest)
            if m:
                i, wb = m.groups()
                _set(params, ["head", f"layer{i}", "main",
                     "kernel" if wb == "weight" else "bias"],
                     _conv_w(val) if wb == "weight" else np.asarray(val, np.float32))
                continue
            m = re.match(r"pool_layers\.(\d+)\.main\.(weight|bias)", rest)
            if m:
                i, wb = m.groups()
                conv_idx = {"1": "pool_conv1", "3": "pool_conv2"}.get(i)
                if conv_idx:
                    _set(params, ["head", f"{conv_idx}_age", "main",
                         "kernel" if wb == "weight" else "bias"],
                         _conv_w(val) if wb == "weight" else np.asarray(val, np.float32))
                continue
            m = re.match(r"final_linear(\d)_(\w+)\.(weight|bias)", rest)
            if m:
                i, name, wb = m.groups()
                _set(params, ["head", f"final_linear{i}_{name}",
                     "kernel" if wb == "weight" else "bias"],
                     _lin_w(val) if wb == "weight" else np.asarray(val, np.float32))
                continue
    return params


def import_checkpoint(path: str, sep_decoders: bool = False) -> dict:
    """Load a reference .pth and return flax params {'params': ...}."""
    state = load_torch_state_dict(path)
    return {"params": torch_to_flax_params(state, sep_decoders=sep_decoders)}


# ---------------------------------------------------------------------------
# Fuzzy alignment (parity: align_and_update_state_dicts,
# /root/reference/utils/checkpoint.py:538-680). Operates on flax pytrees
# flattened to dot-joined paths, with the reference's heuristics:
# suffix matching with longest-ckpt-key disambiguation, a `to_match`
# rename table, `exclude_key` filtering (excluded model params keep their
# current values — reference scripts/train.py:182 uses 'supervised_seg'),
# and 2D->3D shape-mismatch handling: a rank-(n-1) checkpoint kernel is
# loaded into the centre depth frame of the rank-n model kernel with all
# other frames zeroed (checkpoint.py:592-617, translated from torch OIDHW
# centre-T to flax DHWIO centre-D).
# ---------------------------------------------------------------------------


def flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        _set(tree, k.split("."), v)
    return tree


def align_params(target: dict, imported: dict, exclude_key: str | None = None,
                 to_match: Dict[str, str] | None = None, to_print: bool = False):
    """Align an imported param pytree onto ``target``'s structure.

    Returns ``(aligned_tree, report)`` where ``aligned_tree`` has exactly
    the keys/shapes of ``target`` (matched keys take the imported values,
    unmatched/excluded keys keep the target's), and ``report`` lists
    ``matched`` (model_key, ckpt_key), ``inflated``, ``skipped_shape``,
    ``unmatched_model`` and ``unmatched_ckpt`` keys.
    """
    to_match = to_match or {}
    tgt = flatten_params(target)
    imp = flatten_params(imported)
    model_keys = sorted(k for k in tgt
                        if exclude_key is None or exclude_key not in k)
    ckpt_keys = sorted(imp)

    def matches(a: str, b: str) -> bool:
        if a == b or a.endswith("." + b):
            return True
        for old, new in to_match.items():
            c = b.replace(old, new)
            if a == c or a.endswith("." + c):
                return True
        return False

    result = dict(tgt)
    matched: Dict[str, str] = {}  # ckpt key -> model key
    report = {"matched": [], "inflated": [], "skipped_shape": [],
              "unmatched_model": [], "unmatched_ckpt": []}
    for mk in model_keys:
        best, best_len = None, 0
        for ck in ckpt_keys:
            if len(ck) > best_len and matches(mk, ck):
                best, best_len = ck, len(ck)
        if best is None:
            continue
        if best in matched:
            raise ValueError(
                f"Cannot match one checkpoint key to multiple keys in the "
                f"model: {best} -> {matched[best]} and {mk}")
        val = np.asarray(imp[best])
        shape = tuple(np.shape(tgt[mk]))
        if shape != val.shape:
            if len(shape) == len(val.shape):
                # same-rank mismatch (different channel widths): skip
                report["skipped_shape"].append((mk, best))
                continue
            if len(shape) == len(val.shape) + 1 and shape[1:] == val.shape:
                # 2D->3D: centre depth frame carries the 2D kernel (cast to
                # the target leaf's dtype like the exact-match branch —
                # a stray fp32 leaf in an fp64/bf16 tree breaks later
                # structure-matched restores)
                tdt = np.asarray(tgt[mk]).dtype
                inflated = np.zeros(shape, tdt)
                inflated[shape[0] // 2] = val.astype(tdt, copy=False)
                result[mk] = inflated
                matched[best] = mk
                report["inflated"].append((mk, best))
                continue
            report["skipped_shape"].append((mk, best))
            continue
        result[mk] = val.astype(np.asarray(tgt[mk]).dtype, copy=False)
        matched[best] = mk
        report["matched"].append((mk, best))
    report["unmatched_model"] = [k for k in model_keys
                                 if k not in set(matched.values())]
    report["unmatched_ckpt"] = [k for k in ckpt_keys if k not in matched]
    if to_print:
        for mk, ck in report["matched"] + report["inflated"]:
            print(f"matched {ck} -> {mk}")
        for k in report["unmatched_model"]:
            print(f"unmatched in model: {k}")
    return _unflatten(result), report


def import_checkpoint_aligned(path: str, target: dict,
                              exclude_key: str | None = None,
                              to_match: Dict[str, str] | None = None) -> dict:
    """import_checkpoint + fuzzy alignment onto a live model's params.

    TPU-native replacement for the reference's
    ``load_checkpoint(..., exclude_key=...)`` path
    (utils/checkpoint.py:409-458): converts the torch state dict, then
    aligns it onto ``target`` so partial/renamed/2D checkpoints load.
    """
    imported = import_checkpoint(path)
    tgt_inner = target.get("params", target)
    imp_inner = imported.get("params", imported)
    aligned, _ = align_params(tgt_inner, imp_inner,
                              exclude_key=exclude_key, to_match=to_match)
    return {"params": aligned}
