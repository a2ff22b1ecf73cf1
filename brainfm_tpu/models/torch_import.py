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
