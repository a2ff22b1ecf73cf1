"""Model assembly: task wiring, joiner, output processors, postprocessor.

Parity with /root/reference/Trainer/models/__init__.py:37-464 (process_args,
build_model, get_postprocessor) and joiner.py:45-272 (processors, joiners).
The reference's MultiInput* joiners loop over augmented samples in Python;
here samples ride the batch axis and one jitted apply covers them all.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .heads import TaskHead
from .unet3d import UNet2D, UNet3D, UNet3DSep

# (parity: Trainer/models/__init__.py:19-30)
LABELS_LEFT = [0, 1, 2, 3, 4, 7, 8, 9, 10, 14, 15, 17, 31, 34, 36, 38, 40, 42]
LABELS_EXTRACEREBRAL = [0, 11, 12, 13, 16, 31, 32, 33, 34, 35, 36, 37, 38, 39,
                        40, 41, 42, 43, 44, 46,
                        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 14, 15, 17, 47, 49, 51,
                        53, 55,
                        18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 48,
                        50, 52, 54, 56]
N_NEUTRAL_EXTRACEREBRAL = 20


def process_args(cfg):
    """Derive out_channels / output_names / target_names from task toggles
    (parity: Trainer/models/__init__.py:37-125). Mutates and returns cfg."""
    task = cfg.task
    cfg.tasks = [k for k, v in dict(task).items() if v]
    gen = cfg.generator
    if gen.left_hemis_only:
        cfg.label_list_segmentation = LABELS_LEFT
    else:
        cfg.label_list_segmentation = LABELS_EXTRACEREBRAL
    cfg.n_labels = len(cfg.label_list_segmentation)

    unc = cfg.losses.uncertainty if cfg.losses else None
    img_ch = 2 if unc is not None else 1
    out_channels: Dict[str, int] = {}
    output_names, aux_output_names, target_names = [], [], []

    if "contrastive" not in cfg.tasks:
        for t in ("T1", "T2", "FLAIR", "CT"):
            if t in cfg.tasks:
                out_channels[t] = img_ch
                output_names.append(t)
                target_names.append(t)
                if unc is not None:
                    aux_output_names.append(f"{t}_sigma")
        if "bias_field" in cfg.tasks:
            out_channels["bias_field_log"] = img_ch
            output_names.append("bias_field")
            target_names.append("bias_field")
        if "segmentation" in cfg.tasks:
            out_channels["segmentation"] = cfg.n_labels
            output_names.append("label")
            target_names.append("label")
        if "distance" in cfg.tasks:
            n = 2 if gen.left_hemis_only else 4
            out_channels["distance"] = n
            names = ["distance", "lp", "lw"] + ([] if n == 2 else ["rp", "rw"])
            output_names += names
            target_names += names
        if "registration" in cfg.tasks:
            out_channels["registration"] = 3
            output_names += ["registration", "regx", "regy", "regz"]
            target_names += ["registration", "regx", "regy", "regz"]
        if "surface" in cfg.tasks:
            out_channels["surface"] = 8
            output_names.append("surface")
            target_names.append("surface")
        if "super_resolution" in cfg.tasks:
            out_channels["high_res_residual"] = img_ch
            output_names += ["high_res", "high_res_residual"]
            target_names += ["high_res", "high_res_residual"]
        if "pathology" in cfg.tasks:
            out_channels["pathology"] = 1
            output_names.append("pathology")
            target_names.append("pathology")
        if "age" in cfg.tasks:
            out_channels["age"] = -1

    cfg.out_channels = out_channels
    cfg.output_names = output_names
    cfg.aux_output_names = aux_output_names
    cfg.target_names = target_names
    return cfg


class Joiner(nn.Module):
    """Backbone + head; optional conditioning channels concatenated to the
    input (parity: MultiInputIndepJoiner, joiner.py:163-185)."""

    backbone: nn.Module
    head: Any = None

    def __call__(self, x, cond=None):
        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        feats = self.backbone.get_feature(x)
        out = {"feat": feats}
        if self.head is not None:
            out.update(self.head(feats))
        return out


class SepJoiner(nn.Module):
    """Shared encoder, dual decoders + dual heads
    (parity: MultiInputSepDecIndepJoiner, joiner.py:188-210)."""

    backbone: nn.Module
    head_normal: Any = None
    head_pathol: Any = None

    def __call__(self, x, cond=None):
        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        feats = self.backbone.get_feature(x)
        out = {"feat_normal": feats["normal"], "feat_pathology": feats["pathology"]}
        if self.head_normal is not None:
            out.update(self.head_normal(feats["normal"]))
        if self.head_pathol is not None:
            out.update(self.head_pathol(feats["pathology"]))
        return out


def build_backbone(cfg, name: str | None = None, compute_dtype=jnp.float32):
    """(parity: Trainer/models/backbone.py:9-27; num_cond extra channels are
    handled by the caller concatenating inputs — flax convs infer input width).
    cfg.remat rematerializes blocks in the backward pass — required to fit
    the 160^3 f64 training step in 16 GB HBM. Modes: True/'full' recomputes
    whole blocks; 'save_convs' keeps conv outputs and recomputes only the
    HBM-bound norm/activation chain (unet3d._remat_block)."""
    name = name or cfg.backbone
    remat = cfg.get("remat") if hasattr(cfg, "get") else False
    kw = dict(f_maps=int(cfg.f_maps or 64), num_levels=int(cfg.num_levels or 5),
              layer_order=cfg.layer_order or "gcl",
              num_groups=int(cfg.num_groups or 8),
              is_unit_vector=bool(cfg.unit_feat),
              remat=remat if isinstance(remat, str) else bool(remat),
              # level-0 decoder conv rewrite (unet3d._phase_upconv); exact,
              # on by default — `phase_upconv: false` opts out for A/B
              phase_upconv=bool(cfg.get("phase_upconv", True)
                                if hasattr(cfg, "get") else True),
              compute_dtype=compute_dtype)
    if name == "unet3d":
        return UNet3D(**kw)
    if name == "unet3d_sep":
        return UNet3DSep(**kw)
    if name == "unet2d":
        return UNet2D(**kw)
    raise ValueError(f"unknown backbone {name}")


def build_model(cfg, compute_dtype=jnp.float32):
    """Assemble the flax model for cfg (parity: build_model,
    Trainer/models/__init__.py:404-420). Returns (cfg, model)."""
    cfg = process_args(cfg)
    backbone = build_backbone(cfg, compute_dtype=compute_dtype)
    f_maps_list = tuple(cfg.task_f_maps or [64])
    size = tuple(cfg.generator.size)
    if "sep" in (cfg.backbone or "unet3d"):
        out_wo_pathol = {k: v for k, v in cfg.out_channels.items() if k != "pathology"}
        head_n = TaskHead(f_maps_list, out_wo_pathol, size,
                          compute_dtype=compute_dtype)
        head_p = TaskHead(f_maps_list, {"pathology": 1}, size,
                          compute_dtype=compute_dtype)
        return cfg, SepJoiner(backbone, head_n, head_p)
    head = TaskHead(f_maps_list, dict(cfg.out_channels), size,
                    compute_dtype=compute_dtype)
    return cfg, Joiner(backbone, head)


def build_conditioned_model(cfg, compute_dtype=jnp.float32):
    """Mask-conditioned inpainting model (parity: build_conditioned_model,
    Trainer/models/__init__.py:423-437): extra conditioning channels are
    concatenated by the Joiner; the head excludes the pathology output."""
    cfg = process_args(cfg)
    backbone = build_backbone(cfg, compute_dtype=compute_dtype)
    out_wo_pathol = {k: v for k, v in cfg.out_channels.items()
                     if k != "pathology"}
    head = TaskHead(tuple(cfg.task_f_maps or [64]), out_wo_pathol,
                    tuple(cfg.generator.size), compute_dtype=compute_dtype)
    return cfg, Joiner(backbone, head)


def build_inpaint_model(cfg, compute_dtype=jnp.float32):
    """Two-stage inpainting (parity: build_inpaint_model,
    Trainer/models/__init__.py:441-463): stage-0 pathology predictor +
    stage-1 mask-conditioned task model. Returns (cfg, pathol_model,
    task_model)."""
    cfg = process_args(cfg)
    names = (cfg.backbone or "unet3d+unet3d").split("+")
    f_maps_list = tuple(cfg.task_f_maps or [64])
    size = tuple(cfg.generator.size)

    pathol_backbone = build_backbone(cfg, names[0], compute_dtype)
    pathol_head = TaskHead(f_maps_list, {"pathology": 1}, size,
                           compute_dtype=compute_dtype)
    pathol_model = Joiner(pathol_backbone, pathol_head)

    task_backbone = build_backbone(cfg, names[-1], compute_dtype)
    out_wo_pathol = {k: v for k, v in cfg.out_channels.items()
                     if k != "pathology"}
    task_head = TaskHead(f_maps_list, out_wo_pathol, size,
                         compute_dtype=compute_dtype)
    task_model = Joiner(task_backbone, task_head)
    return cfg, pathol_model, task_model


def build_pathol_critic(compute_dtype=jnp.float32, f_maps: int = 64,
                        num_levels: int = 5):
    """Frozen implicit-pathology critic (parity: build_pathol_model,
    joiner.py:33-41 + PatholSeg :90-133): UNet3D f64 L5 + 1-channel
    pathology head, applied to predicted AND target images; gradients flow
    through the images but never into the critic."""
    backbone = UNet3D(f_maps=f_maps, num_levels=num_levels, layer_order="gcl",
                      num_groups=min(8, f_maps), compute_dtype=compute_dtype)
    head = TaskHead((f_maps,), {"pathology": 1}, compute_dtype=compute_dtype)
    return Joiner(backbone, head)


def build_critic_from_cfg(cfg, compute_dtype=jnp.float32, seed: int = 7):
    """Config-driven frozen implicit-pathology critic (parity: PatholSeg
    is built inside get_processors when train_args.losses.implicit_pathol
    is on — joiner.py:90-113, :243 — and runs every training iteration,
    engine.py:115).

    Returns (critic, critic_params, image_key); (None, None, None) when
    the losses.implicit_pathol flag is off. Weights come from
    cfg.supervised_pathol_seg_ckp_path (the reference key; a torch .pth
    imported with fuzzy alignment, or a single path string). When the key
    is unset or the file is absent, a fixed-seed random init is used with
    a loud warning — enough for smoke/tests, NOT a trained critic.
    `image_key` is the image task the critic scores (the reference scores
    the sample's synthesized 'image'; here the first image task present)."""
    losses = cfg.losses if getattr(cfg, "losses", None) else None
    if not (losses and losses.get("implicit_pathol")):
        return None, None, None
    image_key = next((t for t in ("T1", "T2", "FLAIR", "CT")
                      if t in cfg.tasks), None)
    if image_key is None:
        raise ValueError("losses.implicit_pathol requires an image task "
                         "(T1/T2/FLAIR/CT) for the critic to score")
    # reference critic geometry is UNet3D f64 L5 (build_pathol_model,
    # joiner.py:33-41); overridable for tests/smoke runs
    critic = build_pathol_critic(
        compute_dtype=compute_dtype,
        f_maps=int(cfg.get("critic_f_maps") or 64),
        num_levels=int(cfg.get("critic_num_levels") or 5))
    size = tuple(cfg.generator.size)
    x0 = jnp.zeros((1, *size, 1), jnp.float32)
    params = jax.jit(critic.init)(jax.random.PRNGKey(seed), x0)

    ckp = cfg.get("supervised_pathol_seg_ckp_path") if hasattr(cfg, "get") \
        else None
    path, missing = None, []
    if ckp is not None:
        # reference schema: {'feat': ..., 'task': ...} torch checkpoints;
        # our Joiner critic loads both through one fuzzy alignment pass
        paths = [ckp] if isinstance(ckp, str) else \
            [p for p in (ckp.get("feat"), ckp.get("task")) if p]
        path = [p for p in paths if os.path.isfile(str(p))]
        missing = [str(p) for p in paths if not os.path.isfile(str(p))]
    if missing:
        # a PARTIAL checkpoint (e.g. feat present, task path typo'd) would
        # silently leave half the frozen critic random-init — refuse
        raise FileNotFoundError(
            "supervised_pathol_seg_ckp_path: checkpoint file(s) not found: "
            f"{missing} (found: {path or []}). Loading only part of the "
            "frozen critic would train implicit_pathol against a "
            "half-random critic; fix the path(s), or unset "
            "supervised_pathol_seg_ckp_path entirely to intentionally run "
            "a random-init critic (smoke tests)")
    if path:
        from .torch_import import import_checkpoint_aligned

        for p in path:
            params = import_checkpoint_aligned(str(p), params)
    else:
        import warnings

        warnings.warn(
            "implicit_pathol is on but no supervised_pathol_seg_ckp_path "
            "checkpoint was configured — the critic runs with RANDOM "
            "weights (fine for smoke tests, meaningless as supervision)")
    return critic, params, image_key


def implicit_pathol_outputs(critic, critic_params, outputs, targets,
                            image_key: str):
    """Attach implicit_pathol_pred/orig (parity: PatholSeg.forward,
    joiner.py:116-133). critic weights are stop_gradient'ed — backprop
    reaches the main model only through its predicted image."""
    cp = jax.lax.stop_gradient(critic_params)
    out = dict(outputs)
    pred = critic.apply(cp, outputs[image_key])["pathology"]
    orig = critic.apply(cp, targets[image_key])["pathology"]
    out["implicit_pathol_pred"] = jax.nn.sigmoid(pred)
    out["implicit_pathol_orig"] = jax.lax.stop_gradient(jax.nn.sigmoid(orig))
    return out


def twostage_forward(pathol_model, task_model, pathol_params, task_params,
                     x, cfg):
    """Chained two-stage forward (parity: train_one_epoch_twostage,
    Trainer/engine.py:193-318 and evaluate_image_twostage,
    utils/test_utils.py:316-350): stage-0 predicts the pathology mask;
    stage-1 sees the masked input conditioned on the mask."""
    out_p = pathol_model.apply(pathol_params, x)
    pathol = jax.nn.sigmoid(out_p["pathology"])
    masked = x * (1.0 - pathol)
    out_t = task_model.apply(task_params, masked, cond=pathol)
    out = dict(out_t)
    out["pathology"] = pathol
    out["feat_pathol"] = out_p["feat"]
    out["feat_task"] = out_t["feat"]
    return out



# ---------------------------------------------------------------------------
# output processors (parity: joiner.py:45-157, get_processors :238-256)
# ---------------------------------------------------------------------------

def apply_processors(outputs: dict, cfg) -> dict:
    tasks = cfg.tasks
    out = dict(outputs)
    unc = cfg.losses.uncertainty if cfg.losses else None
    if unc is not None:
        for name in ("T1", "T2", "FLAIR", "CT", "high_res_residual"):
            if name in out and out[name].shape[-1] == 2:
                out[f"{name}_sigma"] = out[name][..., 1:2]
                out[name] = out[name][..., 0:1]
    if "contrastive" in tasks and "feat" in out:
        f = out["feat"][-1]
        out["feat"] = list(out["feat"])
        out["feat"][-1] = f / jnp.maximum(
            jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    if "age" in tasks and "age" in out:
        out["age"] = jnp.abs(out["age"])
    if "segmentation" in tasks and "segmentation" in out:
        out["segmentation"] = jnp.asarray(
            nn.softmax(out["segmentation"], axis=-1))
    if "distance" in tasks and "distance" in out:
        m = float(cfg.max_surf_distance or 3.0)
        out["distance"] = jnp.clip(out["distance"], -m, m)
    if "pathology" in tasks and "pathology" in out:
        out["pathology"] = nn.sigmoid(out["pathology"])
    return out


def postprocess(outputs: dict, cfg, samples: dict | None = None,
                target: dict | None = None) -> dict:
    """Final output shaping (parity: get_postprocessor,
    Trainer/models/__init__.py:272-354): distance split + fake-cortical tanh
    render, registration split, bias-field exp, label argmax -> FreeSurfer
    ids, CT rescale, SR residual+input."""
    out = dict(outputs)
    tasks = cfg.tasks
    if "super_resolution" in tasks and samples is not None \
            and "high_res_residual" in out:
        out["high_res"] = out["high_res_residual"] + samples["input"]
    if "bias_field" in tasks and "bias_field_log" in out:
        out["bias_field"] = jnp.exp(out["bias_field_log"])
        del out["bias_field_log"]
    if "distance" in tasks and "distance" in out:
        a = 2.0
        d = out["distance"]
        left_only = bool(cfg.generator.left_hemis_only)
        out["lp"], out["lw"] = d[..., 0:1], d[..., 1:2]
        if left_only:
            fake = (70 * (1 - (jnp.tanh(a * (out["lw"] + 0.3)) + 1) / 2)
                    + 40 * (1 - (jnp.tanh(a * out["lp"]) + 1) / 2))
        else:
            out["rp"], out["rw"] = d[..., 2:3], d[..., 3:4]
            fake_l = (70 * (1 - (jnp.tanh(a * (out["lw"] + 0.3)) + 1) / 2)
                      + 40 * (1 - (jnp.tanh(a * out["lp"]) + 1) / 2))
            fake_r = (70 * (1 - (jnp.tanh(a * (out["rw"] + 0.3)) + 1) / 2)
                      + 40 * (1 - (jnp.tanh(a * out["rp"]) + 1) / 2))
            fake = fake_l + fake_r
        out["fake_cortical"] = fake
        del out["distance"]
    if "registration" in tasks and "registration" in out:
        r = out["registration"]
        out["regx"], out["regy"], out["regz"] = r[..., 0:1], r[..., 1:2], r[..., 2:3]
        del out["registration"]
    if "segmentation" in tasks and "segmentation" in out:
        lab = jnp.asarray(np.asarray(cfg.label_list_segmentation))
        out["label"] = lab[jnp.argmax(out["segmentation"], axis=-1)][..., None]
    if "CT" in tasks and "CT" in out:
        out["CT"] = out["CT"] * 1000.0
    return out
