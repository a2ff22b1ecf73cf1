"""Multi-task criterion.

Parity with the reference SetCriterion / SetMultiCriterion
(/root/reference/Trainer/models/criterion.py:15-364): the same loss
registry, weighting, lesion re-weighting, defacing-mask weighting, and
intra-subject sample averaging. Re-designed as a pure function over stacked
pytrees: the reference loops Python-side over the per-sample outputs list
(criterion.py:345-350); here every output carries a leading sample axis S
and sample averaging is a reduction.

Conventions: outputs[name] has shape (S, D, H, W, C) (channels last);
targets[name] has shape (1, D, H, W, C) and broadcasts; scalars (age) are
(S,) / (1,).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from .losses import (gaussian_loss, gradient_loss, hessian_loss, l1_loss,
                     l2_loss, laplace_loss, smoothness_loss)

_SPATIAL = (1, 2, 3)  # reduce dims for (S, D, H, W, C) per-sample dice sums


def _seg_weights(n_labels: int, label_list_with_csf, relative_weight_lesions: float):
    """(parity: criterion.py:51-56 — lesion label 77 up-weighted through the
    with_csf label list, then normalized)."""
    w = np.ones(n_labels, np.float32)
    lab = np.asarray(label_list_with_csf)
    idx = np.where(lab == 77)[0]
    w[idx[idx < n_labels]] = relative_weight_lesions
    return w / w.sum()


def make_criterion(cfg) -> tuple[list, dict, Callable]:
    """Build (loss_names, weight_dict, loss_fn) from config.

    `cfg` needs: tasks (list), n_labels, label_list_segmentation_with_csf,
    relative_weight_lesions, losses.{uncertainty, image_grad,
    registration_grad, registration_smooth, registration_hessian,
    bias_field_log_type, implicit_pathol}, weights.*, all_samples,
    contrastive temperatures when used.
    (parity: Trainer/models/__init__.py:162-267 get_criterion)
    """
    tasks = list(cfg.tasks)
    losses_cfg = cfg.losses
    weights_cfg = cfg.weights
    uncertainty = losses_cfg.get("uncertainty")
    n_labels = int(cfg.n_labels)
    w_seg = _seg_weights(n_labels, cfg.label_list_segmentation_with_csf,
                         float(cfg.get("relative_weight_lesions", 1.0)))
    w_ce = jnp.asarray(w_seg)          # broadcast over channel-last
    w_dice = jnp.asarray(w_seg)

    if uncertainty == "gaussian":
        reg_loss = gaussian_loss
    elif uncertainty == "laplace":
        reg_loss = laplace_loss
    else:
        reg_loss = None  # plain l1

    bflog_loss = l1_loss if losses_cfg.get("bias_field_log_type") == "l1" else l2_loss

    loss_names: list[str] = []
    weight_dict: Dict[str, float] = {}

    if "contrastive" in tasks:
        loss_names.append("contrastive")
        weight_dict["loss_contrastive"] = float(weights_cfg.contrastive)
    else:
        for t in tasks:
            if t in ("T1", "T2", "FLAIR", "CT"):
                loss_names.append(t)
                weight_dict[f"loss_{t}"] = float(weights_cfg.image)
                if losses_cfg.get("image_grad"):
                    loss_names.append(f"{t}_grad")
                    weight_dict[f"loss_{t}_grad"] = float(weights_cfg.image_grad)
            if t == "segmentation":
                loss_names += ["seg_ce", "seg_dice"]
                weight_dict["loss_seg_ce"] = float(weights_cfg.seg_ce)
                weight_dict["loss_seg_dice"] = float(weights_cfg.seg_dice)
            if t == "bias_field":
                loss_names.append("bias_field_log")
                weight_dict["loss_bias_field_log"] = float(weights_cfg.bias_field_log)
            if t == "super_resolution":
                loss_names.append("SR")
                weight_dict["loss_SR"] = float(weights_cfg.image)
                if losses_cfg.get("image_grad"):
                    loss_names.append("SR_grad")
                    weight_dict["loss_SR_grad"] = float(weights_cfg.image_grad)
            if t == "distance":
                loss_names.append("distance")
                weight_dict["loss_distance"] = float(weights_cfg.distance)
            if t == "registration":
                loss_names.append("registration")
                weight_dict["loss_registration"] = float(weights_cfg.registration)
                if losses_cfg.get("registration_grad"):
                    loss_names.append("registration_grad")
                    weight_dict["loss_registration_grad"] = float(
                        weights_cfg.registration_grad)
                if losses_cfg.get("registration_smooth"):
                    loss_names.append("registration_smooth")
                    weight_dict["loss_registration_smooth"] = float(
                        weights_cfg.registration_smooth)
                if losses_cfg.get("registration_hessian"):
                    loss_names.append("registration_hessian")
                    weight_dict["loss_registration_hessian"] = float(
                        weights_cfg.registration_hessian)
            if t == "age":
                loss_names.append("age")
                weight_dict["loss_age"] = float(weights_cfg.age)
            if t == "pathology":
                loss_names += ["pathol_ce", "pathol_dice"]
                weight_dict["loss_pathol_ce"] = float(weights_cfg.pathol_ce)
                weight_dict["loss_pathol_dice"] = float(weights_cfg.pathol_dice)
            if t == "surface":
                loss_names.append("surface")
                weight_dict["loss_surface"] = float(
                    weights_cfg.get("surface", 1.0))
        if losses_cfg.get("implicit_pathol"):
            # frozen-critic supervision on predicted images
            # (parity: PatholSeg losses, criterion.py:126-173)
            loss_names += ["implicit_pathol_ce", "implicit_pathol_dice"]
            weight_dict["loss_implicit_pathol_ce"] = float(
                weights_cfg.get("implicit_pathol_ce", weights_cfg.pathol_ce))
            weight_dict["loss_implicit_pathol_dice"] = float(
                weights_cfg.get("implicit_pathol_dice",
                                weights_cfg.pathol_dice))

    def image_loss(out, tgt, sigma=None, weights=1.0):
        if sigma is not None and reg_loss is not None:
            return reg_loss(out, sigma, tgt)
        return l1_loss(out, tgt, weights)

    def loss_fn(outputs, targets, samples):
        S = None
        for v in outputs.values():
            if hasattr(v, "shape") and v.ndim >= 1:
                S = v.shape[0]
                break
        losses = {}
        for name in loss_names:
            if name in ("T1", "T2", "FLAIR", "CT"):
                if name not in outputs or name not in targets:
                    continue
                dm = targets.get(f"{name}_DM")
                w = (1.0 - dm) if dm is not None else 1.0
                sig = outputs.get(f"{name}_sigma")
                losses[f"loss_{name}"] = image_loss(outputs[name], targets[name],
                                                    sig, w)
            elif name.endswith("_grad") and name[:-5] in ("T1", "T2", "FLAIR", "CT"):
                base = name[:-5]
                if base not in outputs or base not in targets:
                    continue
                dm = targets.get(f"{base}_DM")
                w = (1.0 - dm) if dm is not None else 1.0
                losses[f"loss_{name}"] = gradient_loss(outputs[base], targets[base], w)
            elif name == "SR":
                losses["loss_SR"] = image_loss(outputs["high_res_residual"],
                                               samples["high_res_residual"])
            elif name == "SR_grad":
                losses["loss_SR_grad"] = gradient_loss(outputs["high_res_residual"],
                                                       samples["high_res_residual"])
            elif name == "seg_ce":
                p = jnp.clip(outputs["segmentation"], 1e-5, None)
                losses["loss_seg_ce"] = jnp.mean(
                    -jnp.sum(jnp.log(p) * w_ce * targets["segmentation"], axis=-1))
            elif name == "seg_dice":
                p, t = outputs["segmentation"], targets["segmentation"]
                inter = jnp.sum(p * t, axis=_SPATIAL)
                union = jnp.clip(jnp.sum(p + t, axis=_SPATIAL), 1e-5, None)
                # sum over (S, labels) then / S  (parity: SetMultiCriterion
                # sample averaging, criterion.py:345-350)
                losses["loss_seg_dice"] = jnp.sum(
                    w_dice * (1.0 - 2.0 * inter / union)) / S
            elif name == "pathol_ce":
                if "pathology" not in outputs or "pathology" not in targets:
                    continue
                p = jnp.clip(outputs["pathology"], 1e-5, None)
                losses["loss_pathol_ce"] = jnp.mean(
                    -jnp.sum(jnp.log(p) * targets["pathology"], axis=-1))
            elif name == "pathol_dice":
                if "pathology" not in outputs or "pathology" not in targets:
                    continue
                p, t = outputs["pathology"], targets["pathology"]
                inter = jnp.sum(p * t, axis=_SPATIAL)
                union = jnp.clip(jnp.sum(p + t, axis=_SPATIAL), 1e-5, None)
                losses["loss_pathol_dice"] = jnp.sum(1.0 - 2.0 * inter / union) / S
            elif name == "implicit_pathol_ce":
                if "implicit_pathol_pred" not in outputs:
                    continue
                p = jnp.clip(outputs["implicit_pathol_pred"], 1e-5, None)
                losses["loss_implicit_pathol_ce"] = jnp.mean(
                    -jnp.sum(jnp.log(p) * outputs["implicit_pathol_orig"],
                             axis=-1))
            elif name == "implicit_pathol_dice":
                if "implicit_pathol_pred" not in outputs:
                    continue
                p = outputs["implicit_pathol_pred"]
                t_ = outputs["implicit_pathol_orig"]
                inter = jnp.sum(p * t_, axis=_SPATIAL)
                union = jnp.clip(jnp.sum(p + t_, axis=_SPATIAL), 1e-5, None)
                losses["loss_implicit_pathol_dice"] = jnp.sum(
                    1.0 - 2.0 * inter / union) / S
            elif name == "distance":
                losses["loss_distance"] = image_loss(outputs["distance"],
                                                     targets["distance"])
            elif name == "registration":
                losses["loss_registration"] = image_loss(outputs["registration"],
                                                         targets["registration"])
            elif name == "registration_grad":
                losses["loss_registration_grad"] = gradient_loss(
                    outputs["registration"], targets["registration"])
            elif name == "registration_smooth":
                losses["loss_registration_smooth"] = smoothness_loss(
                    outputs["registration"])
            elif name == "registration_hessian":
                losses["loss_registration_hessian"] = hessian_loss(
                    outputs["registration"]) / S
            elif name == "bias_field_log":
                if "bias_field_log" not in samples:
                    continue
                mask = 1.0 - targets["segmentation"][..., 0:1]
                losses["loss_bias_field_log"] = bflog_loss(
                    outputs["bias_field_log"] * mask,
                    samples["bias_field_log"] * mask)
            elif name == "surface":
                # L1 on the surface-distance head (parity: loss_surface,
                # criterion.py)
                if "surface" not in outputs or "surface" not in targets:
                    continue
                losses["loss_surface"] = jnp.mean(
                    jnp.abs(outputs["surface"] - targets["surface"]))
            elif name == "age":
                losses["loss_age"] = jnp.mean(jnp.abs(outputs["age"] - targets["age"]))
            elif name == "contrastive":
                # samples ride the leading axis of the last decoder level
                # (reference: outputs[0]['feat'][-1] vs outputs[1]['feat'][-1],
                # criterion.py:96-109)
                flast = outputs["feat"][-1] if isinstance(outputs["feat"],
                                                          (list, tuple)) \
                    else outputs["feat"]
                f1, f2 = flast[0], flast[1]
                ta = float(cfg.contrastive_temperatures.alpha)
                tb = float(cfg.contrastive_temperatures.beta)
                tg = float(cfg.contrastive_temperatures.gamma)
                num = jnp.sum(jnp.exp(f1 * f2 / ta), axis=-1)
                s_all = jnp.sum(f1, axis=-1, keepdims=True)
                den = jnp.sum(jnp.exp(f1 ** 2 / tb)
                              + jnp.exp((f1 * s_all - f1 ** 2) / tg), axis=-1)
                losses["loss_contrastive"] = jnp.mean(-jnp.log(num / den))
        return losses

    return loss_names, weight_dict, loss_fn


def weighted_total(losses: dict, weight_dict: dict):
    """Weighted sum over the losses present (parity: Trainer/engine.py:121)."""
    total = 0.0
    for k, w in weight_dict.items():
        if k in losses:
            total = total + w * losses[k]
    return total
