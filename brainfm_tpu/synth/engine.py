"""The synthesis engine: one jitted function per training item.

Re-expresses the reference's Dataset `__getitem__` pipelines
(/root/reference/Generator/datasets.py:638-681 `BaseGen`, :700-757
`BrainIDGen`) as pure functions: `synth_item(key, subject, ...)` produces
the (target, samples) pair for one subject with `all_samples` intra-subject
augmentations, entirely on device. Subjects are fixed-shape resident
arrays (SubjectBank) — no dynamic crops, no host round-trips.

Array conventions: subject volumes live in the subject frame (padded to the
bank shape, true extent in subject['shape']); targets/samples are generated
at cfg.size, channels-last.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_lut import lut_apply
from ..ops.warp_auto import warp_labels, warp_volume
from .augment import augment_chain
from .constants import (LABELS_EXTRACEREBRAL, LABELS_LEFT, build_lut,
                        build_vflip)
from .deform import deform_grid, random_affine, random_nonlinear_field
from .gmm import sample_contrast_lut
from .params import SynthStatic, sample_setup
from .pathology import (augment_pathology, binarize, encode_pathology,
                        random_shape)


def _flip0(x, flip):
    """Traced sagittal flip of a (D,H,W[,C]) volume (axis 0)."""
    return jnp.where(flip > 0, jnp.flip(x, axis=0), x)


@lru_cache(maxsize=None)
def _label_tables(left: bool):
    """Shared trace-time (labels, lut, vflip) tables for a hemisphere mode
    — one construction per mode instead of one per call site."""
    labels = LABELS_LEFT if left else LABELS_EXTRACEREBRAL
    return labels, build_lut(labels), build_vflip(len(labels))



def _hemis_mask_src(subject, cfg, lut):
    """Source-space left-hemisphere mask (parity: get_left_hemis_mask,
    datasets.py:251-262): compact segmentation > 0 AND MNI x-coordinate
    < 0. Computed ONCE per item and applied in SOURCE space before
    warping — exactly where the reference masks the source crop
    (read_and_deform, utils.py:310-311 and generate_sample
    datasets.py:367-368)."""
    if not cfg.left_hemis_only:
        return None
    if "seg" not in subject or "reg" not in subject:
        # the reference crashes here too (get_left_hemis_mask reads the
        # registration volume unconditionally); proceeding without the
        # mask would silently train background over visible right-
        # hemisphere tissue
        raise ValueError(
            "left_hemis_only requires every subject to carry 'seg' and "
            f"'reg' volumes; got keys {sorted(subject)}")
    s = lut_apply(lut, jnp.clip(subject["seg"].astype(jnp.int32),
                                0, lut.shape[0] - 1))
    return ((s > 0) & (subject["reg"][..., 0] < 0)).astype(jnp.int32)


def _target_segmentation(seg, grid, flip, lut, vflip, cfg, hemis_mask=None,
                         deform_one_hots=False):
    """(parity: read_and_deform_segmentation, utils.py:394-424)

    TPU design: the LUT commutes with nearest-neighbour warping, so the
    raw labels are LUT-compacted FIRST (gather-free table lookup,
    ops/pallas_lut.py) and the nearest warp runs on the compact index
    volume via bf16 indicator-weight matmuls — bit-identical output
    (ops/warp_auto.warp_labels), with the sagittal flip applied in label
    space before the one-hot."""
    s = seg.astype(jnp.int32)
    if hemis_mask is not None:
        s = jnp.where(hemis_mask == 0, 0, s)
    if deform_one_hots:
        onehot = jax.nn.one_hot(lut[jnp.clip(s, 0, lut.shape[0] - 1)],
                                int(vflip.shape[0]), dtype=jnp.float32)
        sd = warp_volume(onehot, grid, cfg, approx=cfg.approx_warp)
        flipped = jnp.flip(sd, axis=0)[..., vflip]
        return jnp.where(flip > 0, flipped, sd)
    sc = lut_apply(lut, jnp.clip(s, 0, lut.shape[0] - 1))
    scd = warp_labels(sc, grid, cfg)
    # flip in LABEL space before the one-hot: flip(onehot(l))[..., vflip]
    # == onehot(vflip[flip(l)]) (vflip is the half-swap involution, so it
    # is its own inverse) — avoids three passes over the (size, n_labels)
    # one-hot tensor
    lab = jnp.where(flip > 0, lut_apply(vflip, jnp.flip(scd, axis=0)),
                    scd)
    return jax.nn.one_hot(lab, int(vflip.shape[0]), dtype=jnp.float32)



def _target_pathology(key, subject, grid, setup, cfg):
    """(parity: read_and_deform_pathology, utils.py:428-455 + the
    healthy-case routing of datasets.py:596-618). Returns (P, Pprob),
    each (*size, 1); zeroed when pathol_mode is off or mass below tol."""
    size = grid[0].shape

    def _on(key):
        # full shape synthesis + advection, only when pathol_mode drew on:
        # synth_item call sites are unbatched, so this `cond` is a real
        # branch and pathology-off items skip the Perlin + ODE cost
        # entirely (the reference skips it by passing file_name=None,
        # utils.py:433-434)
        k1, k2 = jax.random.split(key)
        use_random = setup["pathol_random_shape"] > 0
        if "pathol_prob" in subject:
            pfile = warp_volume(jnp.nan_to_num(subject["pathol_prob"]),
                                grid, cfg, approx=cfg.approx_warp)
        else:
            pfile = jnp.zeros(size)
            use_random = jnp.ones(()) > 0  # only the random branch exists
        prand, _ = random_shape(k1, size, cfg)
        pdef = jnp.where(use_random, prand, pfile)
        if cfg.augment_pathology:
            # the reference advects BOTH branches — random shapes and
            # real lesion files alike (utils.py:441-442)
            pdef = augment_pathology(k2, pdef, cfg)
        return pdef

    pdef = jax.lax.cond(setup["pathol_mode"] > 0, _on,
                        lambda _k: jnp.zeros(size), key)

    p = binarize(pdef, cfg.pathol_thres)
    alive = (setup["pathol_mode"] > 0) & (jnp.mean(p) > cfg.pathol_tol)
    p = jnp.where(alive, p, 0.0)
    pdef = jnp.where(alive, pdef, 0.0)
    return p[..., None], pdef[..., None]


def make_targets(key, subject, grid, setup, sfd, cfg, tasks, extra=None,
                 hemis_mask=None):
    """Deform every requested target (parity: datasets.py:716-724 loop).

    TPU design: all trilinear targets are stacked channel-wise into ONE
    fused warp (per-channel out-of-bounds defaults) that rides the
    gather-free Pallas block kernel — 197 ms for the 10-channel wall vs
    824 ms as XLA gathers (ops/warp_auto.py routing). Per-target
    scaling/flip semantics are applied before/after exactly as in the
    reference processors (Generator/utils.py:324-471)."""
    flip = setup["flip"]
    left = cfg.left_hemis_only
    _, lut_np, vflip_np = _label_tables(left)
    lut, vflip = jnp.asarray(lut_np), jnp.asarray(vflip_np)

    if hemis_mask is None:
        hemis_mask = _hemis_mask_src(subject, cfg, lut)

    def hmask(v):
        return jnp.where(hemis_mask == 0, 0.0, v) if hemis_mask is not None \
            else v

    # ---- assemble the channel stack: (name, prepared volume, oob default)
    stack, defaults, spans = [], [], {}
    n_dist = 2 if left else 4

    def push(name, vol, default):
        spans[name] = (len(stack), len(stack) + 1)
        stack.append(vol)
        defaults.append(default)

    # the reference masks EVERY target's source crop, including defacing
    # masks, distance and registration (read_and_deform mask arg,
    # utils.py:310-311; the max default is taken AFTER masking :313-315)
    # real-contrast mixing (mix_synth_prob) draws on the deformed
    # T1/T2/FLAIR even when they are not requested TASKS — the reference
    # deforms them unconditionally before mixing (datasets.py:688-691,
    # :379-388); mix-only contrasts are popped from the returned targets
    # by the caller (synth_item) so they never reach the criterion
    mix_aux = extra is not None and cfg.mix_synth_prob > 0
    for t in ("T1", "T2", "FLAIR"):
        if (t in tasks or mix_aux) and t in subject:
            push(t, hmask(jnp.nan_to_num(subject[t])), 0.0)
            dm = subject.get(f"{t}_DM")
            if dm is not None and t in tasks:
                push(f"{t}_DM", hmask(jnp.nan_to_num(dm)), 0.0)
    if "CT" in tasks and "CT" in subject:
        push("CT", hmask(jnp.nan_to_num(subject["CT"]) / 1000.0), 0.0)
        dm = subject.get("CT_DM")
        if dm is not None:  # parity: read_and_deform_CT, utils.py:353-358
            push("CT_DM", hmask(jnp.nan_to_num(dm)), 0.0)
    if "distance" in tasks and "dist" in subject:
        first = len(stack)
        for c in range(n_dist):
            v = hmask((jnp.nan_to_num(subject["dist"][..., c]) - 128.0)
                      / 20.0)
            stack.append(v)
            defaults.append(jnp.max(v))
        spans["dist"] = (first, len(stack))
    if "registration" in tasks and "reg" in subject:
        first = len(stack)
        for c in range(3):
            stack.append(hmask(jnp.nan_to_num(subject["reg"][..., c])
                               / 10000.0))
            defaults.append(0.0)
        spans["reg"] = (first, len(stack))

    warped = {}
    extra_warped = None
    n_extra = 0 if extra is None else extra.shape[-1]
    if stack or n_extra:
        big = jnp.stack(stack, axis=-1) if stack else None
        if n_extra:
            big = extra if big is None else \
                jnp.concatenate([big, extra], axis=-1)
        dvec = jnp.concatenate(
            [jnp.stack([jnp.asarray(d, jnp.float32) for d in defaults])
             if defaults else jnp.zeros((0,)), jnp.zeros((n_extra,))])
        wall = warp_volume(big, grid, cfg, default=dvec,
                           approx=cfg.approx_warp
                           and cfg.approx_warp_targets)
        warped = {n: wall[..., a:b] for n, (a, b) in spans.items()}
        if n_extra:
            extra_warped = wall[..., len(stack):]

    target = {}
    for t in ("T1", "T2", "FLAIR"):
        if t in warped:
            idef = warped[t][..., 0]
            idef = idef - jnp.min(idef)
            idef = idef / jnp.maximum(jnp.max(idef), 1e-12)
            target[t] = _flip0(idef, flip)[..., None]
            if f"{t}_DM" in warped:
                d = jnp.clip(warped[f"{t}_DM"][..., 0], 0.0, None)
                d = d / jnp.maximum(jnp.max(d), 1e-12)
                target[f"{t}_DM"] = _flip0(d, flip)[..., None]
    if "CT" in warped:
        target["CT"] = _flip0(warped["CT"][..., 0], flip)[..., None]
        if "CT_DM" in warped:
            d = jnp.clip(warped["CT_DM"][..., 0], 0.0, None)
            d = d / jnp.maximum(jnp.max(d), 1e-12)
            target["CT_DM"] = _flip0(d, flip)[..., None]
    if "segmentation" in tasks and "seg" in subject:
        target["segmentation"] = _target_segmentation(
            subject["seg"], grid, flip, lut, vflip, cfg, hemis_mask,
            cfg.deform_one_hots)
    if "dist" in warped:
        chans = [warped["dist"][..., c] for c in range(n_dist)]
        if not left:
            lp, lw, rp, rw = chans
            lp2 = jnp.where(flip > 0, jnp.flip(rp, 0), lp)
            rp2 = jnp.where(flip > 0, jnp.flip(lp, 0), rp)
            lw2 = jnp.where(flip > 0, jnp.flip(rw, 0), lw)
            rw2 = jnp.where(flip > 0, jnp.flip(lw, 0), rw)
            out = jnp.stack([lp2, lw2, rp2, rw2], axis=-1)
        else:
            out = jnp.stack(chans, axis=-1)
        target["distance"] = jnp.clip(out / sfd, -cfg.max_surf_distance,
                                      cfg.max_surf_distance)
    if "reg" in warped:
        rx0, ry0, rz0 = (warped["reg"][..., c] for c in range(3))
        rx = jnp.where(flip > 0, -jnp.flip(rx0, 0), rx0)
        ry = jnp.where(flip > 0, jnp.flip(ry0, 0), ry0)
        rz = jnp.where(flip > 0, jnp.flip(rz0, 0), rz0)
        target["registration"] = jnp.stack([rx, ry, rz], axis=-1)
    if "pathology" in tasks:
        p, pprob = _target_pathology(key, subject, grid, setup, cfg)
        target["pathology"] = p
        target["pathology_prob"] = pprob
    if "age" in tasks and "age" in subject:
        target["age"] = subject["age"]
    return target, extra_warped


def _finish_sample(key, idef, cfg, setup, knobs, tasks, target,
                   pathol_direction, input_mode):
    """Pathology encode + augmentation chain + restore + normalize + flip
    (parity: augment_sample, datasets.py:306-354)."""
    k1, k2 = jax.random.split(key)
    if input_mode == "CT":
        idef = jnp.clip(idef, 0.0, 80.0)
    if "pathology" in tasks:
        p = target["pathology"][..., 0]
        pprob = target["pathology_prob"][..., 0]
        enc = encode_pathology(k1, idef, p, pprob, pathol_direction)
        idef = jnp.where(jnp.sum(p) > 0, jnp.maximum(enc, 0.0), idef)

    steps = cfg.aug_steps_synth if input_mode == "synth" \
        else cfg.aug_steps_real
    restored, aux = augment_chain(k2, idef, cfg, setup, knobs, steps=steps,
                                  is_ct=(input_mode == "CT"))
    maxi = jnp.maximum(jnp.max(restored), 1e-12)
    final = restored / maxi

    flip = setup["flip"]
    sample = {"input": _flip0(final, flip)[..., None]}
    if "super_resolution" in tasks and "high_res" in aux:
        sr = aux["high_res"] / maxi - final
        sample["high_res_residual"] = _flip0(sr, flip)[..., None]
    if "bias_field" in tasks and input_mode != "CT" and "BFlog" in aux:
        sample["bias_field_log"] = _flip0(aux["BFlog"], flip)[..., None]
    return sample


def _synth_volumes(key, subject, cfg, setup, tasks, hemis_mask=None):
    """All S synthetic contrasts, subject-frame, channel-stacked (re-design
    of generate_sample, datasets.py:357-376): the S intra-subject samples
    share the deformation grid, so their synthesized volumes — plus the
    cerebral-masked copies the pathology keep-mask needs — join the target
    channel stack and ride ONE fused gather (make_targets `extra`); index
    handling dominates the gather's cost on TPU.

    Returns (chans (D,H,W,S or 2S), pathol_dir (S,))."""
    S = cfg.all_samples
    gen = subject["gen"]
    kl, kn = jax.random.split(key)
    luts = [sample_contrast_lut(jax.random.fold_in(kl, i), cfg.ct_prob,
                                setup["photo_mode"]) for i in range(S)]
    mus = jnp.stack([m for m, _ in luts], axis=-1)      # (256, S)
    sigmas = jnp.stack([s for _, s in luts], axis=-1)   # (256, S)

    g = jnp.where(gen == 77, 2, gen)
    if hemis_mask is not None:
        # parity: G[hemis_mask == 0] = 0, datasets.py:367-368 — without it
        # the synthesized INPUT renders both hemispheres while every
        # target is left-masked, and wm/gm means + the pathology
        # keep-mask include right-hemisphere voxels
        g = jnp.where(hemis_mask == 0, 0, g)
    gr = jnp.clip(jnp.round(g).astype(jnp.int32), 0, 255)
    noise = jax.random.normal(kn, (*gr.shape, S))
    # one fused gather-free table lookup for all 2S columns
    # (ops/pallas_lut.py; XLA's mus[gr] gather costs 24.7 ms at 192^3)
    ms = lut_apply(jnp.concatenate([mus, sigmas], axis=1), gr)  # (...,2S)
    syn_subj = jnp.maximum(ms[..., :S] + ms[..., S:] * noise, 0.0)

    # pathology direction from tissue contrast (datasets.py:390-409)
    wm = ((gr == 2) | (gr == 41))[..., None]
    gm = ((gr != 0)[..., None]) & ~wm
    wm_mean = jnp.sum(syn_subj * wm, axis=(0, 1, 2)) / \
        jnp.maximum(jnp.sum(wm), 1)
    gm_mean = jnp.sum(syn_subj * gm, axis=(0, 1, 2)) / \
        jnp.maximum(jnp.sum(gm), 1)
    pathol_dir = (gm_mean > wm_mean).astype(jnp.float32)  # (S,)

    chans = syn_subj
    if "pathology" in tasks:
        masked = jnp.where((gr == 0)[..., None], 0.0, syn_subj)
        chans = jnp.concatenate([chans, masked], axis=-1)
    return chans, pathol_dir


def _split_synth_warped(warped, S, tasks):
    """Split the warped synth channels back into per-sample volumes +
    pathology keep-masks."""
    syn_w = [warped[..., i] for i in range(S)]
    keep = [(warped[..., S + i] != 0).astype(jnp.float32)[..., None]
            for i in range(S)] if "pathology" in tasks else None
    return syn_w, keep


def _synth_sample(key, syn, keep_i, pathol_dir_i, subject, cfg, setup, knobs,
                  tasks, target):
    """Per-sample tail of generate_sample (datasets.py:379-412): mix with
    real contrasts, pathology keep-mask, encode+augment."""
    k3, k4, k5 = jax.random.split(key, 3)

    # random linear mix with real contrasts (datasets.py:379-388); weights
    # are zeroed for unavailable contrasts and renormalized over the ones
    # actually mixed, so the blend stays unit-sum (the reference assumes
    # T1/T2/FLAIR targets exist and would crash otherwise)
    if cfg.mix_synth_prob > 0:
        mix = jax.random.uniform(k3) < cfg.mix_synth_prob
        v = jax.random.uniform(k4, (4,))
        for i, t in enumerate(("T1", "T2", "FLAIR"), start=1):
            if t not in subject or t not in target:
                v = v.at[i].set(0.0)
        v = v / jnp.sum(v)
        mixed = v[0] * syn
        # targets are flipped when setup.flip — unflip for mixing consistency
        for i, t in enumerate(("T1", "T2", "FLAIR"), start=1):
            if t in target:
                mixed = mixed + v[i] * _flip0(target[t][..., 0], setup["flip"])
        syn = jnp.where(mix, mixed, syn)

    if "pathology" in tasks:
        target["pathology"] = target["pathology"] * keep_i
        target["pathology_prob"] = target["pathology_prob"] * keep_i

    syn = jnp.maximum(syn, 0.0)
    return _finish_sample(k5, syn, cfg, setup, knobs, tasks, target,
                          pathol_dir_i, "synth"), target


def _real_sample(key, idef, cfg, setup, knobs, tasks, target, input_mode):
    """One real-image sample (parity: augment_sample on a file image,
    datasets.py:306-317). `idef` is the deformed image, warped ONCE by the
    caller — all S intra-subject samples share the grid, and the Pallas
    warp is an opaque custom call XLA's CSE cannot merge, so warping
    inside the per-sample loop would cost S-1 redundant full-volume
    warps."""
    k1, k2 = jax.random.split(key)
    if input_mode in ("T1", "CT"):
        pathol_dir = jnp.zeros(())
    elif input_mode in ("T2", "FLAIR"):
        pathol_dir = jnp.ones(())
    else:
        pathol_dir = (jax.random.uniform(k1) < 0.5).astype(jnp.float32)
    return _finish_sample(k2, idef, cfg, setup, knobs, tasks, target,
                          pathol_dir, input_mode)


@partial(jax.jit, static_argnames=("cfg", "tasks", "input_mode",
                                   "subject_keys"))
def _synth_item_impl(key, subject_vals, subject_keys, cfg: SynthStatic,
                     tasks: tuple, input_mode: str, knobs_stack):
    subject = dict(zip(subject_keys, subject_vals))
    k_setup, k_field, k_aff, k_tgt, k_samp = jax.random.split(key, 5)
    setup = sample_setup(k_setup, cfg)
    shp = subject["shape"]
    sfd, A, c2 = random_affine(k_aff, cfg, shp)
    F = Fneg = None
    if cfg.nonlinear_transform:
        F, Fneg = random_nonlinear_field(k_field, cfg, setup,
                                         need_inverse=("surface" in tasks))
    grid = deform_grid(cfg, shp, A, c2, F)

    S = cfg.all_samples
    _, lut_np, _ = _label_tables(cfg.left_hemis_only)
    hemis_mask = _hemis_mask_src(subject, cfg, jnp.asarray(lut_np))
    extra = None
    if input_mode == "synth":
        k_syn = jax.random.fold_in(k_samp, 10_000)
        extra, pathol_dir = _synth_volumes(k_syn, subject, cfg, setup, tasks,
                                           hemis_mask)

    target, extra_warped = make_targets(
        k_tgt, subject, grid, setup, sfd, cfg, tasks, extra=extra,
        hemis_mask=hemis_mask)

    samples = []
    if input_mode == "synth":
        syn_w, keep = _split_synth_warped(extra_warped, S, tasks)
    else:
        # warp the real image ONCE (shared grid; see _real_sample)
        v = jnp.nan_to_num(subject["image"])
        if hemis_mask is not None:
            v = jnp.where(hemis_mask == 0, 0.0, v)
        idef_real = warp_volume(v, grid, cfg, approx=cfg.approx_warp)
    for i in range(S):
        ki = jax.random.fold_in(k_samp, i)
        knobs = jax.tree.map(lambda a: a[i], knobs_stack)
        if input_mode == "synth":
            sample, target = _synth_sample(
                ki, syn_w[i], keep[i] if keep else None, pathol_dir[i],
                subject, cfg, setup, knobs, tasks, target)
        else:
            sample = _real_sample(ki, idef_real, cfg, setup, knobs, tasks,
                                  target, input_mode)
        samples.append(sample)

    # surface-task deformation state for the host-side mesh warp
    # (parity: read_and_deform_surface needs the inverse affine + negative
    # SVF of THIS item's deformation, Generator/utils.py:479-534; consumed
    # by synth.surface.deform_surfaces)
    if "surface" in tasks:
        # nonlinear_transform off: the affine+flip mesh transform is still
        # well-defined — emit a zero SVF instead of silently dropping the
        # whole surface state (the reference would crash here: its
        # read_and_deform_surface interpolates Fneg unconditionally)
        target["surface_svf_neg"] = Fneg if Fneg is not None else \
            jnp.zeros((*cfg.size, 3), jnp.float32)
        target["surface_affine_A"] = A
        target["surface_affine_c2"] = c2
        target["surface_flip"] = setup["flip"]

    # drop mix-only contrasts (deformed for the real-contrast blend but
    # not requested tasks — see make_targets) so they never reach the
    # criterion or pad the batch
    for t in ("T1", "T2", "FLAIR"):
        if t not in tasks:
            target.pop(t, None)

    # flip pathology targets at the very end (datasets.py:752-753)
    if "pathology" in target:
        target["pathology"] = _flip0(target["pathology"], setup["flip"])
        target["pathology_prob"] = _flip0(target["pathology_prob"],
                                          setup["flip"])

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *samples)
    return target, stacked


def synth_item(key, subject: dict, cfg: SynthStatic, tasks: Sequence[str],
               input_mode: str, knobs_stack):
    """Generate one training item: (target dict, samples dict stacked on a
    leading S axis). `input_mode` in {'synth','T1','T2','FLAIR','CT'};
    knobs_stack leaves have leading dim cfg.all_samples."""
    keys = tuple(sorted(subject.keys()))
    vals = tuple(subject[k] for k in keys)
    return _synth_item_impl(key, vals, keys, cfg, tuple(tasks), input_mode,
                            knobs_stack)


# ---------------------------------------------------------------------------
# host-side subject bank
# ---------------------------------------------------------------------------

MILD_KNOBS = dict(gamma_std=0.01, bf_scale_min=0.01, bf_scale_max=0.02,
                  bf_std_min=0.0, bf_std_max=0.02, noise_std_min=0.0,
                  noise_std_max=0.02)
SEVERE_KNOBS = dict(gamma_std=0.1, bf_scale_min=0.02, bf_scale_max=0.04,
                    bf_std_min=0.1, bf_std_max=0.6, noise_std_min=0.05,
                    noise_std_max=1.0)
SYNTH_NOISE = dict(noise_std_min=5.0, noise_std_max=15.0)
REAL_NOISE = dict(noise_std_min=0.0, noise_std_max=0.02)


def build_knobs_stack(cfg: SynthStatic, input_mode: str,
                      mild=None, severe=None, noise=None):
    """Per-sample augmentation strengths (parity: BrainIDGen's
    update_gen_args dance, datasets.py:728-748: mild/severe by sample index,
    then the synth/real noise override)."""
    mild = dict(MILD_KNOBS, **(mild or {}))
    severe = dict(SEVERE_KNOBS, **(severe or {}))
    noise = dict(SYNTH_NOISE if input_mode == "synth" else REAL_NOISE,
                 **(noise or {}))
    rows = []
    for i in range(cfg.all_samples):
        row = dict(mild if i < cfg.mild_samples else severe)
        row.update(noise)
        rows.append(row)
    return {k: jnp.asarray([r[k] for r in rows], jnp.float32)
            for k in rows[0]}


def knobs_from_cfg(cfg_tree, scfg: SynthStatic, input_mode: str):
    """Knob rows from the config tree's mild_generator / severe_generator /
    synth_image_generator / real_image_generator blocks (parity: the
    update_gen_args swaps of BrainIDGen, datasets.py:697-748 — the blocks
    become traced knob rows instead of config mutation). Unknown keys
    (e.g. the reference's unused bag_*) are ignored; missing blocks fall
    back to the baked defaults."""
    known = set(MILD_KNOBS) | set(SYNTH_NOISE)

    def blk(name):
        b = cfg_tree.get(name) if hasattr(cfg_tree, "get") else None
        if not b or not hasattr(b, "items"):
            return {}
        return {k: float(v) for k, v in dict(b).items() if k in known}

    noise_name = ("synth_image_generator" if input_mode == "synth"
                  else "real_image_generator")
    return build_knobs_stack(scfg, input_mode, mild=blk("mild_generator"),
                             severe=blk("severe_generator"),
                             noise=blk(noise_name))


class SubjectBank:
    """Host-side resident subject store.

    Replaces the reference's per-item nibabel reads + DataLoader workers
    (Generator/datasets.py:563-589): subjects are decoded once (our NIfTI
    reader), padded to a fixed bank shape, and shipped to device, where the
    jitted synthesis reads them directly. Also provides procedurally
    generated debug subjects so the full pipeline runs without data.
    """

    def __init__(self, bank_shape=(192, 192, 192)):
        self.bank_shape = tuple(bank_shape)
        self.subjects = []

    @staticmethod
    def _pad(vol, shape):
        out = np.zeros(shape + vol.shape[3:], vol.dtype)
        sl = tuple(slice(0, min(s, t)) for s, t in zip(vol.shape[:3], shape))
        out[sl] = vol[tuple(sl)]
        return out

    def add_many(self, subject_paths, ages=None):
        """Batch ingest: decode EVERY volume of every subject in one
        parallel native-codec pass, then assemble the subjects.

        This is the routed ingest for the C++ runtime codec
        (runtime/volcodec.cpp + loader.VolCodec) — the TPU-native
        replacement for the reference's per-item nibabel reads under
        DataLoader workers (Generator/datasets.py:563-589 +
        scripts/train.py:133-137 num_workers): all files across all
        subjects inflate/parse/transpose on a host thread pool in one
        call instead of serializing per file. Falls back to the Python
        reader per file when the native library is unavailable or a file
        isn't plain 3-D NIfTI. Bit-identical to repeated `add_from_files`
        (tests/test_runtime_codec.py::test_bank_ingest_native_parity).

        subject_paths: list of dicts like add_from_files' `paths`;
        ages: optional list aligned with subject_paths.
        Returns the list of new subject indices."""
        from ..runtime.loader import VolCodec

        jobs = []  # (subject_idx, key, channel_idx|None, path)
        for si, paths in enumerate(subject_paths):
            for key, p in paths.items():
                if key in ("dist", "reg"):
                    for ci, q in enumerate(p):
                        jobs.append((si, key, ci, str(q)))
                else:
                    jobs.append((si, key, None, str(p)))
        codec = VolCodec(self.bank_shape)
        arena, shapes, extras = codec.decode_batch_with_shapes(
            [j[3] for j in jobs])

        built = [dict() for _ in subject_paths]
        shape_of = [None] * len(subject_paths)
        for row, (si, key, ci, path) in enumerate(jobs):
            shp = shapes[row]
            if shape_of[si] is None:
                shape_of[si] = shp
            elif tuple(shp) != tuple(shape_of[si]):
                raise ValueError(
                    f"subject volumes disagree on shape: {key} is "
                    f"{shp}, expected {shape_of[si]} — all of a "
                    "subject's volumes must share one native grid")
            if row in extras:  # >3-D file: trailing dims preserved
                vol = self._pad(extras[row], self.bank_shape)
            else:
                vol = arena[row]
            if key in ("gen", "seg"):
                vol = vol.astype(np.int32)
            elif ci is None and row not in extras:
                # copy the row OUT of the decode arena: storing the view
                # would pin the whole (n_jobs, *bank_shape) arena for the
                # bank's lifetime (~2x steady-state RAM at real-dataset
                # scale); dist/reg channel views are copied by np.stack
                # below
                vol = vol.copy()
            if ci is None:
                built[si][key] = vol
            else:
                built[si].setdefault(key, {})[ci] = vol
        out = []
        for si, (b, paths) in enumerate(zip(built, subject_paths)):
            subj = {}
            for key in paths:  # preserve add_from_files' key order
                v = b[key]
                if key in ("dist", "reg"):
                    subj[key] = np.stack([v[c] for c in sorted(v)], axis=-1)
                else:
                    subj[key] = v
            subj["shape"] = np.asarray(
                [min(s, bs) for s, bs in zip(shape_of[si], self.bank_shape)],
                np.float32)
            age = ages[si] if ages is not None else None
            if age is not None:
                subj["age"] = np.float32(age)
            self.subjects.append(subj)
            out.append(len(self.subjects) - 1)
        return out

    def add_from_files(self, paths: dict, age=None):
        """paths: {'gen': ..., 'seg': ..., 'T1': ..., 'dist': [4 paths],
        'reg': [3 paths], ...} mapping to NIfTI files."""
        from ..utils.nifti import load_nifti

        subj = {}
        shape = None
        for key, p in paths.items():
            if key in ("dist", "reg"):
                chans = [load_nifti(q)[0] for q in p]
                vol = np.stack(chans, axis=-1).astype(np.float32)
            else:
                vol, _ = load_nifti(p)
                vol = vol.astype(np.int32 if key in ("gen", "seg")
                                 else np.float32)
                # trailing singleton frames are a 3-D volume; squeeze so
                # the rank matches the native-codec ingest (add_many),
                # which treats nframes=1 as 3-D (volcodec.cpp)
                while vol.ndim > 3 and vol.shape[-1] == 1:
                    vol = vol[..., 0]
            if shape is None:
                shape = vol.shape[:3]
            elif tuple(vol.shape[:3]) != tuple(shape):
                raise ValueError(
                    f"subject volumes disagree on shape: {key} is "
                    f"{vol.shape[:3]}, expected {shape} — all of a "
                    "subject's volumes must share one native grid")
            subj[key] = self._pad(vol, self.bank_shape)
        # effective extent = what the bank actually stores: a volume larger
        # than bank_shape is cropped by _pad, and recording the full native
        # extent would let deform_grid sample the zero padding
        subj["shape"] = np.asarray(
            [min(s, b) for s, b in zip(shape, self.bank_shape)], np.float32)
        if age is not None:
            subj["age"] = np.float32(age)
        self.subjects.append(subj)
        return len(self.subjects) - 1

    def add_debug_subject(self, seed=0, extent=(160, 160, 160)):
        """Procedural label-blob subject for tests/benchmarks."""
        rng = np.random.default_rng(seed)
        D, H, W = extent
        zz, yy, xx = np.meshgrid(np.linspace(-1, 1, D), np.linspace(-1, 1, H),
                                 np.linspace(-1, 1, W), indexing="ij")
        r = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)
        gen = np.zeros(extent, np.int32)
        gen[r < 0.8] = 3    # GM shell
        gen[r < 0.6] = 2    # WM
        gen[r < 0.2] = 4    # ventricle/CSF
        for lab in (10, 11, 12, 13, 17, 18):
            c = rng.uniform(-0.4, 0.4, 3)
            rr = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2 + (zz - c[2]) ** 2)
            gen[rr < rng.uniform(0.05, 0.12)] = lab
        seg = gen.copy()
        t1 = (gen > 0).astype(np.float32) * (100 + 50 * rng.standard_normal(extent)).clip(0)
        dist = np.stack([128 + 20 * (r - 0.7)] * 4, axis=-1).astype(np.float32)
        reg = np.stack([xx, yy, zz], axis=-1).astype(np.float32) * 10000
        subj = {
            "gen": self._pad(gen, self.bank_shape),
            "seg": self._pad(seg, self.bank_shape),
            "T1": self._pad(t1, self.bank_shape),
            "image": self._pad(t1, self.bank_shape),
            "dist": self._pad(dist, self.bank_shape),
            "reg": self._pad(reg, self.bank_shape),
            # effective extent, same clamp as add_from_files: _pad crops
            # anything beyond bank_shape
            "shape": np.asarray([min(s, b) for s, b in
                                 zip(extent, self.bank_shape)], np.float32),
            "age": np.float32(rng.uniform(20.0, 90.0)),
        }
        self.subjects.append(subj)
        return len(self.subjects) - 1

    def to_device(self, idx: int, cache_size: int = 4):
        """Device-resident view of subject `idx`, LRU-cached: repeated use
        (every training iteration samples from the bank) must not re-ship
        the ~200 MB of volumes over the host link each step. True LRU —
        hits refresh recency, so a hot subject survives cold ones cycling
        through."""
        from collections import OrderedDict

        if not hasattr(self, "_dev_cache"):
            self._dev_cache = OrderedDict()
        if idx in self._dev_cache:
            self._dev_cache.move_to_end(idx)
            return self._dev_cache[idx]
        dev = {k: jnp.asarray(v) for k, v in self.subjects[idx].items()}
        while len(self._dev_cache) >= cache_size:
            self._dev_cache.popitem(last=False)
        self._dev_cache[idx] = dev
        return dev

    def stage(self, idx: int):
        """One-shot HOST-STAGED device view of subject `idx` — NO cache.

        The returned buffers free as soon as the caller drops its
        reference and on-device synthesis has consumed them, so NOTHING
        of the bank is HBM-resident while the train step runs. This is
        what lets the reference's full S=4 intra-subject sample stack
        (Generator/datasets.py:728-750; brain_id.yaml all_samples) train
        at 128^3 on a single chip: the S=4 step compiles at ~15.6 GiB of
        a 15.75 GiB chip, and the LRU cache's ~0.9 GiB of resident
        subjects was the difference between running and
        RESOURCE_EXHAUSTED (NOTES_r04.md). Costs one ~200 MB H2D ship
        per draw — overlap comes from jax's async dispatch, not a
        prefetch buffer (a prefetch would be HBM-resident during the
        step peak, recreating the problem). Select with
        cfg subject_staging: host / train.py --staging host."""
        return {k: jnp.asarray(v) for k, v in self.subjects[idx].items()}

    def __len__(self):
        return len(self.subjects)
