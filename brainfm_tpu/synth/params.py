"""Generator configuration and per-item stochastic setup.

The reference samples all randomness host-side with global numpy/python RNG
(Generator/datasets.py:466-493 `get_setup_params`, Generator/utils.py:34-57
`resolution_sampler`). Here the static knobs live in `SynthStatic` (hashable,
jit-static) and the per-item draws are made from a jax PRNG key into a
traced pytree, so the whole synthesis pipeline compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SynthStatic:
    """Static generator parameters (parity: cfgs/generator/default.yaml:61-123)."""

    size: Tuple[int, int, int] = (128, 128, 128)
    max_rotation: float = 15.0
    max_shear: float = 0.2
    max_scaling: float = 0.2
    nonlin_scale_min: float = 0.03
    nonlin_scale_max: float = 0.06
    nonlin_std_max: float = 4.0
    bf_scale_min: float = 0.02
    bf_scale_max: float = 0.04
    bf_std_min: float = 0.1
    bf_std_max: float = 0.6
    gamma_std: float = 0.1
    noise_std_min: float = 5.0
    noise_std_max: float = 15.0
    photo_prob: float = 0.2
    pathology_prob: float = 0.0
    random_shape_prob: float = 0.0
    augment_pathology: bool = False
    flip_prob: float = 0.5
    ct_prob: float = 0.0
    mix_synth_prob: float = 0.0
    low_res_only: bool = False
    left_hemis_only: bool = False
    random_shift: bool = False
    deform_one_hots: bool = False
    nonlinear_transform: bool = True
    bspline_zooming: bool = False
    n_steps_svf_integration: int = 8
    max_surf_distance: float = 3.0
    # pathology shape generator (cfgs/generator/default.yaml:113-123)
    perlin_res: Tuple[int, int, int] = (2, 2, 2)
    mask_percentile_min: float = 85.0
    mask_percentile_max: float = 99.9
    v_multiplier: float = 500.0
    dt: float = 0.1
    max_nt: int = 10
    pathol_thres: float = 0.5
    pathol_tol: float = 1e-7
    integ_method: str = "dopri5"  # reference default (default.yaml:117)
    bc: str = "neumann"
    # intra-subject sampling (cfgs/generator/train/brain_id.yaml)
    all_samples: int = 4
    mild_samples: int = 2
    # route single-channel float warps through the gather-free Pallas
    # kernel in bf16 (synthesis-grade accuracy; labels stay exact either
    # way) — ops/warp_auto.py
    approx_warp: bool = True
    # bf16 also for the fused TARGET wall warp (distance/CT/T1 regression
    # labels + pathol_prob). False keeps targets fp32-exact while
    # augmentation intermediates stay bf16 (~3x the wall-warp cost).
    approx_warp_targets: bool = True
    # resolution of the training data (datasets.py:153)
    res_training_data: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # per-mode augmentation chains (parity: cfg augmentation_steps,
    # cfgs/generator/default.yaml:57 + the per-mode chain selection of
    # augment_sample, datasets.py:330-331); static tuples -> jit-static
    aug_steps_synth: Tuple[str, ...] = ("gamma", "bias_field", "resample",
                                        "noise")
    aug_steps_real: Tuple[str, ...] = ("gamma", "bias_field", "resample",
                                       "noise")

    @classmethod
    def from_cfg(cls, cfg):
        """Build from an AttrDict config tree (generator + shape-gen blocks)."""
        g = cfg.generator
        sg = cfg.pathology_shape_generator or {}
        def gv(d, k, default):
            v = d.get(k) if d else None
            return default if v is None else v
        return cls(
            size=tuple(g.size),
            max_rotation=float(gv(g, "max_rotation", 15.0)),
            max_shear=float(gv(g, "max_shear", 0.2)),
            max_scaling=float(gv(g, "max_scaling", 0.2)),
            nonlin_scale_min=float(gv(g, "nonlin_scale_min", 0.03)),
            nonlin_scale_max=float(gv(g, "nonlin_scale_max", 0.06)),
            nonlin_std_max=float(gv(g, "nonlin_std_max", 4.0)),
            bf_scale_min=float(gv(g, "bf_scale_min", 0.02)),
            bf_scale_max=float(gv(g, "bf_scale_max", 0.04)),
            bf_std_min=float(gv(g, "bf_std_min", 0.1)),
            bf_std_max=float(gv(g, "bf_std_max", 0.6)),
            gamma_std=float(gv(g, "gamma_std", 0.1)),
            noise_std_min=float(gv(g, "noise_std_min", 5.0)),
            noise_std_max=float(gv(g, "noise_std_max", 15.0)),
            photo_prob=float(gv(g, "photo_prob", 0.2)),
            pathology_prob=float(gv(g, "pathology_prob", 0.0)),
            random_shape_prob=float(gv(g, "random_shape_prob", 0.0)),
            augment_pathology=bool(gv(g, "augment_pathology", False)),
            flip_prob=float(gv(g, "flip_prob", 0.5)),
            ct_prob=float(gv(g, "ct_prob", 0.0)),
            mix_synth_prob=float(gv(cfg, "mix_synth_prob", 0.0)),
            low_res_only=bool(gv(g, "low_res_only", False)),
            left_hemis_only=bool(gv(g, "left_hemis_only", False)),
            random_shift=bool(gv(g, "random_shift", False)),
            deform_one_hots=bool(gv(g, "deform_one_hots", False)),
            nonlinear_transform=bool(gv(g, "nonlinear_transform", True)),
            bspline_zooming=bool(gv(g, "bspline_zooming", False)),
            n_steps_svf_integration=int(gv(g, "n_steps_svf_integration", 8)),
            max_surf_distance=float(gv(cfg, "max_surf_distance", 3.0)),
            perlin_res=tuple(gv(sg, "perlin_res", (2, 2, 2))),
            mask_percentile_min=float(gv(sg, "mask_percentile_min", 85.0)),
            mask_percentile_max=float(gv(sg, "mask_percentile_max", 99.9)),
            v_multiplier=float(gv(sg, "V_multiplier", 500.0)),
            dt=float(gv(sg, "dt", 0.1)),
            max_nt=int(gv(sg, "max_nt", 10)),
            pathol_thres=float(gv(sg, "pathol_thres", 0.5)),
            pathol_tol=float(gv(sg, "pathol_tol", 1e-7)),
            integ_method=str(gv(sg, "integ_method", "dopri5")),
            bc=str(gv(sg, "bc", "neumann")),
            all_samples=int(gv(g, "all_samples", 1)),
            mild_samples=int(gv(g, "mild_samples", 0)),
            approx_warp=bool(gv(g, "approx_warp", True)),
            approx_warp_targets=bool(gv(g, "approx_warp_targets", True)),
            aug_steps_synth=tuple(_aug_steps(cfg, "synth")),
            aug_steps_real=tuple(_aug_steps(cfg, "real")),
        )


def _aug_steps(cfg, mode: str):
    """augmentation_steps accepts BOTH config forms: the reference's flat
    list (one chain for synth and real, cfgs/generator/test/demo_test.yaml)
    and the {'synth': [...], 'real': [...]} dict."""
    default = ("gamma", "bias_field", "resample", "noise")
    steps = cfg.get("augmentation_steps") if hasattr(cfg, "get") else None
    if steps is None:
        return default
    if isinstance(steps, (list, tuple)):
        return steps
    return steps.get(mode, default)


def resolution_sampler(key, low_res_only: bool = False):
    """4-branch acquisition model (parity: Generator/utils.py:34-57).
    Returns traced (resolution[3], thickness[3])."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    r = jax.random.uniform(k1)
    if low_res_only:
        r = 0.5 + 0.5 * r  # in [0.5, 1]

    # branch 1: 1mm iso
    res1 = jnp.ones(3)
    thk1 = jnp.ones(3)
    # branch 2: clinical, low-res in one random dimension
    idx = jax.random.randint(k2, (), 0, 3)
    u = jax.random.uniform(k3, (2,))
    res2 = jnp.ones(3).at[idx].set(2.5 + 6.0 * u[0])
    thk2 = jnp.ones(3).at[idx].set(jnp.minimum(2.5 + 6.0 * u[0],
                                               4.0 + 2.0 * u[1]))
    # branch 3: low-field stock (axial)
    u3 = jax.random.uniform(k4, (3,))
    res3 = jnp.array([1.3, 1.3, 4.8]) + 0.4 * u3
    thk3 = res3
    # branch 4: low-field isotropic-ish
    res4 = 2.0 + 3.0 * u3
    thk4 = res4

    # side='right' so exact boundary draws (r == 0.25/0.5/0.75) fall into
    # the branch ABOVE, matching the reference's `elif r < 0.5` bucketing —
    # under low_res_only a left-side r=0.5 would leak the clinical branch
    branch = jnp.searchsorted(jnp.array([0.25, 0.5, 0.75]), r, side="right")
    res = jnp.select([branch == 0, branch == 1, branch == 2],
                     [res1, res2, res3], res4)
    thk = jnp.select([branch == 0, branch == 1, branch == 2],
                     [thk1, thk2, thk3], thk4)
    return res, thk


def sample_setup(key, cfg: SynthStatic):
    """Per-item stochastic setup (parity: Generator/datasets.py:466-493).
    All leaves traced; photo_mode/pathol/flip are 0/1 floats."""
    keys = jax.random.split(key, 8)
    if cfg.low_res_only:
        photo = jnp.zeros(())
    elif cfg.left_hemis_only:
        photo = jnp.ones(())
    else:
        photo = (jax.random.uniform(keys[0]) < cfg.photo_prob).astype(jnp.float32)
    pathol = (jax.random.uniform(keys[1]) < cfg.pathology_prob).astype(jnp.float32)
    pathol_shape = (jax.random.uniform(keys[2])
                    < cfg.random_shape_prob).astype(jnp.float32)
    spac = 2.5 + 10.0 * jax.random.uniform(keys[3])
    if cfg.left_hemis_only:
        flip = jnp.zeros(())
    else:
        # note: reference uses randn < flip_prob (datasets.py:483)
        flip = (jax.random.normal(keys[4]) < cfg.flip_prob).astype(jnp.float32)

    res_s, thk_s = resolution_sampler(keys[5], cfg.low_res_only)
    rtd = jnp.asarray(cfg.res_training_data)
    res_photo = jnp.array([rtd[0], 1.0, rtd[2]]).at[1].set(spac)
    thk_photo = jnp.array([rtd[0], 0.1, rtd[2]])
    resolution = jnp.where(photo > 0, res_photo, res_s)
    thickness = jnp.where(photo > 0, thk_photo, thk_s)

    return {
        "photo_mode": photo, "pathol_mode": pathol,
        "pathol_random_shape": pathol_shape, "spac": spac, "flip": flip,
        "resolution": resolution, "thickness": thickness,
    }
