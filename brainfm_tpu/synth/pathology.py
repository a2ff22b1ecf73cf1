"""Pathology shape synthesis, advection augmentation, and image encoding.

Parity with /root/reference/Generator/utils.py:65-72 (binarize), :542-560
(`augment_pathology` — Perlin velocity + odeint advection), and
Generator/datasets.py:496-518 (`encode_pathology`). Runs on-device in JAX
(the reference's Perlin is CPU numpy — SURVEY.md flags it as a bottleneck).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ode import odeint_masked_final
from ..ops.pde import advect_rhs
from ..ops.perlin import shape_3d, velocity_3d


def binarize(p, thres):
    """(parity: Generator/utils.py:65-72 — threshold relative to max)."""
    t = thres * jnp.max(p)
    return jnp.where(p >= t, 1.0, 0.0)


def random_shape(key, size, cfg):
    """Random Perlin lesion shape (parity: Generator/utils.py:438-440 +
    ShapeID/perlin3d.py:144-146). Returns (prob, mask)."""
    k1, k2 = jax.random.split(key)
    percentile = (cfg.mask_percentile_min
                  + jax.random.uniform(k1)
                  * (cfg.mask_percentile_max - cfg.mask_percentile_min))
    mask, prob = shape_3d(k2, size, cfg.perlin_res, percentile)
    return prob, mask


def augment_pathology(key, pprob, cfg):
    """Advect the lesion probability with a random divergence-free velocity
    for a random number of steps (parity: Generator/utils.py:542-560).

    nt is a traced draw in [1, max_nt]; integration uses the masked-final
    form (ops/ode.odeint_masked_final) so the trip count stays static
    under jit. `cfg.integ_method` is honored as configured — the
    reference's default adaptive dopri5 (cfgs/generator/default.yaml:117,
    odeint defaults rtol=1e-7/atol=1e-9, ShapeID/DiffEqs/odeint.py:20)
    runs a bounded per-interval `while_loop` composed with the nt mask."""
    k1, k2 = jax.random.split(key)
    nt = jax.random.randint(k1, (), 1, cfg.max_nt + 1)
    v = velocity_3d(k2, pprob.shape, cfg.perlin_res, cfg.v_multiplier)

    def f(t, y):
        return advect_rhs(y[None], v["Vx"][None], v["Vy"][None],
                          v["Vz"][None], bc=cfg.bc)[0]

    ts = jnp.arange(cfg.max_nt) * cfg.dt
    out = odeint_masked_final(f, pprob, ts, nt, dt=cfg.dt,
                              method=cfg.integ_method)
    # nt<=1 leaves the input untouched (utils.py:546-547)
    return jnp.where(nt <= 1, pprob, out)


def encode_pathology(key, img, P, Pprob, pathol_direction):
    """Paint the pathology into the image (parity: datasets.py:496-518).

    pathol_direction: traced 0/1 scalar; 1 = T2/FLAIR-like (bright),
    0 = T1-like (dark)."""
    k1, k2, k3 = jax.random.split(key, 3)
    psum = jnp.maximum(jnp.sum(P), 1e-6)
    i_mu = jnp.sum(img * P) / psum
    pth_mus = 3 * i_mu / 4 + i_mu / 4 * jax.random.uniform(k1, (10000,))
    pth_mus = jnp.where(pathol_direction > 0, pth_mus, -pth_mus)
    pth_sigmas = i_mu / 4 * jax.random.uniform(k2, (10000,))
    noise = jax.random.normal(k3, P.shape)
    # P is binarized upstream (engine._pathology: binarize -> {0,1}), so
    # the reference's 10000-row table lookup (datasets.py:505-513) only
    # ever reads rows 0 and 1 — a 2-way select replaces the serialized
    # XLA gather (85 -> ~10 ms/volume at 160^3 on v5e). The (10000,)
    # draws are kept so the RNG stream (and injected-draw goldens) are
    # unchanged.
    sel = P > 0.5
    mu = jnp.where(sel, pth_mus[1], pth_mus[0])
    sig = jnp.where(sel, pth_sigmas[1], pth_sigmas[0])
    out = img + Pprob * (mu + sig * noise)
    return jnp.maximum(out, 0.0)


def pathology_direction(key, input_mode: str, synth_dir=None):
    """(parity: datasets.py:414-427). Returns traced 0/1."""
    if synth_dir is not None:
        return synth_dir
    if input_mode in ("T1", "CT"):
        return jnp.zeros(())
    if input_mode in ("T2", "FLAIR"):
        return jnp.ones(())
    return (jax.random.uniform(key) < 0.5).astype(jnp.float32)
