"""Routing between the XLA gather warp (ops/interp.py) and the Pallas
tiled warp kernels (ops/pallas_warp_blocks.py).

XLA lowers coordinate warps to 8 full-volume gathers — index-bound: on
v5e a single-channel 160^3 warp of a 192^3 source costs 243.5 ms and each
extra fused channel +65 ms (824 ms at 10 channels; threaded-args
measurement 2026-08-16 — always thread benchmark inputs, a zero-arg jit
constant-folds to a 12 ms memcpy). The HBM-blocked Pallas kernel
evaluates the same warp as hat-weight MXU contractions over streamed
source blocks: 31 ms/channel bf16, 94 ms/channel fp32 (exact to 2.4e-7),
180 ms for the generator's 10-channel fused target warp at the (8,8,32)
tile with channel-pair packing.

Routing (static at trace time, so the jitted generator stays one graph):
- linear float warps with 3-D grid coordinates -> Pallas blocks kernel
  (bf16 in approx/synthesis mode, fp32 HIGHEST otherwise);
- nearest warps of COMPACT label volumes (values < 256) -> blocks kernel
  with bf16 indicator weights, bit-exact, 23.6 ms vs XLA's 41.5 ms;
- CPU backend, non-grid coordinate sets, or wide-valued nearest -> XLA
  gather.

Patch extents come from `plan_trim` over the generator's affine bounds
plus an SVF spread margin; coordinates beyond the static patch clamp to
its edge and are counted in the kernel's overflow output — and any item
with a nonzero count recomputes through the exact XLA gather via
`lax.cond` (`_overflow_guard`), so the routed result always equals the
gather semantics regardless of the planner's caps.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from .interp import nearest3d, trilinear3d
from .pallas_warp_blocks import plan_trim, warp_blocks

__all__ = ["pallas_backend", "svf_trim_margin", "warp_labels",
           "warp_volume"]

# output-tile shape for the block kernel: z=32 halves the grid-step count
# for the same MXU pass count (K pads to 128 either way) — 10-ch wall warp
# 257 -> 197 ms measured (v5e 2026-08-17). When the deformation bounds
# need more fetch coverage than the kernel's caps allow at z=32, the
# planner falls back to z=16 (smaller |A|@t extent); if even that exceeds
# the caps it caps the trim with a LOUD warning (see _blocks_plan).
_TILE = (8, 8, 32)
_TILE_FALLBACK = (8, 8, 16)
# fetch-coverage caps of warp_blocks: x/y <= (_NB-1)*_BX = 48, z <= 128
_TRIM_CAPS = (48, 48, 128)

# when True, every Pallas warp asserts its overflow count is zero via a
# host callback (voxels whose source coordinate left the static patch
# clamp to its edge — a correctness loss that must be loud, not silent)
DEBUG_OVERFLOW = False

# master switch for the Pallas warp path. Threaded-args re-measurement
# (v5e, 2026-08-16 — the first 12 ms reading was a constant-folded
# zero-arg jit): XLA gather = 243.5 ms per 1-ch 160^3 warp of 192^3,
# +65 ms/channel (824 ms at 10ch); warp_blocks = 31 ms bf16 / 94 ms fp32
# per channel. Linear warps route to Pallas; nearest stays XLA (41.5 ms
# vs 94 ms).
PALLAS_WARP = True


def pallas_backend() -> bool:
    """True when running against a real TPU (directly or via the axon
    relay); Pallas TPU kernels cannot run on the CPU backend."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return plat in ("tpu", "axon")


def _cfg_get(cfg, name, default):
    """getattr that also treats None as missing: AttrDict configs return
    None for absent keys (never raising), which silently defeats plain
    getattr defaults — float(None) crashes at the first warp."""
    v = getattr(cfg, name, None)
    return default if v is None else v


def svf_trim_margin(cfg) -> float:
    """Within-tile SVF spread allowance: adjacent low-res nodes are
    independent N(0, nonlin_std) draws, pairwise spread std sqrt(2)*std;
    2.5 sigma covers the practical tail (items overflowing it recompute
    exactly — see _overflow_guard)."""
    if not _cfg_get(cfg, "nonlinear_transform", True):
        return 1.0
    return 2.5 * 1.4142135 * float(_cfg_get(cfg, "nonlin_std_max", 4.0))


@lru_cache(maxsize=32)
def _blocks_plan(bounds):
    """(tile, trim) for warp_blocks under the kernel's fetch-coverage caps.

    plan_trim extents grow with the output tile (|A|@t), so a tile whose
    worst-case request fits the caps is preferred. When even the short
    tile's request exceeds them (the DEFAULT generator bounds do:
    plan_trim's corner-max affine x 2.5-sigma SVF margin is deliberately
    conservative), the trim is capped — with a loud one-time warning, and
    coordinates beyond the patch clamp to its edge and count into the
    kernel's overflow output (assert it zero via DEBUG_OVERFLOW; measured
    0 over 82M voxels / 20 real-bounds draws, v5e 2026-08-17)."""
    for tile in (_TILE, _TILE_FALLBACK):
        trim = plan_trim(tile, *bounds)
        if all(t <= c for t, c in zip(trim, _TRIM_CAPS)):
            return tile, trim
    import warnings

    trim = plan_trim(_TILE, *bounds)
    capped = tuple(min(t, c) for t, c in zip(trim, _TRIM_CAPS))
    warnings.warn(
        f"pallas warp: worst-case plan_trim{tuple(trim)} exceeds kernel "
        f"coverage caps {_TRIM_CAPS} for bounds {bounds}; using capped "
        f"trim {capped}. Items whose deformation actually leaves the "
        "patch recompute through the exact XLA gather automatically "
        "(lax.cond on the kernel's overflow count — see _overflow_guard); "
        "only the fallback's extra latency, not correctness, is at stake.")
    return _TILE, capped


def _raise_if_overflowed(c):
    if int(c) > 0:
        raise RuntimeError(
            f"pallas warp: {int(c)} voxels left the static patch "
            "(deformation beyond planned trim) — widen bounds in "
            "the cfg or disable PALLAS_WARP")


def _take_kernel(out, vol, ii, jj, kk, default):
    del vol, ii, jj, kk, default
    return out


def _exact_linear(out, vol, ii, jj, kk, default):
    return trilinear3d(vol, ii, jj, kk, default).astype(out.dtype)


def _exact_nearest(out, vol, ii, jj, kk, default):
    del default
    return nearest3d(vol, ii, jj, kk).astype(out.dtype)


def _overflow_guard(out_and_count, exact_branch, vol, ii, jj, kk,
                    default=0.0):
    """Kernel result with an exact-recompute fallback.

    The static patch clamps coordinates that leave it and counts them in
    the kernel's overflow output; when the count is nonzero the whole warp
    is recomputed through the exact XLA gather via `lax.cond` — so the
    Pallas path is ALWAYS semantically identical to the gather (modulo
    compute_dtype rounding), at zero steady-state cost (the fallback
    branch executes only on overflow; measured 0 overflows over 82M
    voxels / 20 real-bounds draws, v5e 2026-08-17). Note: under `vmap`
    batching a `cond` lowers to a both-branches `select` — the warp sites
    in synth/ and infer/ are plain (unbatched) calls.

    Branches are module-level functions taking the warp inputs as cond
    OPERANDS: per-call lambdas gave every cond a fresh callee identity,
    defeating jax's trace cache and retracing the warp on each eager call
    (round-3 bench logged `TRACING CACHE MISS ... warp_auto.py:142 ...
    re-defined repeatedly`)."""
    out, count = out_and_count
    if DEBUG_OVERFLOW:
        jax.debug.callback(_raise_if_overflowed, count)
    return jax.lax.cond(count > 0, exact_branch, _take_kernel,
                        out, vol, ii, jj, kk,
                        jnp.asarray(default, jnp.float32))


def _cfg_bounds(cfg):
    return (float(_cfg_get(cfg, "max_rotation", 15.0)),
            float(_cfg_get(cfg, "max_shear", 0.2)),
            float(_cfg_get(cfg, "max_scaling", 0.2)),
            svf_trim_margin(cfg))


def warp_labels(vol, grid, cfg):
    """Nearest-neighbour warp of a compact integer label volume
    (values < 256, e.g. LUT-mapped segmentation indices).

    Rides the blocks kernel with bf16 indicator-weight matmuls — exact
    for label values < 256 (integers <= 256 are representable in bf16 and
    each output picks exactly one of them) — 26 ms vs XLA's 41.5 ms
    nearest gather; falls back to the gather off TPU."""
    ii, jj, kk = grid
    if (PALLAS_WARP and pallas_backend() and vol.ndim == 3
            and ii.ndim == 3):
        plan = _blocks_plan(_cfg_bounds(cfg))
        if plan is not None:
            tile, trim = plan
            return _overflow_guard(
                warp_blocks(vol, ii, jj, kk, 0.0, tile=tile, trim=trim,
                            mode="nearest", compute_dtype=jnp.bfloat16),
                _exact_nearest, vol, ii, jj, kk)
    return nearest3d(vol, ii, jj, kk)


def warp_volume(vol, grid, cfg, default=0.0, approx=False):
    """Trilinear warp of a float volume (any size / channel count) via the
    HBM-blocked Pallas kernel: bf16 compute for synthesis-grade approx
    mode (31 ms/channel vs XLA's 243+65/ch), fp32 HIGHEST otherwise
    (94 ms/channel, exact to 2.4e-7). Falls back to the XLA gather off
    TPU or for non-grid coordinate sets."""
    ii, jj, kk = grid
    if (PALLAS_WARP and pallas_backend() and ii.ndim == 3
            and vol.ndim in (3, 4)):
        plan = _blocks_plan(_cfg_bounds(cfg))
        if plan is not None:
            tile, trim = plan
            cdt = jnp.bfloat16 if approx else jnp.float32
            return _overflow_guard(
                warp_blocks(vol, ii, jj, kk, default, tile=tile, trim=trim,
                            compute_dtype=cdt),
                _exact_linear, vol, ii, jj, kk, default)
    return trilinear3d(vol, ii, jj, kk, default)
