"""Routing between the XLA gather warp (ops/interp.py) and the Pallas
tiled kernels (ops/pallas_warp_resident.py).

XLA lowers coordinate warps to 8 full-volume gathers — index-bound and
12.1 ms per 160^3 warp at 128^3 source on v5e (an 80 MB compiled
executable; an earlier degraded-relay session read ~240 ms). The Pallas
resident kernel replaces them with MXU hat-weight contractions but needs
the source volume in VMEM, so routing is by (backend, size, dtype):

- integer label volumes are warped compactly (uint8 after the caller's
  LUT) — exact and only D*H*W bytes of VMEM;
- float volumes ride bf16 storage when requested (synthesis-grade
  accuracy) or fp32 when they fit;
- everything else falls back to the XLA gather.

Routing decisions are static at trace time (shapes + backend), so the
jitted generator stays a single compiled graph.

Measured (v5e via relay, 2026-08-16, 160^3 output grid):
  XLA gather trilinear (128^3 src)        12.1 ms
  XLA gather nearest   (192^3 src)        13.0 ms
  Pallas resident fp32 (128^3 src)        40.7 ms   (exact, overflow 0)
  Pallas resident bf16                    backend compiler crash (relay)
XLA's gather is index-bound but fine at these sizes — so Pallas routing is
OFF by default (`PALLAS_WARP = False`) and the kernels remain validated
alternatives for environments/shapes where the gather regresses.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from .interp import nearest3d, trilinear3d
from .pallas_warp import plan_trim
from .pallas_warp_blocks import warp_blocks

__all__ = ["pallas_backend", "svf_trim_margin", "warp_labels",
           "warp_volume"]

# output-tile shape for the block kernel: z=32 halves the grid-step count
# for the same MXU pass count (K pads to 128 either way) — 10-ch wall warp
# 257 -> 197 ms measured (v5e 2026-08-17)
_TILE = (8, 8, 32)

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


def svf_trim_margin(cfg) -> float:
    """Within-tile SVF spread allowance: adjacent low-res nodes are
    independent N(0, nonlin_std) draws, pairwise spread std sqrt(2)*std;
    2.5 sigma covers the practical tail (overflowing voxels clamp to the
    patch edge and are counted, not corrupted)."""
    if not getattr(cfg, "nonlinear_transform", True):
        return 1.0
    return 2.5 * 1.4142135 * float(getattr(cfg, "nonlin_std_max", 4.0))


@lru_cache(maxsize=32)
def _blocks_trim(bounds):
    """Trim for warp_blocks: x/y capped by the 4-block fetch coverage
    (48), z by the two 128-lane z-blocks. Coordinates beyond the cap
    clamp to the patch edge and count into the kernel's overflow output —
    a tail-of-the-SVF-distribution event under the generator's bounds."""
    trim = plan_trim(_TILE, *bounds)
    return (min(trim[0], 48), min(trim[1], 48), min(trim[2], 128))


def _cfg_bounds(cfg):
    return (float(getattr(cfg, "max_rotation", 15.0)),
            float(getattr(cfg, "max_shear", 0.2)),
            float(getattr(cfg, "max_scaling", 0.2)),
            svf_trim_margin(cfg))


def warp_labels(vol, grid, cfg):
    """Nearest-neighbour warp of a compact integer label volume
    (values < 256, e.g. LUT-mapped segmentation indices). XLA's nearest
    gather (one lookup per voxel) measured 41.5 ms — faster than the
    indicator-weight Pallas path (94 ms) — so this stays on XLA; the
    compact-label form keeps the bytes-per-lookup minimal."""
    ii, jj, kk = grid
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
        cdt = jnp.bfloat16 if approx else jnp.float32
        out, _ = warp_blocks(vol, ii, jj, kk, default, tile=_TILE,
                             trim=_blocks_trim(_cfg_bounds(cfg)),
                             compute_dtype=cdt)
        return out
    return trilinear3d(vol, ii, jj, kk, default)
