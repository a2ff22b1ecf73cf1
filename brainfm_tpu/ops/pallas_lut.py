"""Gather-free small-table lookups (LUT application) on TPU.

The generator applies two kinds of LUTs to whole volumes: the GMM
contrast draw `mus[gr] + sigmas[gr]*noise` (256-entry table at the
subject grid, /root/reference/Generator/datasets.py:357-376) and the
label->index compaction `lut[seg]` before one-hot
(Generator/utils.py:394-424). XLA lowers `table[idx]` to its serialized
gather: 31.6 ms for a 192^3 lookup of a (256, 2) table (v5e, 2026-08-17).

This kernel evaluates the lookup as a compare-accumulate over the table
instead: out[n, c] = sum_k (idx[n] == k) * table[k, c] — pure VPU
iota-compare arithmetic, K*N*C ops, no gather instruction. For K <= a few
thousand this is bandwidth/VPU-bound and far faster than the gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lut_apply"]

_N = 2048          # flattened index elements per grid step
_KC = 256          # table rows per inner chunk


def _kernel(idx_ref, tbl_ref, out_ref, *, K, C, N):
    f32 = jnp.float32
    idx = idx_ref[0].astype(jnp.int32)          # (1, N)
    acc = [jnp.zeros((1, N), f32) for _ in range(C)]
    for k0 in range(0, K, _KC):
        kc = min(_KC, K - k0)
        k = k0 + jax.lax.broadcasted_iota(jnp.int32, (kc, N), 0)
        mask = (k == idx).astype(f32)           # (kc, N)
        for c in range(C):
            tcol = tbl_ref[pl.ds(k0, kc), pl.ds(c, 1)].astype(f32)  # (kc,1)
            acc[c] = acc[c] + jnp.sum(mask * tcol, axis=0,
                                      keepdims=True)
    for c in range(C):
        out_ref[0, pl.ds(c, 1), :] = acc[c]


@partial(jax.jit, static_argnames=("interpret",))
def _lut_pallas(idx_flat, table, interpret=False):
    N = _N
    T = idx_flat.shape[0] // N
    K, C = table.shape
    kern = partial(_kernel, K=K, C=C, N=N)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, C, N), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, N), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_flat.reshape(T, 1, N), table)
    return out


def lut_apply(table, idx, interpret=False):
    """table[idx] with table (K,) or (K, C) and integer idx of any shape;
    out-of-range indices produce 0 (callers clip, parity with the
    reference's explicit clips). Returns idx.shape (+ (C,)).

    Uses the compare-accumulate Pallas kernel on TPU, the XLA gather on
    CPU (interpret=True forces the kernel for tests)."""
    squeeze = table.ndim == 1
    tbl = table[:, None] if squeeze else table
    K, C = tbl.shape
    integer = jnp.issubdtype(tbl.dtype, jnp.integer)

    plat = None
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        pass
    if not interpret and plat not in ("tpu", "axon"):
        out = jnp.take(tbl, jnp.clip(idx, 0, K - 1), axis=0)
        out = jnp.where((idx >= 0)[..., None] & (idx < K)[..., None], out, 0)
    else:
        shp = idx.shape
        n = int(idx.size)
        pad = -n % _N
        idx_flat = jnp.pad(idx.reshape(-1).astype(jnp.int32), (0, pad),
                           constant_values=-1)
        # cast OUTSIDE the jit boundary: an i32 vs f32 table of the same
        # shape otherwise lands as two _lut_pallas trace-cache entries
        # (round-3 bench logged the i32[56,1]/f32 flip as repeated
        # TRACING CACHE MISSes at this line)
        out = _lut_pallas(idx_flat, tbl.astype(jnp.float32),
                          interpret=interpret)                  # (T, C, N)
        out = out.transpose(0, 2, 1).reshape(-1, C)[:n].reshape(*shp, C)
        if integer:
            # integer tables (< 2^24) survive the f32 accumulation exactly
            out = jnp.round(out).astype(tbl.dtype)
    return out[..., 0] if squeeze else out
