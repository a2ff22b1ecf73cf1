"""Spatial (volume) sharding with conv halo exchange.

The TPU-native analog of the reference's sliding-window tiled inference
(/root/reference/utils/test_utils.py:93-137 + scripts/demo_test.py:106-119):
instead of looping tiles through one GPU, the volume is sharded along its
leading spatial axis across the mesh 'space' axis; each device processes its
slab plus a halo wide enough to cover the network's receptive field,
exchanged over ICI with `ppermute`, and the slab centers are exact — no
overlap averaging needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

import inspect as _inspect

# jax renamed check_rep -> check_vma; the replication check must be off
# because halo_exchange's ppermute has no replication rule
if "check_vma" in _inspect.signature(shard_map).parameters:
    _NOCHECK = {"check_vma": False}
else:
    _NOCHECK = {"check_rep": False}


def halo_exchange(local, halo: int, axis_name: str = "space"):
    """Append `halo` voxels from each spatial neighbor along axis 1 of a
    (B, D_local, H, W, C) slab; zero padding at the mesh edges (matching
    'SAME' conv zero padding at volume boundaries)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_edge = local[:, :halo]
    right_edge = local[:, -halo:]
    # receive from left neighbor (their right edge) and right neighbor
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(left_edge)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, local, from_right], axis=1)


def spatial_shard_conv_apply(apply_fn, params, x, mesh, halo: int):
    """Apply a convnet to a volume sharded along spatial axis 1 (after
    batch) of x: (B, D, H, W, C), D divided across mesh axis 'space'.

    `halo` must cover the receptive-field half-width; slab centers are then
    exact for purely convolutional apply_fns.

    DOMAIN: pure convolution/stencil networks ONLY, and exact only away
    from the global volume edge: stacked SAME convs re-pad zeros per
    layer at the true boundary, while the halo path lets boundary
    influence propagate through the zero halo (within one receptive
    field of the volume edge the results differ). Any cross-volume
    statistic (GroupNorm, global pooling) is computed per slab+halo here,
    NOT globally — for the UNet and anything normalized, use the GSPMD
    path instead (jit with the volume device_put over 'space' under
    jax.sharding.set_mesh; XLA inserts exact halo exchanges and
    cross-shard normalization collectives; exactness proven by
    tests/test_flagship_l6.py). This explicit shard_map path remains for
    stencil pipelines (PDE advection, blur towers) where per-slab locality
    IS the whole computation and the ppermute cost model is transparent.

    Output leaves must keep the padded axis-1 extent (full-resolution
    outputs); lower-resolution leaves (e.g. 'feat' pyramids) should be
    dropped by apply_fn. `halo` and the slab extent should be multiples of
    2^(levels-1) so max-pool grids align.
    Returns the same pytree as apply_fn, spatially sharded the same way.
    """

    def local_apply(params, xl):
        padded = halo_exchange(xl, halo)
        out = apply_fn(params, padded)

        def crop(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                    and leaf.shape[1] == padded.shape[1]:
                return leaf[:, halo:-halo]
            return leaf

        return jax.tree.map(crop, out)

    sharded = shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(), P(None, "space")),
        out_specs=P(None, "space"),
        **_NOCHECK,
    )
    return sharded(params, x)
