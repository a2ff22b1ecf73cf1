"""ZeRO/FSDP-style parameter + optimizer-state sharding.

The reference's only distribution strategy is DDP with fully replicated
parameters (/root/reference/scripts/train.py:154-158): every rank holds
the whole model plus full Adam moments. This module is the TPU-native
extension for models whose params + optimizer state outgrow one chip's
HBM: every tensor of the TrainState is sharded over the mesh 'data' axis
along its largest evenly-divisible dimension. Under GSPMD, XLA then
inserts the parameter all-gathers where the forward/backward consumes a
full tensor and reduce-scatters the gradients, so the optimizer update
itself runs fully sharded — per-device state memory drops by the axis
size while the math is unchanged (verified exactly in fp64,
tests/test_fsdp.py).

Composes with the 'space' axis (spatial activation sharding): params
shard over 'data', activations over 'space', grads psum over 'data'.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, axis_size: int, axis: str = "data") -> P:
    """PartitionSpec sharding the largest dimension divisible by
    `axis_size`; fully replicated when no dimension qualifies (scalars,
    small/odd tensors — e.g. optax hyperparams and counts)."""
    best = None
    for d, s in enumerate(shape):
        if s % axis_size == 0 and s > 1:
            if best is None or s > shape[best]:
                best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def state_shardings(tree, mesh: Mesh, axis: str = "data"):
    """A pytree of NamedShardings matching `tree` (arrays or
    ShapeDtypeStructs, e.g. from jax.eval_shape) under the FSDP rule."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda a: NamedSharding(mesh, fsdp_spec(a.shape, n, axis)), tree)


def shard_state(tree, mesh: Mesh, axis: str = "data"):
    """Place an existing (host or single-device) state tree sharded.
    For a fresh start prefer `init_sharded` — it never materializes the
    full state on one device."""
    return jax.device_put(tree, state_shardings(tree, mesh, axis))


def init_sharded(make_state, mesh: Mesh, *args, axis: str = "data"):
    """jit `make_state(*args)` with FSDP out-shardings: each device
    computes/holds only its own state shards from the first byte — the
    path that matters when the full state would not fit one chip."""
    shapes = jax.eval_shape(make_state, *args)
    out_sh = state_shardings(shapes, mesh, axis)
    return jax.jit(make_state, out_shardings=out_sh)(*args)
