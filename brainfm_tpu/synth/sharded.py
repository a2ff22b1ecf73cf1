"""Per-rank sharded batch synthesis.

TPU design: in mesh mode the train step is data-parallel, but a naively
jitted `synth_item` carries no sharding annotations — every item is
synthesized on one chip (serializing the generator behind the step) or
redundantly on all of them. The reference parallelizes generation with
per-rank DataLoader worker processes feeding each DDP rank
(/root/reference/scripts/train.py:154-158 + Generator dataloaders); the
TPU-native equivalent is `shard_map` over the mesh's 'data' axis: the
batch of PRNG keys is sharded, each device synthesizes only its own
items, and the assembled batch comes out already batch-sharded — the
whole generator runs as one SPMD program with zero cross-device traffic
(synthesis is embarrassingly parallel over items).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..parallel.spatial import _NOCHECK, shard_map
from .engine import _synth_item_impl


def stack_items(targets, samples):
    """Stack per-item (target, samples) pytrees into one train batch.

    Volume targets gain the (B, 1, ...) sample axis the criterion
    broadcasts against; host-side-only targets (surface deformation
    state, the float pathology prior) are dropped from the device batch.
    """
    tgt = jax.tree.map(lambda *xs: jnp.stack(xs)[:, None] if xs[0].ndim >= 3
                       else jnp.stack(xs), *targets)
    smp = jax.tree.map(lambda *xs: jnp.stack(xs), *samples)
    # criterion wants only tensor targets the losses know about
    tgt = {k: v for k, v in tgt.items()
           if k != "pathology_prob" and not k.startswith("surface_")}
    return {"targets": tgt, "samples": smp}


def sharded_synth_batch(mesh, keys, subject, cfg, tasks, input_mode,
                        knobs_stack, axes=("data",),
                        per_item_subject: bool = False):
    """Synthesize a full train batch with per-rank parallelism.

    `keys`: (B, 2) uint32 stack of PRNG keys, B a multiple of the product
    of the `axes` mesh-axis sizes. `subject`: one subject dict (replicated
    to every rank) or, with `per_item_subject=True`, a subject pytree whose
    leaves carry a leading B axis (each rank synthesizes from its own
    subjects). Returns the same batch pytree as `stack_items` over serial
    `synth_item` calls — bit-identical items — but with every leaf already
    sharded batch-over-`axes` and each device having computed only its
    B/n_ranks items.
    """
    n_ranks = 1
    for a in axes:
        n_ranks *= mesh.shape[a]
    B = int(keys.shape[0])
    assert B % n_ranks == 0, (B, dict(mesh.shape), axes)
    local_B = B // n_ranks

    names = tuple(sorted(subject.keys()))
    vals = tuple(subject[k] for k in names)
    tasks = tuple(tasks)
    spec_b = P(axes)
    spec_subj = P(axes) if per_item_subject else P()

    def body(keys_loc, vals_loc, knobs_loc):
        targets, samples = [], []
        for i in range(local_B):
            v_i = tuple(v[i] for v in vals_loc) if per_item_subject \
                else vals_loc
            t, s = _synth_item_impl(keys_loc[i], v_i, names, cfg, tasks,
                                    input_mode, knobs_loc)
            targets.append(t)
            samples.append(s)
        return stack_items(targets, samples)

    return shard_map(body, mesh=mesh, in_specs=(spec_b, spec_subj, P()),
                     out_specs=spec_b, **_NOCHECK)(keys, vals, knobs_stack)
