"""Direct tests for host-side helpers flagged by the round-2 coverage
audit: RAS orientation alignment (utils/orientation.py — parity with
utils/misc.py:226-238,1207-1247), the parallel mesh convenience API, and
the surface .mat loader."""

import numpy as np
import jax
from jax.sharding import PartitionSpec as P

from brainfm_tpu.utils.orientation import align_volume_to_ref, get_ras_axes


def _world_points(vol, aff, idxs):
    out = []
    for v in idxs:
        w = aff @ np.array([*v, 1.0])
        out.append((tuple(np.round(w[:3], 5)), vol[tuple(v)]))
    return dict(out)


def test_align_volume_to_ref_preserves_world_content():
    """Axis-permuted + flipped affine aligned to identity RAS: every voxel
    keeps its world coordinate and value (the invariant the reference's
    swap/flip surgery maintains)."""
    rng = np.random.default_rng(0)
    vol = rng.random((4, 5, 6)).astype(np.float32)
    # voxel axis 0 -> world -y (flip), 1 -> world +z, 2 -> world +x
    aff = np.array([
        [0, 0, 1, -3.0],
        [-1, 0, 0, 2.0],
        [0, 1, 0, 1.5],
        [0, 0, 0, 1.0]], float)
    out, aff_out = align_volume_to_ref(vol, aff, aff_ref=np.eye(4),
                                       return_aff=True)
    assert (get_ras_axes(aff_out) == np.array([0, 1, 2])).all()
    assert np.all(np.sum(aff_out[:3, :3] * np.eye(3), axis=0) > 0)
    idxs = [(0, 0, 0), (3, 4, 5), (1, 2, 3), (2, 0, 4)]
    orig = _world_points(vol, aff, idxs)
    # find the same world points in the aligned volume
    hits = 0
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            for k in range(out.shape[2]):
                w = tuple(np.round((aff_out @ [i, j, k, 1.0])[:3], 5))
                if w in orig:
                    np.testing.assert_allclose(out[i, j, k], orig[w])
                    hits += 1
    assert hits == len(idxs)


def test_align_identity_is_noop():
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    out = align_volume_to_ref(vol, np.eye(4))
    np.testing.assert_array_equal(out, vol)


def test_mesh_convenience_api():
    """make_mesh/shard_batch/replicate/data_sharding — the exported
    parallel API (parity surface: DistributedSampler batch placement)."""
    from brainfm_tpu.parallel import (data_sharding, make_mesh, replicate,
                                      shard_batch)

    mesh = make_mesh(data=4, space=2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    batch = {"x": np.ones((8, 3), np.float32),
             "odd": np.ones((3,), np.float32),
             "s": np.float32(1.0)}
    sb = shard_batch(mesh, batch)
    assert sb["x"].sharding.spec in (P("data"), P("data", None))
    # non-divisible leading axis falls back to replication
    assert sb["odd"].sharding.spec in (P(), P(None))
    tree = replicate(mesh, {"w": np.zeros((2, 2), np.float32)})
    assert tree["w"].sharding.spec in (P(), P(None, None))
    assert data_sharding(mesh).spec == P("data")


def test_load_surfaces_mat_roundtrip(tmp_path):
    from scipy.io import savemat

    from brainfm_tpu.synth.surface import load_surfaces_mat

    rng = np.random.default_rng(1)
    data = {}
    for k in ("Vlw", "Vrw", "Vlp", "Vrp"):
        data[k] = rng.random((10, 3))
    for k in ("Flw", "Frw", "Flp", "Frp"):
        data[k] = rng.integers(0, 10, (5, 3))
    p = str(tmp_path / "subj.surf.mat")
    savemat(p, data)
    out = load_surfaces_mat(p)
    for k, v in data.items():
        np.testing.assert_array_equal(out[k], v)


def test_profiling_helpers(tmp_path):
    """trace/annotate produce a profile dir; device_memory_stats and
    StepTimer return sane values (utils/profiling.py — SURVEY §5 tracing)."""
    import os

    import jax.numpy as jnp

    from brainfm_tpu.utils.profiling import (StepTimer, annotate,
                                             device_memory_stats, trace)

    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("unit"):
            y = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            jax.block_until_ready(y)
    assert os.path.isdir(d) and os.listdir(d)

    stats = device_memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.start()
        dt = t.stop(jnp.ones(8) + 1)
        assert dt >= 0
    assert len(t.times) == 2 and t.mean >= 0
