"""Native volume codec: build, batch decode correctness vs the python
reader, and throughput sanity."""

import os
import tempfile
import time

import numpy as np
import pytest

from brainfm_tpu.runtime.loader import VolCodec, build_native, native_available
from brainfm_tpu.utils.nifti import save_nifti


@pytest.fixture(scope="module")
def volumes():
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(6):
        vol = rng.random((30 + i, 28, 26)).astype(np.float32)
        p = os.path.join(d, f"v{i}.nii.gz" if i % 2 else f"v{i}.nii")
        save_nifti(p, vol)
        paths.append(p)
        arrays.append(vol)
    return paths, arrays


def test_native_builds():
    assert build_native(), "g++ build of volcodec failed"
    assert native_available()


def test_batch_decode_matches_python(volumes):
    paths, arrays = volumes
    codec = VolCodec((40, 30, 30), n_threads=4)
    out = codec.decode_batch(paths)
    assert out.shape == (6, 40, 30, 30)
    for i, vol in enumerate(arrays):
        d, h, w = vol.shape
        np.testing.assert_allclose(out[i, :d, :h, :w], vol, rtol=1e-6)
        assert out[i, d:, :, :].sum() == 0  # zero padding


def test_int16_and_scaling(volumes):
    d = tempfile.mkdtemp()
    vol = (np.random.default_rng(1).random((10, 10, 10)) * 1000).astype(np.int16)
    p = os.path.join(d, "i16.nii.gz")
    save_nifti(p, vol)
    codec = VolCodec((10, 10, 10))
    out = codec.decode_batch([p])
    np.testing.assert_allclose(out[0], vol.astype(np.float32), rtol=1e-6)


def test_parallel_speedup_smoke(volumes):
    """Throughput sanity: decoding 24 gz volumes threaded shouldn't be slower
    than 2x the python fallback on the same files."""
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(2)
    paths = []
    for i in range(24):
        vol = rng.random((64, 64, 64)).astype(np.float32)
        p = os.path.join(d, f"big{i}.nii.gz")
        save_nifti(p, vol)
        paths.append(p)
    codec = VolCodec((64, 64, 64), n_threads=8)
    codec.decode_batch(paths[:2])  # warm up threads / page cache
    # best-of-2 on both paths: a loaded CI host (another suite saturating
    # the cores) can otherwise starve the thread pool on a single draw
    native_t = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = codec.decode_batch(paths)
        native_t = min(native_t, time.time() - t0)

    from brainfm_tpu.utils.nifti import load_nifti

    # equal-work python baseline: the codec's contract is a PADDED
    # C-ORDER float32 arena (what SubjectBank ingests / device_put wants);
    # load_nifti alone returns a zero-copy F-order view, deferring the
    # transpose+pad the codec already performed
    py_t = float("inf")
    for _ in range(2):
        t0 = time.time()
        arena = np.zeros((24, 64, 64, 64), np.float32)
        for i, p in enumerate(paths):
            vol, _ = load_nifti(p)
            d, h, w = vol.shape
            arena[i, :d, :h, :w] = vol
        py_t = min(py_t, time.time() - t0)
    print(f"native {native_t*1e3:.0f} ms vs python(+pad) {py_t*1e3:.0f} ms")
    assert out.shape[0] == 24
    np.testing.assert_allclose(out, arena, rtol=1e-6)
    # native must not lose to the equal-work python path (headroom for
    # CI noise; on multi-core hosts the thread pool wins outright)
    assert native_t < py_t * 1.5


def _fake_subject_files(d, sid, shape, rng, gz=True):
    """One subject's file set: int labels, scalar images, dist/reg chans."""
    from brainfm_tpu.utils.nifti import save_nifti

    ext = ".nii.gz" if gz else ".nii"

    def w(name, arr):
        p = os.path.join(d, f"{sid}.{name}{ext}")
        save_nifti(p, arr)
        return p

    gen = rng.integers(0, 20, shape).astype(np.int16)
    t1 = (rng.random(shape) * 255).astype(np.float32)
    paths = {
        "gen": w("gen", gen),
        "seg": w("seg", gen.astype(np.int32)),
        "T1": w("T1", t1),
        "dist": [w(f"dist{k}", rng.random(shape).astype(np.float32) * 20)
                 for k in range(4)],
        "reg": [w(f"reg{a}", rng.random(shape).astype(np.float32) * 1e4)
                for a in range(3)],
    }
    return paths


def test_bank_ingest_native_parity():
    """VERDICT r2 #4: the codec is ROUTED — SubjectBank.add_many
    batch-decodes through volcodec and must produce subjects bit-identical
    to the per-file Python path (add_from_files), including dtypes,
    channel stacking, padding, and the effective-extent record."""
    from brainfm_tpu.synth.engine import SubjectBank

    assert build_native()
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(3)
    subj_paths = [
        _fake_subject_files(d, "s0", (30, 28, 26), rng, gz=True),
        _fake_subject_files(d, "s1", (26, 30, 22), rng, gz=False),
        # a subject LARGER than the bank shape: _pad must crop both paths
        _fake_subject_files(d, "s2", (40, 40, 40), rng, gz=True),
    ]
    bank_native = SubjectBank(bank_shape=(32, 32, 32))
    idxs = bank_native.add_many(subj_paths, ages=[None, 61.5, None])
    assert idxs == [0, 1, 2]

    bank_py = SubjectBank(bank_shape=(32, 32, 32))
    for paths, age in zip(subj_paths, [None, 61.5, None]):
        bank_py.add_from_files(paths, age=age)

    assert len(bank_native) == len(bank_py) == 3
    for sn, sp in zip(bank_native.subjects, bank_py.subjects):
        assert set(sn) == set(sp)
        for k in sp:
            assert sn[k].dtype == sp[k].dtype, k
            assert sn[k].shape == sp[k].shape, k
            np.testing.assert_array_equal(sn[k], sp[k], err_msg=k)


def test_bank_ingest_shape_mismatch_raises():
    from brainfm_tpu.synth.engine import SubjectBank

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(4)
    paths = _fake_subject_files(d, "bad", (20, 20, 20), rng)
    # swap in a T1 on a different grid
    from brainfm_tpu.utils.nifti import save_nifti

    p = os.path.join(d, "bad.T1_wrong.nii.gz")
    save_nifti(p, rng.random((21, 20, 20)).astype(np.float32))
    paths["T1"] = p
    bank = SubjectBank(bank_shape=(32, 32, 32))
    with pytest.raises(ValueError, match="share one native grid"):
        bank.add_many([paths])


def test_trailing_singleton_frame_rank_consistent():
    """A (D,H,W,1) NIfTI (dim[0]=4 with one frame — common from FSL/SPM
    writers) must decode to the SAME rank through the native batch path
    and the per-file Python path: both squeeze the singleton frame to 3-D
    (the native parse_header treats nframes=1 as plain 3-D; the Python
    ingest squeezes to match). True multi-frame files (>1 frames) keep
    their frames via the extras path."""
    from brainfm_tpu.synth.engine import SubjectBank

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(9)
    vol4 = rng.random((20, 22, 18, 1)).astype(np.float32)
    p = os.path.join(d, "s0.T1.nii.gz")
    save_nifti(p, vol4)

    bank_native = SubjectBank(bank_shape=(24, 24, 24))
    bank_native.add_many([{"T1": p}])
    bank_py = SubjectBank(bank_shape=(24, 24, 24))
    bank_py.add_from_files({"T1": p})

    a = bank_native.subjects[0]["T1"]
    b = bank_py.subjects[0]["T1"]
    assert a.shape == b.shape == (24, 24, 24)
    np.testing.assert_array_equal(a, b)


def test_partial_critic_checkpoint_refused(tmp_path):
    """A PARTIAL supervised_pathol_seg_ckp_path (one of {feat, task}
    missing) must refuse loudly instead of silently training against a
    half-random frozen critic (round-3 review finding)."""
    import pytest as _pytest

    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.models.build import build_critic_from_cfg

    feat = tmp_path / "feat.pth"
    feat.write_bytes(b"placeholder")  # existence is checked before loading
    cfg = AttrDict.from_nested({
        "tasks": ["T1"],
        "generator": {"size": [16, 16, 16]},
        "losses": {"implicit_pathol": True},
        "critic_f_maps": 8, "critic_num_levels": 2,
        "supervised_pathol_seg_ckp_path": {
            "feat": str(feat), "task": str(tmp_path / "missing.pth")},
    })
    with _pytest.raises(FileNotFoundError, match="missing.pth"):
        build_critic_from_cfg(cfg)
