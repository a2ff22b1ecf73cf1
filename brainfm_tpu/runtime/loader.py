"""ctypes binding for the native volume codec (volcodec.cpp) with a
pure-python fallback (utils/nifti.py). Builds on first use with g++."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvolcodec.so")
_LIB = None


def build_native(force: bool = False) -> bool:
    src = os.path.join(_DIR, "volcodec.cpp")
    if os.path.isfile(_SO) and not force \
            and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-lz", "-lpthread", "-o", _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print("volcodec native build failed:", getattr(e, "stderr", e))
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.isfile(_SO) and not build_native():
        return None
    lib = ctypes.CDLL(_SO)
    lib.volcodec_init.argtypes = [ctypes.c_int]
    lib.volcodec_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int)]
    lib.volcodec_decode_batch.restype = ctypes.c_int
    lib.volcodec_decode_one.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64]
    lib.volcodec_decode_one.restype = ctypes.c_int
    lib.volcodec_decode_batch_ex.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64)]
    lib.volcodec_decode_batch_ex.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class VolCodec:
    """Parallel NIfTI batch decoder into a fixed-shape float32 arena."""

    def __init__(self, bank_shape, n_threads: int = 8):
        self.bank_shape = tuple(int(s) for s in bank_shape)
        self.lib = _load()
        if self.lib is not None:
            self.lib.volcodec_init(n_threads)

    def decode_batch(self, paths) -> np.ndarray:
        """Decode `paths` into (N, *bank_shape) float32 (zero padded)."""
        n = len(paths)
        arena = np.zeros((n, *self.bank_shape), np.float32)
        if self.lib is None:  # pure-python fallback
            from ..utils.nifti import load_nifti

            for i, p in enumerate(paths):
                vol, _ = load_nifti(p)
                vol = np.asarray(vol, np.float32)
                while vol.ndim > 3:  # frame 0, matching the native path
                    vol = vol[..., 0]
                sl = tuple(slice(0, min(a, b))
                           for a, b in zip(vol.shape[:3], self.bank_shape))
                arena[i][sl] = vol[sl]
            return arena
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        status = (ctypes.c_int * n)()
        ret = self.lib.volcodec_decode_batch(
            c_paths, n, arena.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            *self.bank_shape, status)
        if ret != 0:
            bad = [(paths[i], status[i]) for i in range(n) if status[i] != 0]
            raise IOError(f"volcodec decode failures: {bad}")
        return arena

    def decode_batch_with_shapes(self, paths):
        """Batch-decode `paths` into (N, *bank_shape) float32 plus each
        file's NATIVE (pre-pad) 3-D extent — what SubjectBank needs to
        validate grids and record the effective extent. Files the native
        codec can't take (non-NIfTI suffix, multi-frame, unsupported dtype)
        fall back to the Python reader per file; a hard read failure still
        raises. Returns (arena, shapes: list[tuple[int, int, int]],
        extras: {i: full ndarray} for files with trailing dims beyond 3-D —
        those keep their frames (arena row i is then unused), matching the
        Python ingest path's trailing-dim-preserving `_pad`)."""
        from ..utils.nifti import load_nifti

        n = len(paths)
        arena = np.zeros((n, *self.bank_shape), np.float32)
        shapes: list = [None] * n
        extras: dict = {}
        fallback = list(range(n))
        if self.lib is not None:
            nii = [i for i, p in enumerate(paths)
                   if p.endswith((".nii", ".nii.gz"))]
            if nii:
                c_paths = (ctypes.c_char_p * len(nii))(
                    *[paths[i].encode() for i in nii])
                status = (ctypes.c_int * len(nii))()
                dims = np.zeros((len(nii), 4), np.int64)
                # decode straight into the arena when every file is
                # native-eligible (the common case) — a separate staging
                # buffer would transiently hold a second full-batch copy
                # (~3x peak at real-dataset scale)
                all_nii = len(nii) == n
                sub = arena if all_nii else \
                    np.zeros((len(nii), *self.bank_shape), np.float32)
                self.lib.volcodec_decode_batch_ex(
                    c_paths, len(nii),
                    sub.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    *self.bank_shape, status,
                    dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
                ok_set = set()
                for j, i in enumerate(nii):
                    if status[j] == 0:
                        if not all_nii:
                            arena[i] = sub[j]
                        shapes[i] = tuple(int(d) for d in dims[j, :3])
                        ok_set.add(i)
                if not all_nii:
                    del sub
                fallback = [i for i in range(n) if i not in ok_set]
        for i in fallback:
            vol, _ = load_nifti(paths[i])
            vol = np.asarray(vol, np.float32)
            # trailing singleton frames are a 3-D volume (dim[0]=4 with
            # dim[4]=1, common from FSL/SPM writers): squeeze so the
            # fallback rank matches the native path, which treats
            # nframes=1 as 3-D (volcodec.cpp parse_header)
            while vol.ndim > 3 and vol.shape[-1] == 1:
                vol = vol[..., 0]
            shapes[i] = tuple(int(s) for s in vol.shape[:3])
            if vol.ndim > 3:
                extras[i] = vol
                continue
            # the native codec may have partially written this row before
            # failing — restore the zero padding before the slice write
            arena[i].fill(0)
            sl = tuple(slice(0, min(a, b))
                       for a, b in zip(vol.shape[:3], self.bank_shape))
            arena[i][sl] = vol[sl]
        return arena, shapes, extras
