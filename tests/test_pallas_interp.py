"""Pallas gather-interpolate kernel vs the XLA-gather reference path.

Runs in interpret mode on CPU (conftest pins the cpu platform); the same
kernel compiles natively on TPU via Mosaic (exercised by bench.py and the
TPU drive scripts).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brainfm_tpu.ops.interp import trilinear3d
from brainfm_tpu.ops.pallas_interp import pallas_trilinear3d, trilinear3d_auto


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.random((20, 24, 28)), jnp.float32)
    coords = [jnp.asarray(rng.uniform(-3, hi + 3, (11, 9, 5)), jnp.float32)
              for hi in (20, 24, 28)]
    return vol, coords


def test_matches_xla_path(data):
    vol, (ii, jj, kk) = data
    ref = trilinear3d(vol, ii, jj, kk, default=0.0)
    out = pallas_trilinear3d(vol, ii, jj, kk, default=0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_default_value_out_of_bounds(data):
    vol, (ii, jj, kk) = data
    out = pallas_trilinear3d(vol, ii - 100.0, jj, kk, default=3.5,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), 3.5)


def test_ragged_sizes(data):
    """Coordinate counts that don't divide the tile are padded internally."""
    vol, (ii, jj, kk) = data
    iif = ii.reshape(-1)[:123]
    jjf = jj.reshape(-1)[:123]
    kkf = kk.reshape(-1)[:123]
    ref = trilinear3d(vol, iif, jjf, kkf)
    out = pallas_trilinear3d(vol, iif, jjf, kkf, interpret=True)
    assert out.shape == (123,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_auto_falls_back_on_cpu(data):
    """On CPU (no Mosaic), trilinear3d_auto must route to the XLA path."""
    vol, (ii, jj, kk) = data
    ref = trilinear3d(vol, ii, jj, kk)
    out = trilinear3d_auto(vol, ii, jj, kk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
