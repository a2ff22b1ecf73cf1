"""Fused (single-dispatch scan) tiled inference vs the per-tile loop."""

import numpy as np

import jax
import jax.numpy as jnp

from brainfm_tpu.infer.tiles import tile_plan, tiled_apply, tiled_apply_fused


def _toy_apply_p(params, tile):
    """Cheap stand-in with a real parameter argument and two heads."""
    x = tile[..., 0] * params["scale"]
    return {"a": (x * 2.0)[..., None],
            "b": jnp.stack([x + 1.0, x - 1.0], axis=-1)}


def test_fused_matches_loop():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((40, 40, 40)), jnp.float32)
    kw = dict(stride=(16, 16, 16), win_size=(32, 32, 32))
    params = {"scale": jnp.float32(1.5)}
    ref = tiled_apply(_toy_apply_p, params, vol, **kw)
    out = tiled_apply_fused(_toy_apply_p, params, vol, **kw,
                            accum_dtype=jnp.float32)
    assert sorted(out) == sorted(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5)
    # default bf16 accumulation stays within ~1% of exact blending
    out16 = tiled_apply_fused(_toy_apply_p, params, vol, **kw)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out16[k]), np.asarray(ref[k]),
                                   rtol=0.02, atol=0.02)


def test_tile_plan_covers_volume():
    tiles, cnt = tile_plan((50, 40, 33), stride=(16, 16, 16),
                           win_size=(32, 32, 32))
    assert cnt.min() >= 1  # every voxel covered
    for (xs, xe), (ys, ye), (zs, ze) in tiles:
        assert (xe - xs, ye - ys, ze - zs) == (32, 32, 32)  # uniform windows
