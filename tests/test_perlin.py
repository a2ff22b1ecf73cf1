"""Property tests for the JAX Perlin stack (the reference implementation is
numpy with global RNG — bitwise match is impossible by design; we verify the
defining properties of ShapeID/perlin3d.py instead)."""

import numpy as np

import jax
import jax.numpy as jnp

from brainfm_tpu.ops import fractal_noise_3d, perlin_noise_3d, shape_3d, velocity_3d
from brainfm_tpu.ops import gradient_c


def test_perlin_shape_and_range():
    key = jax.random.PRNGKey(0)
    n = np.asarray(perlin_noise_3d(key, (16, 16, 16), (2, 2, 2)))
    assert n.shape == (16, 16, 16)
    assert np.abs(n).max() <= 1.0  # gradient noise bounded by ~0.87
    assert n.std() > 0.05


def test_perlin_zero_at_lattice_points():
    """Perlin noise vanishes at lattice corners (dot with zero offset)."""
    key = jax.random.PRNGKey(1)
    n = np.asarray(perlin_noise_3d(key, (16, 16, 16), (2, 2, 2)))
    lat = n[::8, ::8, ::8]
    np.testing.assert_allclose(lat, 0.0, atol=1e-5)


def test_perlin_tileable_axis0():
    key = jax.random.PRNGKey(2)
    n = np.asarray(perlin_noise_3d(key, (16, 16, 16), (2, 2, 2),
                                   tileable=(True, False, False)))
    # tileable axis wraps the gradient lattice: noise at lattice planes is zero
    np.testing.assert_allclose(n[::8][:, ::8, ::8], 0.0, atol=1e-5)


def test_fractal_octaves():
    key = jax.random.PRNGKey(3)
    n = np.asarray(fractal_noise_3d(key, (16, 16, 16), (2, 2, 2), octaves=2))
    assert n.shape == (16, 16, 16)


def test_shape_3d_percentile():
    key = jax.random.PRNGKey(4)
    mask, masked = shape_3d(key, (16, 16, 16), (2, 2, 2), 90.0)
    frac = float(jnp.mean(mask))
    assert 0.05 < frac < 0.15
    assert float(jnp.min(masked * mask)) >= float(jnp.percentile(masked, 1)) - 1e-6


def test_velocity_divergence_free():
    key = jax.random.PRNGKey(5)
    v = velocity_3d(key, (16, 16, 16), (2, 2, 2), 500.0)
    div = (gradient_c(v["Vx"])[..., 0] + gradient_c(v["Vy"])[..., 1]
           + gradient_c(v["Vz"])[..., 2])
    inner = np.asarray(div)[2:-2, 2:-2, 2:-2]
    mag = np.abs(np.asarray(v["Vx"])).mean()
    assert np.abs(inner).mean() < 0.5 * mag


def test_perlin_jit_under_vmap():
    keys = jax.random.split(jax.random.PRNGKey(6), 4)
    f = jax.jit(jax.vmap(lambda k: perlin_noise_3d(k, (8, 8, 8), (2, 2, 2))))
    out = f(keys)
    assert out.shape == (4, 8, 8, 8)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_percentile_nosort_vs_jnp():
    """shape_3d's sort-free threshold must agree with jnp.percentile to
    within one ulp of the lerp (the bracketing order statistics are
    bit-identical — verified below via exact ranks on ties — but XLA may
    contract the final mul+add into an fma differently per context, so
    the interpolated value itself is only 1-ulp-stable)."""
    import jax
    import jax.numpy as jnp
    from brainfm_tpu.ops.perlin import percentile_nosort

    rng = np.random.default_rng(3)
    cases = [
        rng.standard_normal(20 ** 3).astype(np.float32),        # continuous
        rng.integers(0, 7, 5000).astype(np.float32),            # heavy ties
        np.full(999, 2.5, np.float32),                          # all equal
        rng.standard_normal(4097).astype(np.float32) * 1e-6,    # near zero
    ]
    qs = [0.0, 3.7, 25.0, 50.0, 80.1234, 95.0, 97.3, 100.0]
    f = jax.jit(lambda x, q: percentile_nosort(x, q))
    for x in cases:
        xj = jnp.asarray(x)
        for q in qs:
            want = np.asarray(jnp.percentile(xj, jnp.float32(q)))
            got = np.asarray(f(xj, jnp.float32(q)))
            lo = np.nextafter(want, -np.inf)
            hi = np.nextafter(want, np.inf)
            assert lo <= got <= hi, f"q={q} n={x.size}: {got} vs {want}"
            # exact order stats => exact result at integral ranks
            if float(jnp.float32(q) / 100 * (x.size - 1)).is_integer():
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"q={q} n={x.size}")
