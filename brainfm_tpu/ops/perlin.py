"""3-D Perlin / fractal gradient noise, shapes, and divergence-free velocity.

Capability parity with the reference pathology-shape generator
(/root/reference/ShapeID/perlin3d.py:15-157), which runs in numpy on the
CPU — a real bottleneck the survey calls out. Re-designed as pure JAX on
device: same gradient-lattice construction and quintic-fade trilerp, driven
by jax.random keys instead of global numpy state. Percentile thresholding
uses jnp.percentile (exact parity with np.percentile's linear
interpolation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fd import curl_3d


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin_noise_3d(key, shape, res, tileable=(False, False, False)):
    """Gradient noise on `shape` with `res` lattice periods per axis
    (parity: perlin3d.py:15-90). shape must be a multiple of res."""
    shape = tuple(int(s) for s in shape)
    res = tuple(int(r) for r in res)
    d = tuple(shape[i] // res[i] for i in range(3))

    # local cell coordinates in [0,1) per voxel
    gx = (jnp.arange(shape[0]) % d[0]) / d[0]
    gy = (jnp.arange(shape[1]) % d[1]) / d[1]
    gz = (jnp.arange(shape[2]) % d[2]) / d[2]
    grid = jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1)

    k1, k2 = jax.random.split(key)
    theta = 2 * jnp.pi * jax.random.uniform(k1, (res[0] + 1, res[1] + 1, res[2] + 1))
    phi = 2 * jnp.pi * jax.random.uniform(k2, (res[0] + 1, res[1] + 1, res[2] + 1))
    gradients = jnp.stack(
        (jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(phi)),
        axis=3)
    if tileable[0]:
        gradients = gradients.at[-1, :, :].set(gradients[0, :, :])
    if tileable[1]:
        gradients = gradients.at[:, -1, :].set(gradients[:, 0, :])
    if tileable[2]:
        gradients = gradients.at[:, :, -1].set(gradients[:, :, 0])

    g = jnp.repeat(jnp.repeat(jnp.repeat(gradients, d[0], 0), d[1], 1), d[2], 2)
    g000 = g[: -d[0], : -d[1], : -d[2]]
    g100 = g[d[0]:, : -d[1], : -d[2]]
    g010 = g[: -d[0], d[1]:, : -d[2]]
    g110 = g[d[0]:, d[1]:, : -d[2]]
    g001 = g[: -d[0], : -d[1], d[2]:]
    g101 = g[d[0]:, : -d[1], d[2]:]
    g011 = g[: -d[0], d[1]:, d[2]:]
    g111 = g[d[0]:, d[1]:, d[2]:]

    def ramp(offset, gcorner):
        rel = grid - jnp.asarray(offset, grid.dtype)
        return jnp.sum(rel * gcorner, axis=3)

    n000 = ramp((0, 0, 0), g000)
    n100 = ramp((1, 0, 0), g100)
    n010 = ramp((0, 1, 0), g010)
    n110 = ramp((1, 1, 0), g110)
    n001 = ramp((0, 0, 1), g001)
    n101 = ramp((1, 0, 1), g101)
    n011 = ramp((0, 1, 1), g011)
    n111 = ramp((1, 1, 1), g111)

    t = _fade(grid)
    n00 = n000 * (1 - t[..., 0]) + t[..., 0] * n100
    n10 = n010 * (1 - t[..., 0]) + t[..., 0] * n110
    n01 = n001 * (1 - t[..., 0]) + t[..., 0] * n101
    n11 = n011 * (1 - t[..., 0]) + t[..., 0] * n111
    n0 = (1 - t[..., 1]) * n00 + t[..., 1] * n10
    n1 = (1 - t[..., 1]) * n01 + t[..., 1] * n11
    return (1 - t[..., 2]) * n0 + t[..., 2] * n1


def fractal_noise_3d(key, shape, res, octaves=1, persistence=0.5, lacunarity=2,
                     tileable=(False, False, False)):
    """Octave sum (parity: perlin3d.py:94-141)."""
    noise = jnp.zeros(shape)
    frequency, amplitude = 1, 1.0
    for i in range(octaves):
        key, sub = jax.random.split(key)
        noise += amplitude * perlin_noise_3d(
            sub, shape,
            (frequency * res[0], frequency * res[1], frequency * res[2]), tileable)
        frequency *= lacunarity
        amplitude *= persistence
    return noise


def _order_stat(xf, rank, k=15):
    """rank-th (0-based, traced int32) order statistic of flat `xf` by
    value-space k+1-section: the answer lives in (lo, hi] with
    count(x <= lo) < rank+1 <= count(x <= hi); each pass tests k interior
    thresholds in ONE read of x (the compare fuses into the reduction)
    and shrinks the bracket ~(k+1)x, until lo and hi are adjacent floats.
    ~7 passes for f32 instead of the O(n log n) device sort — the
    while_loop's per-iteration overhead on this chip (~0.5 ms) is why
    plain bisection (~40 passes) is not used."""

    def cond(s):
        lo, hi, it = s
        return (jnp.nextafter(lo, hi) < hi) & (it < 60)

    ws = (jnp.arange(1, k + 1, dtype=xf.dtype)) / (k + 1)

    def body(s):
        lo, hi, it = s
        mids = lo + (hi - lo) * ws                         # (k,) in (lo,hi)
        cnts = jnp.sum((xf[:, None] <= mids[None, :]).astype(jnp.int32),
                       axis=0)
        ge = cnts >= rank + 1                              # monotone in mids
        hi_new = jnp.min(jnp.where(ge, mids, hi))
        lo_new = jnp.max(jnp.where(ge, lo, mids))
        # f32 rounding can make an extreme mid collide with the bracket
        # edge; the invariant still holds and the it-cap bounds the loop
        return lo_new, hi_new, it + 1

    lo0 = jnp.nextafter(jnp.min(xf), -jnp.inf)
    _, hi, _ = jax.lax.while_loop(cond, body, (lo0, jnp.max(xf), 0))
    return hi


def percentile_nosort(x, q):
    """Exact jnp.percentile(x, q, method='linear') without the device
    sort (32 ms for 160^3 on v5e; this is ~4 ms of reductions). Mirrors
    jax's arithmetic step for step (q/100, f32 rank, floor/ceil order
    stats, low*lw + high*hw lerp) so the result is bit-identical —
    tests/test_perlin.py asserts equality. Assumes no NaNs."""
    xf = x.reshape(-1)
    n = xf.size
    qq = (q / 100.0).astype(jnp.float32) * (n - 1)
    low = jnp.floor(qq)
    high = jnp.ceil(qq)
    hw = qq - low
    lw = 1.0 - hw
    low_i = jnp.clip(low, 0, n - 1).astype(jnp.int32)
    high_i = jnp.clip(high, 0, n - 1).astype(jnp.int32)
    v_low = _order_stat(xf, low_i)
    # high is low or low+1: a tie keeps v_low, else the next value up
    cnt_low = jnp.sum((xf <= v_low).astype(jnp.int32))
    nxt = jnp.min(jnp.where(xf > v_low, xf, jnp.inf))
    v_high = jnp.where((high_i == low_i) | (cnt_low >= high_i + 1),
                       v_low, nxt)
    return (v_low * lw + v_high * hw).astype(x.dtype)


def shape_3d(key, shape, perlin_res, percentile):
    """Percentile-thresholded noise shape (parity: perlin3d.py:144-146).
    Returns (mask, masked_noise). `percentile` may be traced."""
    noise = perlin_noise_3d(key, shape, perlin_res, tileable=(True, False, False))
    thres = percentile_nosort(noise, jnp.asarray(percentile))
    mask = (noise >= thres).astype(noise.dtype)
    return mask, noise * mask


def velocity_3d(key, shape, perlin_res, v_multiplier):
    """Divergence-free velocity as the curl of three noise potentials
    (parity: perlin3d.py:149-157). Returns dict Vx/Vy/Vz."""
    ka, kb, kc = jax.random.split(key, 3)
    a = perlin_noise_3d(ka, shape, perlin_res, tileable=(True, False, False))
    b = perlin_noise_3d(kb, shape, perlin_res, tileable=(True, False, False))
    c = perlin_noise_3d(kc, shape, perlin_res, tileable=(True, False, False))
    vx, vy, vz = curl_3d(a, b, c)
    return {"Vx": vx * v_multiplier, "Vy": vy * v_multiplier, "Vz": vz * v_multiplier}
