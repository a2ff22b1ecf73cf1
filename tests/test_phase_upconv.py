"""Exactness of the decoder phase-upconv rewrite (models/unet3d.py
_phase_upconv): the level-0 decoder conv computed as skip-conv + ONE wide
coarse conv + depth-to-space must equal the plain 3x3x3 conv in values AND
gradients. Rationale: this chip runs narrow-output convs at <half MXU rate
(scripts/roofline.py --convprobe), so the flagship's f_maps=64 decoder
convs are rewritten to 8*cout-wide coarse convs; the reference computes
the plain conv (unet3d/model.py:116-209) — cuDNN has no narrow-N penalty.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from brainfm_tpu.models import unet3d as u3


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _repeat2(z):
    return jnp.repeat(jnp.repeat(jnp.repeat(z, 2, 1), 2, 2), 2, 3)


def test_phase_upconv_matches_plain_conv_fwd_and_grad():
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((1, 12, 12, 12, 16)))
    z = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 32)))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 48, 8)))
    dn = ("NDHWC", "DHWIO", "NDHWC")
    w = jnp.asarray(rng.standard_normal((1, 12, 12, 12, 8)))

    def loss(enc, z, k, fast):
        x = jnp.concatenate([enc, _repeat2(z)], -1)
        y = (u3._phase_upconv(x, k, 16) if fast else
             lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                      dimension_numbers=dn))
        return jnp.sum(y * w), y

    (l_ref, y_ref), g_ref = jax.value_and_grad(
        loss, (0, 1, 2), has_aux=True)(enc, z, k, False)
    (l_f, y_f), g_f = jax.value_and_grad(
        loss, (0, 1, 2), has_aux=True)(enc, z, k, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-12)
    for a, b in zip(g_ref, g_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-9)


def test_unet_decoder_phase_path_matches_fallback(monkeypatch):
    """Whole-backbone equality: same params/input, phase rewrite active
    vs forced fallback (plain nn.Conv). Also asserts the rewrite actually
    engages at an even-sized input."""
    model = u3.UNet3D(f_maps=8, num_levels=3, num_groups=4,
                      layer_order="gcl", compute_dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16, 16, 16, 1)))
    params = model.init(jax.random.PRNGKey(0), x)
    # params are fp32 by policy; lift to fp64 so the equality criterion is
    # reassociation-free (fp32 params leave ~1e-7 rel noise in grads)
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)

    hits = []
    orig = u3._phase_pair_conv

    def counting(enc, z, kk):
        hits.append((enc.shape, z.shape))
        return orig(enc, z, kk)

    monkeypatch.setattr(u3, "_phase_pair_conv", counting)
    y_fast = model.apply(params, x)
    assert hits, "phase rewrite never engaged on an even-sized volume"
    # every decoder level is shape-eligible here (16->8->4, all exact 2x)
    # and under the cout<=256 cap: BOTH levels x 2 convs... the pair is
    # consumed by SingleConv1 only (its conv materializes the tensor), so
    # one engagement per level
    assert len(hits) == 2, hits

    monkeypatch.setattr(u3, "_space_sharded", lambda: True)
    y_plain = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_plain),
                               rtol=1e-11, atol=1e-10)

    def gsum(f):
        return jax.grad(lambda p: jnp.sum(f(p) ** 2))(params)

    monkeypatch.setattr(u3, "_space_sharded", lambda: False)
    g_fast = gsum(lambda p: model.apply(p, x))
    monkeypatch.setattr(u3, "_space_sharded", lambda: True)
    g_plain = gsum(lambda p: model.apply(p, x))
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-8)


def test_phase_path_skipped_on_odd_extents(monkeypatch):
    """Odd spatial extents (no exact 2x upsample) must take the plain
    conv — and still produce the right shapes end to end."""
    called = []
    monkeypatch.setattr(u3, "_phase_pair_conv",
                        lambda *a: called.append(1) or (_ for _ in ()).throw(
                            AssertionError("must not engage")))
    model = u3.UNet3D(f_maps=8, num_levels=3, num_groups=4,
                      layer_order="gcl", compute_dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 15, 17, 13, 1)))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 15, 17, 13, 8) and not called


@pytest.mark.parametrize("shape,channels", [
    ((2, 8, 8, 8, 64), 64),   # 3-D, 8 groups of 8
    ((2, 10, 10, 64), 64),    # 2-D UNet path
    ((1, 6, 6, 6, 4), 4),     # channels < num_groups -> 1 group
])
def test_fused_groupnorm_matches_flax(shape, channels):
    """_fused_groupnorm (sums + composite affine; used by SingleConv so the
    TPU backward never materializes the flax layer's f32 layout copy) must
    equal nn.GroupNorm in values and grads at fp64.

    TOLERANCE NOTE (keep when refactoring): these bounds hold at fp64 —
    and fp32 — ONLY. Under bf16 AMP (the CLI default) _fgn_bwd/_pgn_bwd
    deliberately combine dx in the ACTIVATION dtype, so input grads carry
    bf16 coefficient rounding that flax's f32-stat autodiff would not;
    that is the documented trade that avoids the f32 layout copy
    (models/unet3d.py). Do not tighten these tests by running them at
    bf16 or they will flake on real rounding, not on a regression."""
    import flax.linen as nn

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape))
    s = jnp.asarray(rng.standard_normal((channels,)))
    b = jnp.asarray(rng.standard_normal((channels,)))
    w = jnp.asarray(rng.standard_normal(shape))
    groups = u3._num_groups(channels, 8)
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    params = {"params": {"scale": s, "bias": b}}

    def loss_ref(x, s, b):
        y = gn.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(y * w), y

    def loss_f(x, s, b):
        y = u3._fused_groupnorm(x, s, b, 8)
        return jnp.sum(y * w), y

    (l_r, y_r), g_r = jax.value_and_grad(loss_ref, (0, 1, 2),
                                         has_aux=True)(x, s, b)
    (l_f, y_f), g_f = jax.value_and_grad(loss_f, (0, 1, 2),
                                         has_aux=True)(x, s, b)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-10)
    for a, g in zip(g_r, g_f):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-8, atol=1e-8)


def test_pair_groupnorm_matches_materialized_flax_grads():
    """_pair_groupnorm's analytic vjp must equal autodiff of the
    materialized form (concat([enc, repeat2(z)]) -> nn.GroupNorm), with
    the coarse part's gradient correctly carrying the 8x repeat weight,
    at fp64."""
    import flax.linen as nn

    rng = np.random.default_rng(5)
    ce, cz = 16, 48
    enc = jnp.asarray(rng.standard_normal((2, 8, 8, 8, ce)))
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 4, cz)))
    s = jnp.asarray(rng.standard_normal((ce + cz,)))
    b = jnp.asarray(rng.standard_normal((ce + cz,)))
    w = jnp.asarray(rng.standard_normal((2, 8, 8, 8, ce + cz)))
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)

    def loss_ref(enc, z, s, b):
        x = jnp.concatenate([enc, _repeat2(z)], -1)
        y = gn.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(y * w)

    def loss_pair(enc, z, s, b):
        eo, zo = u3._pair_groupnorm(enc, z, s, b, 8)
        y = jnp.concatenate([eo, _repeat2(zo)], -1)
        return jnp.sum(y * w)

    l_r, g_r = jax.value_and_grad(loss_ref, (0, 1, 2, 3))(enc, z, s, b)
    l_p, g_p = jax.value_and_grad(loss_pair, (0, 1, 2, 3))(enc, z, s, b)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-10)
    for a, g in zip(g_r, g_p):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-8, atol=1e-8)
