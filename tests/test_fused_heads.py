"""Exactness of the fused final-conv contraction in the task heads
(models/heads.py _fused_final_convs): all named 1x1 head convs run as ONE
channel contraction; must be (a) bit-identical in param structure AND
random init to the separate nn.Convs it replaced (checkpoint / torch-import
compatibility), and (b) exact in values at fp64.

Rationale: on TPU each separate 1x1 head conv re-reads the full level-0
feature map from HBM (~8.7 ms each at 220^3x64 bf16); the fused contraction
reads once — whole-volume 493 -> 411 ms measured (BASELINE.md). The
reference runs separate convs (Trainer/models/head.py:18-67).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from brainfm_tpu.models.heads import ConvBlock, DepHead, TaskHead


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


OUT = {"T1": 1, "segmentation": 7, "distance": 4, "registration": 3,
       "age": -16}


class _SeparateConvHead(nn.Module):
    """The pre-fusion TaskHead: one nn.Conv per named output (the structure
    the fused path must stay param- and value-compatible with)."""

    f_maps_list: tuple
    out_channels: dict
    compute_dtype: jnp.dtype = jnp.float64

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]
        for i, out_ch in enumerate(list(self.f_maps_list)[1:]):
            x = ConvBlock(out_ch, self.compute_dtype, True,
                          name=f"layer{i}")(x)
        out = {}
        for name, n in self.out_channels.items():
            if n > 0:
                out[name] = nn.Conv(n, (1, 1, 1), use_bias=True,
                                    name=f"final_conv_{name}",
                                    dtype=self.compute_dtype,
                                    param_dtype=jnp.float32)(x)
            else:
                y = nn.max_pool(x, (4,) * 3, strides=(4,) * 3)
                y = ConvBlock(16, self.compute_dtype, True,
                              name=f"pool_conv1_{name}")(y)
                y = nn.max_pool(y, (4,) * 3, strides=(4,) * 3)
                y = ConvBlock(4, self.compute_dtype, True,
                              name=f"pool_conv2_{name}")(y)
                y = y.reshape(y.shape[0], -1)
                y = nn.relu(nn.Dense(160, name=f"final_linear1_{name}",
                                     dtype=self.compute_dtype,
                                     param_dtype=jnp.float32)(y))
                y = nn.relu(nn.Dense(10, name=f"final_linear2_{name}",
                                     dtype=self.compute_dtype,
                                     param_dtype=jnp.float32)(y))
                y = nn.Dense(-n, name=f"final_linear3_{name}",
                             dtype=self.compute_dtype,
                             param_dtype=jnp.float32)(y)
                out[name] = jnp.squeeze(y, axis=1) if y.shape[1] == 1 else y
        return out


def _heads(dtype=jnp.float64):
    fused = TaskHead(f_maps_list=(6, 8), out_channels=OUT,
                     compute_dtype=dtype)
    sep = _SeparateConvHead(f_maps_list=(6, 8), out_channels=OUT,
                            compute_dtype=dtype)
    return fused, sep


def test_fused_head_param_tree_and_init_match_separate_convs():
    x = [jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 16, 6)))]
    fused, sep = _heads()
    p_f = fused.init(jax.random.PRNGKey(3), x)
    p_s = sep.init(jax.random.PRNGKey(3), x)
    flat_f = jax.tree_util.tree_flatten_with_path(p_f)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(p_s)[0]
    keys_f = {jax.tree_util.keystr(k) for k, _ in flat_f}
    keys_s = {jax.tree_util.keystr(k) for k, _ in flat_s}
    assert keys_f == keys_s
    by_key = {jax.tree_util.keystr(k): v for k, v in flat_s}
    for k, a in flat_f:
        ks = jax.tree_util.keystr(k)
        a, b = np.asarray(a), np.asarray(by_key[ks])
        assert a.shape == b.shape and a.dtype == b.dtype, ks
        np.testing.assert_array_equal(a, b, err_msg=ks)


def test_fused_head_values_match_separate_convs():
    rng = np.random.default_rng(1)
    x = [jnp.asarray(rng.standard_normal((2, 16, 16, 16, 6)))]
    fused, sep = _heads()
    params = sep.init(jax.random.PRNGKey(5), x)
    y_f = fused.apply(params, x)
    y_s = sep.apply(params, x)
    assert set(y_f) == set(y_s)
    for k in y_s:
        np.testing.assert_allclose(np.asarray(y_f[k]), np.asarray(y_s[k]),
                                   rtol=1e-12, atol=1e-12, err_msg=k)


def test_dephead_fused_matches_separate():
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 8, 5)))]
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)))
    out = {"bias_field_log": 1, "extra": 3}
    dep = DepHead(f_maps_list=(6, 8), out_channels=out,
                  compute_dtype=jnp.float64)
    params = dep.init(jax.random.PRNGKey(7), feats, img)
    y = dep.apply(params, feats, img)

    # reference: run each named conv separately from the SAME param tree
    x = jnp.concatenate([feats[-1], img], axis=-1)
    lay = params["params"]["layer0"]["main"]
    h = jax.lax.conv_general_dilated(
        x, jnp.asarray(lay["kernel"], jnp.float64), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    h = nn.leaky_relu(h + jnp.asarray(lay["bias"], jnp.float64),
                      negative_slope=0.2)
    for name, n in out.items():
        p = params["params"][f"final_conv_{name}"]
        k = jnp.asarray(p["kernel"], jnp.float64).reshape(h.shape[-1], n)
        ref = jnp.einsum("bdhwi,io->bdhwo", h, k) \
            + jnp.asarray(p["bias"], jnp.float64)
        np.testing.assert_allclose(np.asarray(y[name]), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12, err_msg=name)
