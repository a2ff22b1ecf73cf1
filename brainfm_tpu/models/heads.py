"""Task heads.

Parity with the reference heads (/root/reference/Trainer/models/head.py):
`TaskHead` = optional 3x3 ConvBlock stack + one 1x1 conv per named output,
plus the pooled-FC chain for scalar outputs (age, head.py:42-50,60-66);
`DepHead` concatenates the input image as an extra channel (head.py:70-101).
The reference's MultiInput* variants (Python loops over augmented samples)
are unnecessary here — samples are stacked on the batch axis and the head is
applied once.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """3x3 conv + LeakyReLU(0.2) (parity: head.py:152-167)."""

    out_channels: int
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True

    @nn.compact
    def __call__(self, x):
        ndim = 3 if self.is_3d else 2
        x = nn.Conv(self.out_channels, (3,) * ndim, padding="SAME", use_bias=True,
                    name="main", dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class _Conv1x1Params(nn.Module):
    """Parameter container for one named final 1x1 conv.

    Declares exactly the params an `nn.Conv(features, (1,)*ndim)` would
    (same path, shape, dtype, and default inits -> bit-identical random
    init and checkpoint/torch-import compatibility), but the compute is
    done ONCE for all named outputs, fused (see _fused_final_convs): on
    TPU each separate 1x1 head conv re-reads the full level-0 feature map
    from HBM (8.7 ms each at 220^3x64 bf16, traced), so 8 heads cost ~65 ms
    where one fused channel-contraction costs one read."""

    features: int
    in_features: int
    ndim: int

    @nn.compact
    def __call__(self):
        kshape = (1,) * self.ndim + (self.in_features, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


def _fused_final_convs(x, out_channels, ndim, compute_dtype):
    """All positive-width named 1x1 convs as ONE channel contraction.

    Exact: a 1x1 conv is a matmul over the channel axis, and output
    channels are independent, so concatenating the per-name kernels along
    cout and slicing the result equals running each conv separately."""
    pos = [(name, int(n)) for name, n in out_channels.items() if n > 0]
    if not pos:
        return {}
    in_ch = x.shape[-1]
    kernels, biases = [], []
    for name, n in pos:
        k, b = _Conv1x1Params(n, in_ch, ndim, name=f"final_conv_{name}")()
        kernels.append(k.reshape(in_ch, n))
        biases.append(b)
    w = jnp.concatenate(kernels, axis=-1).astype(compute_dtype)
    b = jnp.concatenate(biases, axis=-1).astype(compute_dtype)
    y = jax.lax.dot_general(x.astype(compute_dtype), w,
                            (((x.ndim - 1,), (0,)), ((), ()))) + b
    out, off = {}, 0
    for name, n in pos:
        out[name] = y[..., off:off + n]
        off += n
    return out


class TaskHead(nn.Module):
    """(parity: head.py:18-67). out_channels: {name: n}; n>0 -> 1x1 conv,
    n<0 -> pooled FC scalar head of width -n."""

    f_maps_list: tuple
    out_channels: Dict[str, int]
    size: tuple = (160, 160, 160)
    out_feat_level: int = -1
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True

    @nn.compact
    def __call__(self, feats):
        x = feats[self.out_feat_level]
        for i, out_ch in enumerate(list(self.f_maps_list)[1:]):
            x = ConvBlock(out_ch, self.compute_dtype, self.is_3d,
                          name=f"layer{i}")(x)
        ndim = 3 if self.is_3d else 2
        out = _fused_final_convs(x, self.out_channels, ndim,
                                 self.compute_dtype)
        for name, n in self.out_channels.items():
            if n < 0:  # scalar output (age) — parity: head.py:42-50,60-66
                y = nn.max_pool(x, (4,) * ndim, strides=(4,) * ndim)
                y = ConvBlock(16, self.compute_dtype, self.is_3d,
                              name=f"pool_conv1_{name}")(y)
                y = nn.max_pool(y, (4,) * ndim, strides=(4,) * ndim)
                y = ConvBlock(4, self.compute_dtype, self.is_3d,
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


class DepHead(nn.Module):
    """Contrast-dependent head: concat the input image to the feature map
    (parity: head.py:70-101)."""

    f_maps_list: tuple
    out_channels: Dict[str, int]
    out_feat_level: int = -1
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True

    @nn.compact
    def __call__(self, feats, image):
        x = jnp.concatenate([feats[self.out_feat_level], image], axis=-1)
        for i, out_ch in enumerate(list(self.f_maps_list)[1:]):
            x = ConvBlock(out_ch, self.compute_dtype, self.is_3d,
                          name=f"layer{i}")(x)
        ndim = 3 if self.is_3d else 2
        return _fused_final_convs(x, self.out_channels, ndim,
                                  self.compute_dtype)
