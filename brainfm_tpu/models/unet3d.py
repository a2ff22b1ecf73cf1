"""3-D UNet backbone family.

Capability parity with the reference backbone
(/root/reference/Trainer/models/unet3d/model.py:116-272 and
buildingblocks.py:7-393): geometric f_maps progression, `layer_order`-driven
block construction (default 'gcl' = GroupNorm -> Conv -> LeakyReLU), bias-free
convs when normalized, DoubleConv halving rule, max-pool downsampling,
nearest-upsample + concat decoding, `get_feature` returning every decoder
level, and the shared-encoder/dual-decoder UNet3DSep variant.

TPU design: flax.linen modules in channels-last NDHWC layout (the MXU-native
conv layout), bf16-compute/fp32-param policy via the `compute_dtype` field.
The torch checkpoint importer (models/torch_import.py) maps the reference's
NCDHW state dict onto these parameter trees.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import ad_checkpoint as _adc
from flax import linen as nn


def feature_maps(f_maps: int, num_levels: int) -> list[int]:
    """Geometric channel progression (parity: unet3d/utils.py
    `number_of_features_per_level`)."""
    return [f_maps * 2 ** k for k in range(num_levels)]


def _num_groups(channels: int, num_groups: int) -> int:
    # parity: buildingblocks.py:55-59
    if channels < num_groups:
        return 1
    assert channels % num_groups == 0, (channels, num_groups)
    return num_groups


class SingleConv(nn.Module):
    """One `layer_order` unit (parity: buildingblocks.py:78-101)."""

    out_channels: int
    order: str = "gcl"
    num_groups: int = 8
    kernel_size: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True

    @nn.compact
    def __call__(self, x):
        order = self.order
        assert "c" in order
        ndim = 3 if self.is_3d else 2
        for i, ch in enumerate(order):
            if ch == "c":
                bias = not ("g" in order or "b" in order)
                x = nn.Conv(self.out_channels, (self.kernel_size,) * ndim,
                            padding="SAME", use_bias=bias, name="conv",
                            dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
                # named for the 'save_convs' remat policy (see _remat_block)
                x = _adc.checkpoint_name(x, "conv_out")
            elif ch == "g":
                groups = _num_groups(x.shape[-1], self.num_groups)
                x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="groupnorm",
                                 dtype=self.compute_dtype,
                                 param_dtype=jnp.float32)(x)
            elif ch == "b":
                x = nn.BatchNorm(use_running_average=True, name="batchnorm",
                                 dtype=self.compute_dtype,
                                 param_dtype=jnp.float32)(x)
            elif ch == "l":
                x = nn.leaky_relu(x, negative_slope=0.01)
            elif ch == "r":
                x = nn.relu(x)
            elif ch == "e":
                x = nn.elu(x)
            else:
                raise ValueError(f"unsupported layer type {ch}")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs with the encoder halving rule
    (parity: buildingblocks.py:104-150)."""

    out_channels: int
    encoder: bool
    order: str = "gcl"
    num_groups: int = 8
    kernel_size: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.encoder:
            conv1_out = max(self.out_channels // 2, in_ch)
        else:
            conv1_out = self.out_channels
        x = SingleConv(conv1_out, self.order, self.num_groups, self.kernel_size,
                       self.compute_dtype, self.is_3d, name="SingleConv1")(x)
        x = SingleConv(self.out_channels, self.order, self.num_groups,
                       self.kernel_size, self.compute_dtype, self.is_3d,
                       name="SingleConv2")(x)
        return x


def _remat_block(remat):
    """DoubleConv with the configured rematerialization mode.

    remat=False: save everything (fastest backward, most memory).
    remat=True/'full': recompute the whole block in the backward pass —
    O(levels) activation memory but re-runs the convs, the MXU-bound ops
    that dominate step FLOPs.
    remat='save_convs': keep only the named conv outputs and recompute the
    HBM-bound GroupNorm/activation chain — the TPU-native middle ground
    (convs are compute-bound and expensive to redo; normalization and
    leaky-relu recompute at memory speed)."""
    if not remat:
        return DoubleConv
    if remat == "save_convs":
        return nn.remat(DoubleConv,
                        policy=jax.checkpoint_policies.save_only_these_names(
                            "conv_out"))
    if remat is not True and remat != "full":
        raise ValueError(
            f"unknown remat mode {remat!r}: expected False, True/'full', "
            "or 'save_convs'")
    return nn.remat(DoubleConv)


def _max_pool(x, window: int, is_3d: bool):
    ndim = 3 if is_3d else 2
    return nn.max_pool(x, (window,) * ndim, strides=(window,) * ndim)


def _replicate_if_degenerate(x, is_3d: bool):
    """Force full replication of spatially-degenerate deep-level tensors.

    When the volume is sharded over the mesh 'space' axis (GSPMD spatial
    partitioning — the conv-halo 'context parallel' analog of the
    reference's tiled inference), the deep UNet levels shrink below the
    shard count. Degenerate sharding (per-shard extent < 2 voxels, or a
    non-divisible extent) is BOTH wasted communication (the tensors are
    KB-scale) and numerically broken in the current partitioner: XLA's
    shard-padding produces wrong losses/gradients (measured jax 0.9 CPU,
    fp64: GroupNorm grads 4x overcounted at extent 2 over 4 shards;
    decoder conv grads dropped to exact ZERO at 3 voxels/shard at 48^3 —
    hence the conservative per-shard >= 4 threshold;
    tests/test_flagship_l6.py guards the fix). Replicating deep levels
    keeps all collectives at the cheap small-tensor levels and restores
    exactness; with no ambient mesh (single chip / pure jit) this is a
    no-op. Callers enable it by wrapping the jitted step in
    `jax.sharding.set_mesh(mesh)` (see parallel/mesh.py)."""
    spatial = x.shape[1:4] if is_3d else x.shape[1:3]
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is None or not dict(am.shape):
            return x
        n = dict(am.shape).get("space", 1)
        if n <= 1:
            return x
        e = min(spatial)
        if e % n != 0 or e // n < 4:
            return jax.lax.with_sharding_constraint(
                x, jax.sharding.PartitionSpec(*([None] * x.ndim)))
    except Exception:
        return x
    return x


def _nearest_upsample_to(x, target_spatial):
    """F.interpolate(mode='nearest') parity: index floor(i * in/out).

    For tgt in {2*src, 2*src-1} the floor-index pattern equals
    repeat-each-twice (then crop) — a broadcast/reshape instead of the
    gather `take` lowers to on TPU (25 ms -> ~3 ms per 80->160 x128ch
    upsample, measured v5e 2026-08-16). Other ratios keep the take."""
    for axis, tgt in enumerate(target_spatial):
        src = x.shape[axis + 1]
        if src == tgt:
            continue
        if tgt in (2 * src, 2 * src - 1):
            x = jnp.repeat(x, 2, axis=axis + 1)
            if tgt != 2 * src:
                x = jax.lax.slice_in_dim(x, 0, tgt, axis=axis + 1)
        else:
            idx = (jnp.arange(tgt) * src) // tgt
            x = jnp.take(x, idx, axis=axis + 1)
    return x


class _EncoderStack(nn.Module):
    f_maps: Sequence[int]
    order: str
    num_groups: int
    pool_kernel: int
    compute_dtype: jnp.dtype
    is_3d: bool = True
    remat: bool | str = False

    @nn.compact
    def __call__(self, x):
        block = _remat_block(self.remat)
        feats = []
        for i, out_ch in enumerate(self.f_maps):
            if i > 0:
                x = _max_pool(x, self.pool_kernel, self.is_3d)
                x = _replicate_if_degenerate(x, self.is_3d)
            x = block(out_ch, encoder=True, order=self.order,
                      num_groups=self.num_groups,
                      compute_dtype=self.compute_dtype, is_3d=self.is_3d,
                      name=f"encoder{i}")(x)
            feats.insert(0, x)
        return feats  # deepest first (parity: model.py:171-181)


class _DecoderStack(nn.Module):
    f_maps: Sequence[int]
    order: str
    num_groups: int
    compute_dtype: jnp.dtype
    is_3d: bool = True
    prefix: str = "decoder"
    remat: bool | str = False

    @nn.compact
    def __call__(self, x, skips):
        block = _remat_block(self.remat)
        outs = []
        rev = list(reversed(self.f_maps))
        for i, out_ch in enumerate(rev[1:]):
            enc = skips[i]
            x = _nearest_upsample_to(x, enc.shape[1:-1])
            x = jnp.concatenate([enc, x], axis=-1)
            x = _replicate_if_degenerate(x, self.is_3d)
            x = block(out_ch, encoder=False, order=self.order,
                      num_groups=self.num_groups,
                      compute_dtype=self.compute_dtype, is_3d=self.is_3d,
                      name=f"{self.prefix}{i}")(x)
            outs.append(x)
        return x, outs


class UNet3D(nn.Module):
    """(parity: model.py:213-232; defaults from cfgs/trainer/default_train.yaml:126-130)"""

    f_maps: int = 64
    num_levels: int = 5
    layer_order: str = "gcl"
    num_groups: int = 8
    is_unit_vector: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    is_3d: bool = True
    remat: bool | str = False  # False | True/'full' | 'save_convs' (see _remat_block)

    def setup(self):
        fm = feature_maps(self.f_maps, self.num_levels)
        self.encoders = _EncoderStack(fm, self.layer_order, self.num_groups, 2,
                                      self.compute_dtype, self.is_3d,
                                      remat=self.remat)
        self.decoders = _DecoderStack(fm, self.layer_order, self.num_groups,
                                      self.compute_dtype, self.is_3d,
                                      remat=self.remat)

    def __call__(self, x):
        feats = self.get_feature(x)
        return feats[-1]

    def get_feature(self, x):
        """Returns [bottleneck, dec_level1, ..., final] — every decoder level
        (parity: model.py:195-209)."""
        enc_feats = self.encoders(x)
        x = enc_feats[0]
        skips = enc_feats[1:]
        out, dec_feats = self.decoders(x, skips)
        feats = [enc_feats[0]] + dec_feats
        if self.is_unit_vector:
            norm = jnp.linalg.norm(feats[-1], axis=-1, keepdims=True)
            feats[-1] = feats[-1] / jnp.maximum(norm, 1e-12)
        return feats


class UNet3DSep(nn.Module):
    """Shared encoder + normal/pathology decoders
    (parity: model.py:8-112,235-254)."""

    f_maps: int = 64
    num_levels: int = 5
    layer_order: str = "gcl"
    num_groups: int = 8
    is_unit_vector: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool | str = False

    def setup(self):
        fm = feature_maps(self.f_maps, self.num_levels)
        self.encoders = _EncoderStack(fm, self.layer_order, self.num_groups, 2,
                                      self.compute_dtype, remat=self.remat)
        self.decoders_normal = _DecoderStack(fm, self.layer_order,
                                             self.num_groups, self.compute_dtype,
                                             prefix="decoder_normal",
                                             remat=self.remat)
        self.decoders_pathol = _DecoderStack(fm, self.layer_order,
                                             self.num_groups, self.compute_dtype,
                                             prefix="decoder_pathol",
                                             remat=self.remat)

    def __call__(self, x):
        feats = self.get_feature(x)
        return {"normal": feats["normal"][-1], "pathology": feats["pathology"][-1]}

    def get_feature(self, x):
        enc_feats = self.encoders(x)
        bottleneck = enc_feats[0]
        skips = enc_feats[1:]
        _, dec_n = self.decoders_normal(bottleneck, skips)
        _, dec_p = self.decoders_pathol(bottleneck, skips)
        feats_n = [bottleneck] + dec_n
        feats_p = [bottleneck] + dec_p
        if self.is_unit_vector:
            for feats in (feats_n, feats_p):
                norm = jnp.linalg.norm(feats[-1], axis=-1, keepdims=True)
                feats[-1] = feats[-1] / jnp.maximum(norm, 1e-12)
        return {"normal": feats_n, "pathology": feats_p}


class UNet2D(UNet3D):
    """(parity: model.py:257-272)"""

    is_3d: bool = False
