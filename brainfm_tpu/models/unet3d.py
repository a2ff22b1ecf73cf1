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

import functools
from typing import Sequence

import numpy as _np

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


# Per-dim phase map for the decoder up-branch conv rewrite (see
# _phase_upconv): _PHASE_MAP[p, d, m] == 1 iff a fine-grid 3-tap kernel
# offset d (0..2 <-> -1..1) lands on coarse offset m (0..2 <-> -1..1) for
# fine output phase p: floor((p + d - 1) / 2) == m - 1.
# Host constant (numpy, NOT jnp): a module-level jnp.asarray dispatches a
# device op at import, which initializes — and can die on — whatever
# backend is ambient in the importing process (it killed the round-4
# multichip gate's parent under a skewed libtpu before the gate's
# forced-CPU armor could engage). Converted at trace time in
# _phase_pair_conv; tests/test_import_safety.py guards the whole package.
_PHASE_MAP = _np.asarray(
    [[[1, 0, 0], [0, 1, 0], [0, 1, 0]],    # p = 0
     [[0, 1, 0], [0, 1, 0], [0, 0, 1]]],   # p = 1
    _np.float32)


def _phase_upconv(x, kernel, up_start):
    """3x3x3 SAME conv of `x` whose tail channels [up_start:] are an exact
    2x nearest-repeat of a coarse field — computed as skip-conv +
    ONE WIDE coarse conv + depth-to-space.

    Why: the flagship's level-0 decoder convs have cout = f_maps = 64,
    and this chip runs narrow-output convs at less than half the MXU rate
    (measured scripts/roofline.py --convprobe: 3^3 conv 192->64 32.5 TF/s,
    128->64 37 TF/s, vs 128->128 82 TF/s, 64->512 223 TF/s). Folding the
    8 fine output phases into channels turns the up-branch into a
    cin->8*cout conv at the coarse grid — wide enough to fill the MXU
    lanes — while the GroupNorm/activation layers before the conv are
    per-channel/pointwise, so they preserve the nearest-repeat structure
    the decoder concat produced and the tail can be recovered exactly by
    a stride-2 slice.

    Exactness: values match the plain conv up to fp reassociation (taps
    falling on the same coarse voxel are pre-summed in the folded
    kernel); gradients match too, because every backward quantity
    (input grad through the repeat, GroupNorm stat grads) only ever
    consumes per-cell SUMS of fine-grid cotangents, which is precisely
    what the transposed wide conv yields at the sliced positions.

    Equivalent reference computation: plain Conv3d over the
    upsample+concat (unet3d/model.py:116-209, buildingblocks.py:104-150);
    the reference has no analogous rewrite (cuDNN does not pay the
    narrow-channel penalty the MXU does).
    """
    s0 = up_start
    return _phase_pair_conv(x[..., :s0], x[:, ::2, ::2, ::2, s0:], kernel)


def _phase_pair_conv(enc, z, kernel):
    """conv3x3(concat([enc, nearest_up2(z)])) without ever materializing
    the upsample or the concat: skip-conv on `enc` + ONE wide phase-folded
    conv on the coarse `z` + depth-to-space. See _phase_upconv."""
    s0 = enc.shape[-1]
    ka, kb = kernel[..., :s0, :], kernel[..., s0:, :]
    dn = ("NDHWC", "DHWIO", "NDHWC")
    ya = jax.lax.conv_general_dilated(enc, ka, (1, 1, 1), "SAME",
                                      dimension_numbers=dn)
    m = jnp.asarray(_PHASE_MAP, kernel.dtype)
    # kb (3,3,3,ci,co) -> folded (3,3,3,ci, 2,2,2,co), phase-major tail
    kph = jnp.einsum("xyzio,pxa,qyb,rzc->abcipqro", kb, m, m, m)
    co = kb.shape[-1]
    kph = kph.reshape(*kph.shape[:4], 8 * co)
    yb = jax.lax.conv_general_dilated(z, kph, (1, 1, 1), "SAME",
                                      dimension_numbers=dn)
    b, dc, hc, wc = yb.shape[:4]
    # depth-to-space interleave, keeping the (r-phase, co) pair FUSED as
    # one 2*co minor dim: element order is identical to the split form
    # ((w,2co) row-major == (2w,co) row-major), but the materialized
    # transpose then has a lane-filling minor dim — the split form's
    # (2, co<=64) tail tiles at T(2,128) with 2x padding, which at
    # S=2 x 128^3 training cost a 2.00 GiB HLO temp for 1.00 GiB of data
    # (measured OOM dump, 2026-08-21)
    yb = yb.reshape(b, dc, hc, wc, 2, 2, 2 * co)
    yb = yb.transpose(0, 1, 4, 2, 5, 3, 6)
    yb = yb.reshape(b, 2 * dc, 2 * hc, 2 * wc, co)
    return ya + yb


def _space_sharded() -> bool:
    """True when an ambient mesh spatially shards the volume ('space'
    axis > 1). The phase-upconv rewrite is numerically exact but its
    backward (scatter of the stride-2 slice + depth-to-space reshapes)
    is mis-partitioned by the current GSPMD partitioner under spatial
    sharding (measured: conv-kernel grad rel-L2 0.89 vs unsharded at
    fp64, same class of bug _replicate_if_degenerate documents;
    re-verified 2026-08-19 with the multi-level pair formulation —
    forcing the pair path on under a space=4 mesh at fp64/32^3/L5
    diverges in the FORWARD loss itself, worst grad rel-L2 ~7) — fall
    back to the plain conv there.

    SCOPE: only shardings established via an ambient mesh
    (jax.sharding.set_mesh) are visible at trace time — jit-argument
    in_shardings are not. Every spatial entry point in this repo wraps
    its step in set_mesh (train/loop.py, infer/api.py, __graft_entry__);
    callers who jit with explicit spatial in_shardings instead MUST pass
    phase_upconv=False (cfg flag `phase_upconv: false`, threaded through
    build_backbone) or wrap in set_mesh."""
    try:
        am = jax.sharding.get_abstract_mesh()
        return am is not None and dict(am.shape).get("space", 1) > 1
    except Exception:
        return False


class _ConvParams(nn.Module):
    """Parameter container path/init-compatible with `nn.Conv(name=...)`:
    same ('kernel','bias') names, shapes, fp32 param dtype and default
    initializers, so checkpoints and the torch importer see no
    difference whichever conv implementation consumes them."""

    features: int
    in_features: int
    ksize: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.ksize, self.in_features, self.features),
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class _GNParams(nn.Module):
    """('scale','bias') container path/init-compatible with
    `nn.GroupNorm(name='groupnorm')`."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pair_groupnorm(enc, z, scale, bias, num_groups, eps=1e-5):
    """GroupNorm over the VIRTUAL concat([enc, nearest_up2(z)]) without
    materializing it: fine-grid sums over the repeated tail equal 8x the
    coarse sums, so the group statistics are computed exactly from the
    two parts, and the per-channel affine is applied to each part
    separately (GroupNorm is per-channel affine after stats, which is
    what keeps the tail's nearest-repeat structure intact for the phase
    conv that follows). Matches flax nn.GroupNorm semantics: stats in
    promote_types(x.dtype, float32), fast variance E[x^2]-E[x]^2,
    lax.rsqrt(var+eps).

    Analytic backward for the same reason as _fused_groupnorm: autodiff
    materializes lane-padded f32 copies/cotangents of the fine-grid part
    (GiB-scale at the training crops). Here the backward is four
    per-channel reductions (sum g, sum g*x per part) + (B,C) algebra +
    one coefficient-affine fusion per part, with the coarse part's sums
    carrying the 8x repeat weight (d/dz of s1 = 8, of s2 = 16z)."""
    out, _ = _pgn_fwd(enc, z, scale, bias, num_groups, eps)
    return out


def _pgn_fwd(enc, z, scale, bias, num_groups, eps):
    ce, cz = enc.shape[-1], z.shape[-1]
    c = ce + cz
    groups = _num_groups(c, num_groups)
    gsize = c // groups
    sdt = jnp.promote_types(enc.dtype, jnp.float32)
    e32, z32 = enc.astype(sdt), z.astype(sdt)
    n_fine = 1.0
    for s in enc.shape[1:4]:
        n_fine *= s
    se = jnp.sum(e32, axis=(1, 2, 3))
    se2 = jnp.sum(e32 * e32, axis=(1, 2, 3))
    sz = jnp.sum(z32, axis=(1, 2, 3)) * 8.0
    sz2 = jnp.sum(z32 * z32, axis=(1, 2, 3)) * 8.0
    s1 = jnp.concatenate([se, sz], axis=-1)     # (B, C) per-channel sums
    s2 = jnp.concatenate([se2, sz2], axis=-1)
    bsz = s1.shape[0]
    gmean = s1.reshape(bsz, groups, gsize).sum(-1) / (n_fine * gsize)
    gmean2 = s2.reshape(bsz, groups, gsize).sum(-1) / (n_fine * gsize)
    inv = jax.lax.rsqrt(gmean2 - gmean * gmean + eps)
    # per-channel composite affine: y = x*a + b
    a = (jnp.repeat(inv, gsize, axis=-1) * scale.astype(sdt)[None])
    b = (bias.astype(sdt)[None]
         - jnp.repeat(gmean * inv, gsize, axis=-1) * scale.astype(sdt)[None])
    shp = (bsz, 1, 1, 1, -1)
    enc_out = (e32 * a[:, :ce].reshape(shp)
               + b[:, :ce].reshape(shp)).astype(enc.dtype)
    z_out = (z32 * a[:, ce:].reshape(shp)
             + b[:, ce:].reshape(shp)).astype(z.dtype)
    return (enc_out, z_out), (enc, z, scale, gmean, inv)


def _pgn_bwd(num_groups, eps, res, g):
    ge, gz = g
    enc, z, scale, gmean, inv = res
    ce, cz = enc.shape[-1], z.shape[-1]
    c = ce + cz
    groups = _num_groups(c, num_groups)
    gsize = c // groups
    sdt = jnp.promote_types(enc.dtype, jnp.float32)
    n_fine = 1.0
    for s in enc.shape[1:4]:
        n_fine *= s
    N = n_fine * gsize
    bsz = enc.shape[0]
    s32 = scale.astype(sdt)
    # the only big work: two reductions per part (converts fuse in)
    u1e = jnp.sum(ge.astype(sdt), axis=(1, 2, 3))                    # (B,Ce)
    u2e = jnp.sum(ge.astype(sdt) * enc.astype(sdt), axis=(1, 2, 3))
    u1z = jnp.sum(gz.astype(sdt), axis=(1, 2, 3))                    # (B,Cz)
    u2z = jnp.sum(gz.astype(sdt) * z.astype(sdt), axis=(1, 2, 3))
    u1 = jnp.concatenate([u1e, u1z], axis=-1)
    u2 = jnp.concatenate([u2e, u2z], axis=-1)
    gmc = gmean.repeat(gsize, -1)
    invc = inv.repeat(gsize, -1)
    ctr = u2 - gmc * u1                      # (B,C) centered correlations
    dscale = jnp.sum(invc * ctr, axis=0)
    dbias = jnp.sum(u1, axis=0)
    inv3 = inv * inv * inv
    T = (s32[None] * ctr).reshape(bsz, groups, gsize).sum(-1)    # (B,G)
    W = (s32[None] * u1).reshape(bsz, groups, gsize).sum(-1)
    D1 = (-inv * W + T * gmean * inv3) / N   # dL/d(per-channel sum s1)
    D2 = (-0.5 * T * inv3) / N               # dL/d(per-channel sum s2)
    A = invc * s32[None]
    D1c = D1.repeat(gsize, -1)
    D2c = D2.repeat(gsize, -1)
    shp = (bsz, 1, 1, 1, -1)
    # combine in the part dtype — see _fgn_bwd for why f32 here would
    # re-materialize the very copies this vjp removes
    dte, dtz = enc.dtype, z.dtype
    de = (ge * A[:, :ce].reshape(shp).astype(dte)
          + enc * (2.0 * D2c[:, :ce]).reshape(shp).astype(dte)
          + D1c[:, :ce].reshape(shp).astype(dte))
    dz = (gz * A[:, ce:].reshape(shp).astype(dtz)
          + z * (16.0 * D2c[:, ce:]).reshape(shp).astype(dtz)
          + (8.0 * D1c[:, ce:]).reshape(shp).astype(dtz))
    return de, dz, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_pair_groupnorm.defvjp(
    lambda e, zz, s, b, ng, eps: _pgn_fwd(e, zz, s, b, ng, eps), _pgn_bwd)


def _fgn_stats(x, num_groups, eps):
    """Group statistics in sums form: (gmean, inv) of shape (B, groups),
    in promote_types(x.dtype, float32) — flax nn.GroupNorm semantics
    (stats promoted to f32, fast variance E[x^2]-E[x]^2, lax.rsqrt).
    The astype lives INSIDE the reductions so XLA fuses the convert
    instead of materializing an f32 copy of the activation."""
    c = x.shape[-1]
    groups = _num_groups(c, num_groups)
    gsize = c // groups
    sdt = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(sdt)
    axes = tuple(range(1, x.ndim - 1))
    n = 1.0
    for s in x.shape[1:-1]:
        n *= s
    s1 = jnp.sum(x32, axis=axes)          # (B, C) per-channel sums
    s2 = jnp.sum(x32 * x32, axis=axes)
    bsz = s1.shape[0]
    gmean = s1.reshape(bsz, groups, gsize).sum(-1) / (n * gsize)
    gmean2 = s2.reshape(bsz, groups, gsize).sum(-1) / (n * gsize)
    inv = jax.lax.rsqrt(gmean2 - gmean * gmean + eps)
    return gmean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_groupnorm(x, scale, bias, num_groups, eps=1e-5):
    """Single-tensor analog of _pair_groupnorm: flax `nn.GroupNorm` in
    sums + composite-per-channel-affine form (y = x*a + b with (B,C)
    coefficients), with an ANALYTIC backward. Semantically identical to
    the flax layer (fp64 fwd+grad equality,
    tests/test_phase_upconv.py::test_fused_groupnorm), but neither pass
    ever materializes a full-size f32 tensor: autodiff of the direct
    form creates an f32 activation copy (and its f32 cotangent) with a
    2.0x lane-padded TPU tiling — 6 GiB at S=4 x 128^3 x 64ch, the
    allocation that kept the reference-parity S=4 training step out of
    single-chip HBM (OOM dumps, 2026-08-21). Here the backward is two
    per-channel spatial reductions (sum dy, sum dy*x) + (B,C) algebra +
    one fused affine dx = dy*P + x*Q + R over the bf16 operands."""
    y, _ = _fgn_fwd(x, scale, bias, num_groups, eps)
    return y


def _fgn_fwd(x, scale, bias, num_groups, eps):
    c = x.shape[-1]
    groups = _num_groups(c, num_groups)
    gsize = c // groups
    sdt = jnp.promote_types(x.dtype, jnp.float32)
    gmean, inv = _fgn_stats(x, num_groups, eps)
    a = jnp.repeat(inv, gsize, axis=-1) * scale.astype(sdt)[None]
    b = (bias.astype(sdt)[None]
         - jnp.repeat(gmean * inv, gsize, axis=-1) * scale.astype(sdt)[None])
    shp = (x.shape[0],) + (1,) * (x.ndim - 2) + (-1,)
    y = (x.astype(sdt) * a.reshape(shp) + b.reshape(shp)).astype(x.dtype)
    return y, (x, scale, gmean, inv)


def _fgn_bwd(num_groups, eps, res, dy):
    x, scale, gmean, inv = res
    c = x.shape[-1]
    groups = _num_groups(c, num_groups)
    gsize = c // groups
    sdt = jnp.promote_types(x.dtype, jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    n = 1.0
    for s in x.shape[1:-1]:
        n *= s
    N = n * gsize
    bsz = x.shape[0]
    s32 = scale.astype(sdt)
    dy32 = dy.astype(sdt)
    x32 = x.astype(sdt)
    # the only big work: two per-channel reductions (converts fuse in)
    s_dy = jnp.sum(dy32, axis=axes)            # (B, C)
    s_dyx = jnp.sum(dy32 * x32, axis=axes)     # (B, C)
    # (B, C) centered correlation per channel, then group means
    ctr = s_dyx - gmean.repeat(gsize, -1) * s_dy
    dscale = jnp.sum(ctr * inv.repeat(gsize, -1), axis=0)
    dbias = jnp.sum(s_dy, axis=0)
    m1 = (s_dy * s32[None]).reshape(bsz, groups, gsize).sum(-1) / N
    m2 = ((ctr * s32[None]).reshape(bsz, groups, gsize).sum(-1)
          * inv / N)
    # dx = inv*(g*dy - m1 - xhat*m2)  ==  dy*P + x*Q + R with tiny coeffs.
    # The combine runs in x.dtype (identical math for f32/f64; bf16-
    # coefficient rounding under AMP, the same noise floor as the bf16
    # conv wgrad/dgrad next door): combining in f32 makes the big x/dy
    # converts SHARED between the reductions above and this fusion, and
    # XLA materializes the common f32 subexpression plus a layout copy
    # (2+4 GiB at S=4 x 128^3 x 64ch) instead of fusing the converts —
    # the allocation this custom_vjp exists to remove.
    P = (inv.repeat(gsize, -1) * s32[None])              # (B, C)
    Q = (-(inv * inv * m2)).repeat(gsize, -1)            # (B, C)
    R = (-inv * m1 + gmean * inv * inv * m2).repeat(gsize, -1)
    shp = (bsz,) + (1,) * len(axes) + (-1,)
    dt = x.dtype
    dx = (dy * P.reshape(shp).astype(dt) + x * Q.reshape(shp).astype(dt)
          + R.reshape(shp).astype(dt))
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_fused_groupnorm.defvjp(lambda x, s, b, ng, eps: _fgn_fwd(x, s, b, ng, eps),
                        _fgn_bwd)


class SingleConv(nn.Module):
    """One `layer_order` unit (parity: buildingblocks.py:78-101).

    The input may be a `(enc, z)` PAIR (decoder level whose upsample is
    an exact 2x repeat, see _DecoderStack): semantically it stands for
    concat([enc, nearest_up2(z)]) which is never materialized — pointwise
    layers apply to both parts, GroupNorm uses the fused-stats form
    (_pair_groupnorm), and the conv dispatches to the wide phase-folded
    rewrite (_phase_pair_conv), after which the value is an ordinary
    fine-grid tensor. This halves the level-0 decoder's HBM traffic and
    more than doubles its conv MXU rate (see _phase_upconv docstring)."""

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
            pair = isinstance(x, tuple)
            if ch == "c":
                bias = not ("g" in order or "b" in order)
                if pair:
                    # the phase fold (_PHASE_MAP) is derived for the 3-tap
                    # kernel only; a different kernel_size must take the
                    # materialized-concat path (gate in _DecoderStack)
                    assert self.kernel_size == 3, \
                        "phase pair conv requires kernel_size=3"
                    enc, z = x
                    k, b = _ConvParams(self.out_channels,
                                       enc.shape[-1] + z.shape[-1],
                                       (3,) * ndim, bias, name="conv")()
                    y = _phase_pair_conv(enc, z,
                                         k.astype(self.compute_dtype))
                    x = y if b is None else y + b.astype(self.compute_dtype)
                else:
                    x = nn.Conv(self.out_channels,
                                (self.kernel_size,) * ndim,
                                padding="SAME", use_bias=bias, name="conv",
                                dtype=self.compute_dtype,
                                param_dtype=jnp.float32)(x)
                # named for the 'save_convs' remat policy (see _remat_block)
                x = _adc.checkpoint_name(x, "conv_out")
            elif ch == "g":
                if pair:
                    enc, z = x
                    c = enc.shape[-1] + z.shape[-1]
                    s, b = _GNParams(c, name="groupnorm")()
                    x = _pair_groupnorm(enc, z, s, b, self.num_groups)
                else:
                    # sums+affine form of nn.GroupNorm — same params path
                    # ('groupnorm/scale','groupnorm/bias'), same values;
                    # avoids the flax layer's f32 backward layout copy
                    # (see _fused_groupnorm)
                    s, b = _GNParams(x.shape[-1], name="groupnorm")()
                    x = _fused_groupnorm(x, s, b, self.num_groups)
            elif ch == "b":
                # the decoder never forms a pair when 'b' is in the order
                x = nn.BatchNorm(use_running_average=True, name="batchnorm",
                                 dtype=self.compute_dtype,
                                 param_dtype=jnp.float32)(x)
            elif ch == "l":
                x = jax.tree.map(
                    lambda t: nn.leaky_relu(t, negative_slope=0.01), x)
            elif ch == "r":
                x = jax.tree.map(nn.relu, x)
            elif ch == "e":
                x = jax.tree.map(nn.elu, x)
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
        # x may be an (enc, z_coarse) pair standing for the decoder's
        # never-materialized upsample+concat — see SingleConv
        in_ch = (x[0].shape[-1] + x[1].shape[-1]) if isinstance(x, tuple) \
            else x.shape[-1]
        if self.encoder:
            conv1_out = max(self.out_channels // 2, in_ch)
        else:
            conv1_out = self.out_channels
        x = SingleConv(conv1_out, self.order, self.num_groups, self.kernel_size,
                       self.compute_dtype, self.is_3d,
                       name="SingleConv1")(x)
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
    phase_upconv: bool = True  # the level-0 rewrite (see _phase_upconv)

    @nn.compact
    def __call__(self, x, skips):
        block = _remat_block(self.remat)
        outs = []
        rev = list(reversed(self.f_maps))
        for i, out_ch in enumerate(rev[1:]):
            enc = skips[i]
            # phase-upconv eligibility (see _phase_upconv): exact 2x
            # upsample on every axis, 3-D, GroupNorm-or-none order
            # (BatchNorm has running stats per materialized tensor), and
            # no spatial GSPMD sharding (partitioner bug, see
            # _space_sharded). The rewrite is FLOP-neutral (the folded
            # kernel pre-sums fine taps landing on the same coarse
            # voxel), so it pays at EVERY level that underfills MXU
            # lanes AND it skips the upsample+concat materialization;
            # the cap exists because the folded kernel is 432*cout^2
            # elements (0.9 GB at cout=1024) while deep-level tensors
            # are KB-scale — levels 0-2 are where the time is.
            use_pair = (self.phase_upconv and self.is_3d and out_ch <= 256
                        and "b" not in self.order
                        and all(t == 2 * s and s > 0 for s, t in
                                zip(x.shape[1:-1], enc.shape[1:-1]))
                        and not _space_sharded())
            if use_pair:
                xin = (enc, x)
            else:
                x = _nearest_upsample_to(x, enc.shape[1:-1])
                xin = jnp.concatenate([enc, x], axis=-1)
                xin = _replicate_if_degenerate(xin, self.is_3d)
            x = block(out_ch, encoder=False, order=self.order,
                      num_groups=self.num_groups,
                      compute_dtype=self.compute_dtype, is_3d=self.is_3d,
                      name=f"{self.prefix}{i}")(xin)
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
    phase_upconv: bool = True  # level-0 decoder conv rewrite (_phase_upconv)

    def setup(self):
        fm = feature_maps(self.f_maps, self.num_levels)
        self.encoders = _EncoderStack(fm, self.layer_order, self.num_groups, 2,
                                      self.compute_dtype, self.is_3d,
                                      remat=self.remat)
        self.decoders = _DecoderStack(fm, self.layer_order, self.num_groups,
                                      self.compute_dtype, self.is_3d,
                                      remat=self.remat,
                                      phase_upconv=self.phase_upconv)

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
    phase_upconv: bool = True  # level-0 decoder conv rewrite (_phase_upconv)

    def setup(self):
        fm = feature_maps(self.f_maps, self.num_levels)
        self.encoders = _EncoderStack(fm, self.layer_order, self.num_groups, 2,
                                      self.compute_dtype, remat=self.remat)
        self.decoders_normal = _DecoderStack(fm, self.layer_order,
                                             self.num_groups, self.compute_dtype,
                                             prefix="decoder_normal",
                                             remat=self.remat,
                                             phase_upconv=self.phase_upconv)
        self.decoders_pathol = _DecoderStack(fm, self.layer_order,
                                             self.num_groups, self.compute_dtype,
                                             prefix="decoder_pathol",
                                             remat=self.remat,
                                             phase_upconv=self.phase_upconv)

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
