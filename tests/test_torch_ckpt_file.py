"""End-to-end .pth file import: save a reference-format torch checkpoint
(the scripts/train.py:205-214 dict layout), import it, and verify forward
parity — the exact path a user takes with brainfm_pretrained.pth."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from tests._refstub import stub_reference_deps

pytestmark = __import__('pytest').mark.slow  # torch-oracle / interpret-mode: slow tier


@pytest.fixture(scope="module")
def ref_models():
    stub_reference_deps()
    from Trainer.models.unet3d.model import UNet3D as TorchUNet3D

    tm = TorchUNet3D(in_channels=1, out_channels=1, f_maps=8, num_levels=2,
                     layer_order="gcl", num_groups=8, is_segmentation=False)
    tm.eval()
    return tm


def test_pth_roundtrip_forward_parity(ref_models, tmp_path, rng):
    from brainfm_tpu.models.torch_import import import_checkpoint
    from brainfm_tpu.models.unet3d import UNet3D

    tm = ref_models
    # reference checkpoint layout (scripts/train.py:205-214)
    path = str(tmp_path / "brainfm_like.pth")
    torch.save({"model": tm.state_dict(), "epoch": 3,
                "best_val_stats": {}}, path)

    params = import_checkpoint(path)
    # bare (non-Joiner) checkpoints land under the backbone subtree
    params = {"params": params["params"]["backbone"]}
    jm = UNet3D(f_maps=8, num_levels=2)

    x = rng.random((1, 1, 12, 12, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    # torch NCDHW -> jax NDHWC
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    out = jm.apply(params, xj, method=jm.get_feature)[-1]
    # get_feature[-1] is the last decoder level pre-final-conv in the torch
    # model's forward; compare through the full forward instead:
    # torch UNet3D.forward = decoder stack + final 1x1 conv; our backbone
    # has no final conv — compare the decoder feature maps
    with torch.no_grad():
        tfeats = tm.get_feature(torch.from_numpy(x))
    ref_feat = tfeats[-1].numpy()  # (1, C, D, H, W)
    out_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_np, ref_feat, atol=2e-5)


def test_pth_import_flagship_depth(tmp_path, rng):
    """Import parity at the FLAGSHIP depth (num_levels 6 — the published
    brainfm_pretrained.pth architecture, joint.yaml:26), width-reduced to
    f_maps 8 for CPU time: all six encoder/decoder levels' keys must map
    and the forward must agree."""
    stub_reference_deps()
    from Trainer.models.unet3d.model import UNet3D as TorchUNet3D

    from brainfm_tpu.models.torch_import import import_checkpoint
    from brainfm_tpu.models.unet3d import UNet3D

    tm = TorchUNet3D(in_channels=1, out_channels=1, f_maps=8, num_levels=6,
                     layer_order="gcl", num_groups=8, is_segmentation=False)
    tm.eval()
    path = str(tmp_path / "flagship_like.pth")
    torch.save({"model": tm.state_dict(), "epoch": 0,
                "best_val_stats": None}, path)
    params = import_checkpoint(path)
    params = {"params": params["params"]["backbone"]}
    jm = UNet3D(f_maps=8, num_levels=6)

    # fp64 on both sides makes this an EXACT mapping criterion: in fp32
    # the noise doubles per level through the GroupNorm chains (measured
    # 1e-4 at L3 -> 2.5e-3 at L6 with identical weights — accumulation,
    # not mis-mapping)
    x = rng.random((1, 1, 64, 64, 64)).astype(np.float64)
    tm = tm.double()
    with torch.no_grad():
        ref_feat = tm.get_feature(torch.from_numpy(x))[-1].numpy()
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    try:
        params64 = _jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                 params)
        jm64 = UNet3D(f_maps=8, num_levels=6, compute_dtype=jnp.float64)
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)), jnp.float64)
        out = jm64.apply(params64, xj, method=jm64.get_feature)[-1]
        out_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(out_np, ref_feat, atol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", False)
