"""Bit-level (fp32 tolerance) parity of the flax UNet3D + TaskHead against the
reference torch model (imported from /root/reference) with identical weights
routed through the checkpoint importer — the gate from SURVEY.md §7 step 2."""

import numpy as np
import pytest

from _refstub import stub_reference_deps

stub_reference_deps()
import torch  # noqa: E402
from Trainer.models.unet3d.model import UNet3D as TorchUNet3D  # noqa: E402
from Trainer.models.head import TaskHead as TorchTaskHead  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from brainfm_tpu.models.build import Joiner  # noqa: E402
from brainfm_tpu.models.heads import TaskHead  # noqa: E402
from brainfm_tpu.models.torch_import import torch_to_flax_params  # noqa: E402
from brainfm_tpu.models.unet3d import UNet3D  # noqa: E402

pytestmark = __import__('pytest').mark.slow  # torch-oracle / interpret-mode: slow tier


class _TorchJoiner(torch.nn.Module):
    def __init__(self, backbone, head):
        super().__init__()
        self.backbone = backbone
        self.head = head


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    t_backbone = TorchUNet3D(1, f_maps=8, layer_order="gcl", num_groups=8,
                             num_levels=3)
    out_channels = {"T1": 1, "segmentation": 4}
    t_head = TorchTaskHead(None, f_maps_list=[8], out_channels=out_channels,
                           is_3d=True, out_feat_level=-1)
    t_model = _TorchJoiner(t_backbone, t_head).eval()

    j_backbone = UNet3D(f_maps=8, num_levels=3, layer_order="gcl", num_groups=8)
    j_head = TaskHead((8,), out_channels, size=(16, 16, 16))
    j_model = Joiner(j_backbone, j_head)

    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = {"params": torch_to_flax_params(state)}
    return t_model, j_model, params


def test_unet_forward_parity(models, rng):
    t_model, j_model, params = models
    x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        feats = t_model.backbone.get_feature(torch.tensor(x))
        t_out = t_model.head(feats)

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    j_out = j_model.apply(params, xj)

    for name in ("T1", "segmentation"):
        ref = t_out[name].numpy()
        got = np.transpose(np.asarray(j_out[name]), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_unet_feature_parity(models, rng):
    t_model, j_model, params = models
    x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_feats = t_model.backbone.get_feature(torch.tensor(x))
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    j_out = j_model.apply(params, xj)
    assert len(j_out["feat"]) == len(t_feats)
    for tf, jf in zip(t_feats, j_out["feat"]):
        ref = tf.numpy()
        got = np.transpose(np.asarray(jf), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_unet_odd_sizes(models, rng):
    """Nearest-upsample must reproduce torch F.interpolate semantics on odd
    spatial sizes (upsample target from encoder feature shape)."""
    t_model, j_model, params = models
    x = rng.standard_normal((1, 1, 20, 12, 16)).astype(np.float32)
    with torch.no_grad():
        t_feats = t_model.backbone.get_feature(torch.tensor(x))
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    j_out = j_model.apply(params, xj)
    ref = t_feats[-1].numpy()
    got = np.transpose(np.asarray(j_out["feat"][-1]), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
