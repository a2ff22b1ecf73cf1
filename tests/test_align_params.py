"""Fuzzy checkpoint alignment (parity: align_and_update_state_dicts,
/root/reference/utils/checkpoint.py:538-680): suffix matching with
longest-match disambiguation, to_match renames, exclude_key filtering,
and 2D->3D centre-frame kernel inflation. Pure numpy — fast tier."""

import numpy as np
import pytest

from brainfm_tpu.models.torch_import import (align_params, flatten_params,
                                             import_checkpoint_aligned)


def _mk(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_exact_and_suffix_match():
    target = {"backbone": {"enc": {"conv": {"kernel": _mk((3, 3, 3, 1, 8), 0),
                                            "bias": _mk((8,), 1)}}}}
    # checkpoint lacks the outer 'backbone.' prefix -> suffix match
    ckpt = {"enc": {"conv": {"kernel": _mk((3, 3, 3, 1, 8), 2),
                             "bias": _mk((8,), 3)}}}
    aligned, rep = align_params(target, ckpt)
    flat = flatten_params(aligned)
    np.testing.assert_array_equal(flat["backbone.enc.conv.kernel"],
                                  ckpt["enc"]["conv"]["kernel"])
    assert len(rep["matched"]) == 2 and not rep["unmatched_ckpt"]


def test_longest_match_wins():
    # two ckpt keys both suffix-match the model key; the longer wins
    # (reference: match_matrix max over len(ckpt_key), checkpoint.py:566-570)
    target = {"a": {"b": {"w": _mk((4,), 0)}}}
    ckpt = {"b": {"w": _mk((4,), 1)}, "w": _mk((4,), 2)}
    aligned, rep = align_params(target, ckpt)
    np.testing.assert_array_equal(flatten_params(aligned)["a.b.w"],
                                  ckpt["b"]["w"])
    assert rep["unmatched_ckpt"] == ["w"]


def test_exclude_key_keeps_target():
    target = {"head": {"supervised_seg": {"w": _mk((4,), 0)},
                       "other": {"w": _mk((4,), 1)}}}
    ckpt = {"head": {"supervised_seg": {"w": _mk((4,), 2)},
                     "other": {"w": _mk((4,), 3)}}}
    aligned, rep = align_params(target, ckpt, exclude_key="supervised_seg")
    flat = flatten_params(aligned)
    # excluded param keeps the live value (reference filters model_keys,
    # checkpoint.py:544-547); the rest loads
    np.testing.assert_array_equal(flat["head.supervised_seg.w"],
                                  target["head"]["supervised_seg"]["w"])
    np.testing.assert_array_equal(flat["head.other.w"],
                                  ckpt["head"]["other"]["w"])
    assert "head.supervised_seg.w" not in [m for m, _ in rep["matched"]]


def test_to_match_rename():
    target = {"backbone": {"encoder_new": {"w": _mk((4,), 0)}}}
    ckpt = {"encoder_old": {"w": _mk((4,), 1)}}
    aligned, _ = align_params(target, ckpt,
                              to_match={"encoder_old": "encoder_new"})
    np.testing.assert_array_equal(
        flatten_params(aligned)["backbone.encoder_new.w"],
        ckpt["encoder_old"]["w"])


def test_2d_to_3d_center_frame_inflation():
    # flax layouts: 3D kernel (D,H,W,I,O), 2D kernel (H,W,I,O)
    # (reference loads the 2D weights at the centre temporal frame and
    # zeroes the rest, checkpoint.py:600-617)
    k2 = _mk((3, 3, 2, 4), 0)
    target = {"m": {"conv": {"kernel": np.ones((3, 3, 3, 2, 4), np.float32)}}}
    ckpt = {"m": {"conv": {"kernel": k2}}}
    aligned, rep = align_params(target, ckpt)
    k3 = flatten_params(aligned)["m.conv.kernel"]
    np.testing.assert_array_equal(k3[1], k2)
    assert np.all(k3[0] == 0) and np.all(k3[2] == 0)
    assert rep["inflated"] == [("m.conv.kernel", "m.conv.kernel")]


def test_same_rank_mismatch_skipped():
    # different channel widths at equal rank are skipped, keeping the
    # live init (checkpoint.py:592-599)
    target = {"m": {"w": _mk((8, 4), 0)}}
    ckpt = {"m": {"w": _mk((6, 4), 1)}}
    aligned, rep = align_params(target, ckpt)
    np.testing.assert_array_equal(flatten_params(aligned)["m.w"],
                                  target["m"]["w"])
    assert rep["skipped_shape"] == [("m.w", "m.w")]
    assert rep["unmatched_model"] == ["m.w"]


def test_ambiguous_match_raises():
    # one ckpt key matching two model keys is an error (checkpoint.py:624-631)
    target = {"x": {"w": _mk((4,), 0)}, "y": {"w": _mk((4,), 1)}}
    ckpt = {"w": _mk((4,), 2)}
    with pytest.raises(ValueError, match="multiple keys"):
        align_params(target, ckpt)


@pytest.mark.slow
def test_import_checkpoint_aligned_partial(tmp_path):
    """A checkpoint missing one head still loads everything else, and the
    missing head keeps its live init — the reference resume-with-
    exclude_key behavior (scripts/train.py:182)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from brainfm_tpu.models.build import Joiner
    from brainfm_tpu.models.heads import TaskHead
    from brainfm_tpu.models.unet3d import UNet3D

    model = Joiner(UNet3D(f_maps=8, num_levels=2, layer_order="gcl",
                          num_groups=8),
                   TaskHead((8,), {"T1": 1}, size=(16, 16, 16)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 16, 1)))
    # build a torch-format ckpt with ONLY the backbone (no head)
    import sys
    sys.path.insert(0, "/root/reference")
    from tests._refstub import stub_reference_deps
    stub_reference_deps()
    from Trainer.models.unet3d.model import UNet3D as TorchUNet3D
    tm = TorchUNet3D(in_channels=1, out_channels=1, f_maps=8, num_levels=2,
                     layer_order="gcl", num_groups=8, is_segmentation=False)
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()
          if k.startswith(("encoders", "decoders"))}
    path = str(tmp_path / "partial.pth")
    torch.save({"model": sd}, path)

    loaded = import_checkpoint_aligned(path, params)
    lf = flatten_params(loaded["params"])
    pf = flatten_params(params["params"])
    assert set(lf) == set(pf)
    # backbone loaded from torch
    enc_keys = [k for k in lf if k.startswith("backbone.encoders")]
    assert enc_keys
    changed = sum(not np.allclose(lf[k], pf[k]) for k in enc_keys)
    assert changed > 0
    # head kept live init
    head_keys = [k for k in lf if k.startswith("head.")]
    assert head_keys
    for k in head_keys:
        np.testing.assert_array_equal(np.asarray(lf[k]), np.asarray(pf[k]))


def test_inflation_casts_to_target_dtype():
    # fp64 target tree + fp32 2D ckpt kernel: the inflated leaf must take
    # the TARGET dtype like the exact-match branch, or the aligned tree is
    # mixed-dtype and breaks structure-matched restores
    k2 = _mk((3, 3, 2, 4), 0)
    target = {"m": {"conv": {"kernel": np.ones((3, 3, 3, 2, 4), np.float64)}}}
    aligned, _ = align_params(target, {"m": {"conv": {"kernel": k2}}})
    k3 = flatten_params(aligned)["m.conv.kernel"]
    assert k3.dtype == np.float64
    np.testing.assert_array_equal(k3[1], k2.astype(np.float64))
