"""Golden tests of generator stages against the reference implementation
(torch, CPU) with INJECTED random draws — the same base values go into
both sides, so any drift in the LUT construction, partial-volume ramps,
augmentation math, or the chain ORDER fails loudly
(VERDICT round-1 next #3; reference: Generator/datasets.py:306-412,
Generator/utils.py:568-638)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
from _refstub import stub_reference_deps

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    stub_reference_deps()
    from Generator import datasets as ref_datasets
    from Generator import utils as ref_utils

    return types.SimpleNamespace(datasets=ref_datasets, utils=ref_utils)


class _Queue:
    """Deterministic stand-in for np.random.* / torch.rand(n): pops
    pre-planned draws in call order."""

    def __init__(self, values):
        self.values = list(values)

    def __call__(self, *args, **kwargs):
        v = self.values.pop(0)
        return v


def test_contrast_lut_golden(ref, monkeypatch):
    """get_contrast (datasets.py:430-464) vs build_contrast_lut with the
    same base draws: CT brightness groups + partial-volume ramps +
    background zeroing."""
    rng = np.random.default_rng(0)
    u_mu = rng.random(256).astype(np.float32)
    u_sig = rng.random(256).astype(np.float32)
    u_lvl = rng.random(4).astype(np.float32)

    for use_ct, photo, zero_bg in [(False, 0.0, False), (True, 0.0, True),
                                   (False, 1.0, False), (True, 0.0, False)]:
        # reference call sequence: torch.rand(256) mus, torch.rand(256)
        # sigmas, np.random.rand() ct roulette, [4x torch.rand(1) levels],
        # np.random.rand(1) zero-bg roulette
        tq = [torch.tensor(u_mu), torch.tensor(u_sig)]
        if use_ct:
            tq += [torch.tensor([v]) for v in u_lvl]
        nq = [0.0 if use_ct else 1.0, np.asarray([0.0 if zero_bg else 1.0])]
        monkeypatch.setattr(torch, "rand", _Queue(tq))
        monkeypatch.setattr(np.random, "rand", _Queue(nq))
        self_stub = types.SimpleNamespace(
            device="cpu", synth_args=types.SimpleNamespace(ct_prob=0.5))
        mus_ref, sig_ref = ref.datasets.BaseGen.get_contrast(
            self_stub, photo_mode=bool(photo))
        monkeypatch.undo()

        from brainfm_tpu.synth.gmm import build_contrast_lut

        levels = (25.0 + 10.0 * u_lvl[0], 90.0 + 20.0 * u_lvl[1],
                  110.0 + 20.0 * u_lvl[2],
                  150.0 + 50.0 * u_lvl[3]) if use_ct else None
        mus, sig = build_contrast_lut(
            jnp.asarray(25.0 + 200.0 * u_mu),
            jnp.asarray(5.0 + 20.0 * u_sig), levels, use_ct, zero_bg,
            jnp.float32(photo))
        np.testing.assert_allclose(np.asarray(mus), mus_ref.numpy(),
                                   rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sig), sig_ref.numpy(),
                                   rtol=2e-5, atol=2e-4)


def test_synth_intensities_golden(ref):
    """The GMM intensity draw (datasets.py:364-374): WM-lesion merge
    77->2, LUT gather, non-negativity clamp — same LUT and noise field."""
    rng = np.random.default_rng(1)
    G = rng.choice([0, 2, 3, 4, 41, 77, 120, 170, 250],
                   (12, 12, 12)).astype(np.float32)
    mus = (25 + 200 * rng.random(256)).astype(np.float32)
    sigmas = (5 + 20 * rng.random(256)).astype(np.float32)
    noise = rng.standard_normal((12, 12, 12)).astype(np.float32)

    # reference lines, verbatim semantics
    Gt = torch.tensor(G)
    Gt[Gt == 77] = 2
    Gr = torch.round(Gt).long()
    mt, st = torch.tensor(mus), torch.tensor(sigmas)
    SYN = mt[Gr] + st[Gr] * torch.tensor(noise)
    SYN[SYN < 0] = 0

    from brainfm_tpu.synth.gmm import synth_intensities

    ours = synth_intensities(jax.random.PRNGKey(0), jnp.asarray(G),
                             jnp.asarray(mus), jnp.asarray(sigmas),
                             noise=jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(ours), SYN.numpy(), rtol=1e-5,
                               atol=1e-3)


def _setup_dict(size, resolution, thickness):
    return {"photo_mode": jnp.zeros(()), "spac": jnp.ones(()) * 4.0,
            "resolution": jnp.asarray(resolution, jnp.float32),
            "thickness": jnp.asarray(thickness, jnp.float32),
            "flip": jnp.zeros(())}


def _mk_cfg(size):
    from brainfm_tpu.synth.params import SynthStatic

    # bias-field scales bumped so the low-res field is a real grid at the
    # 24^3 test size (default 0.02-0.04 of 24 rounds to a degenerate 1^3)
    return SynthStatic(size=size, photo_prob=0.0, left_hemis_only=False,
                       bf_scale_min=0.2, bf_scale_max=0.3)


def test_gamma_golden(ref):
    """I -> 300(I/300)^gamma (utils.py:568-572) with the same gamma."""
    rng = np.random.default_rng(2)
    img = (250.0 * rng.random((10, 10, 10))).astype(np.float32)
    g_draw = 0.37  # the randn draw
    cfg = types.SimpleNamespace(gamma_std=0.1)

    import Generator.utils as ru

    old = np.random.randn
    np.random.randn = _Queue([np.asarray([g_draw])])
    try:
        ref_out, _ = ru.add_gamma_transform(torch.tensor(img), {}, cfg, "cpu")
    finally:
        np.random.randn = old

    from brainfm_tpu.synth.augment import gamma_transform

    gamma = float(np.exp(0.1 * g_draw))
    ours = gamma_transform(jax.random.PRNGKey(0), jnp.asarray(img),
                           0.1, gamma=gamma)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), rtol=1e-5,
                               atol=1e-3)


def test_bias_field_golden(ref):
    """Low-res log bias field -> zoom -> exp (utils.py:574-589) with the
    same scale/std/small-field draws; compares the BFlog surfaces."""
    size = (24, 24, 24)
    rng = np.random.default_rng(3)
    cfg = _mk_cfg(size)
    knobs = {"bf_scale_min": jnp.float32(cfg.bf_scale_min),
             "bf_scale_max": jnp.float32(cfg.bf_scale_max),
             "bf_std_min": jnp.float32(cfg.bf_std_min),
             "bf_std_max": jnp.float32(cfg.bf_std_max)}
    u_scale, u_std = 0.6, 0.4
    bf_scale = cfg.bf_scale_min + u_scale * (cfg.bf_scale_max
                                             - cfg.bf_scale_min)
    std = cfg.bf_std_min + (cfg.bf_std_max - cfg.bf_std_min) * u_std
    eff = np.round(bf_scale * np.asarray(size)).astype(int)

    from brainfm_tpu.synth.augment import sample_bias_field

    # buffer-shaped standard-normal field; the reference sees its active
    # eff-corner (buffer shape per sample_bias_field:
    # ceil(bf_scale_max*size)+1 per axis, photo off)
    setup = _setup_dict(size, [1, 1, 1], [1, 1, 1])
    import math

    buf = (int(math.ceil(cfg.bf_scale_max * size[0])) + 1,
           int(math.ceil(cfg.bf_scale_max * size[1])) + 1,
           int(math.ceil(cfg.bf_scale_max * size[2])) + 1)
    small_noise = rng.standard_normal(buf).astype(np.float32)
    noise_buf = small_noise

    bflog = sample_bias_field(jax.random.PRNGKey(0), cfg, setup, knobs,
                              bf_scale=jnp.float32(bf_scale),
                              std=jnp.float32(std),
                              small_noise=jnp.asarray(noise_buf))

    import Generator.utils as ru

    BFsmall = torch.tensor(std * small_noise[: eff[0], : eff[1], : eff[2]])
    BFlog_ref = ru.myzoom_torch(BFsmall, np.asarray(size) / eff)
    np.testing.assert_allclose(np.asarray(bflog), BFlog_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_affine_matrix_golden(ref):
    """make_affine_matrix (utils.py:102-116): shear/rotation composition
    order and row-wise scaling must match exactly."""
    rng = np.random.default_rng(5)
    rot = (rng.random(3) * 30 - 15) / 180 * np.pi
    sh = rng.random(3) * 0.4 - 0.2
    s = 1 + rng.random(3) * 0.4 - 0.2

    import Generator.utils as ru

    A_ref = ru.make_affine_matrix(rot, sh, s)

    from brainfm_tpu.synth.deform import make_affine_matrix

    A = make_affine_matrix(jnp.asarray(rot, jnp.float32),
                           jnp.asarray(sh, jnp.float32),
                           jnp.asarray(s, jnp.float32))
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-5, atol=1e-6)


def test_svf_integration_golden(ref):
    """Scaling-and-squaring SVF integration (datasets.py:214-223) on the
    same injected velocity field: F and its negative."""
    size = (14, 14, 14)
    rng = np.random.default_rng(6)
    F = (2.0 * rng.standard_normal((*size, 3))).astype(np.float32)
    n_steps = 4

    import Generator.utils as ru

    xx, yy, zz = np.meshgrid(*[np.arange(s, dtype=np.float32)
                               for s in size], indexing="ij")
    xx, yy, zz = (torch.tensor(v) for v in (xx, yy, zz))
    step = 1.0 / (2.0 ** n_steps)
    Fsvf = torch.tensor(F) * step
    for _ in range(n_steps):
        Fsvf = Fsvf + ru.fast_3D_interp_torch(
            Fsvf, xx + Fsvf[:, :, :, 0], yy + Fsvf[:, :, :, 1],
            zz + Fsvf[:, :, :, 2], "linear")
    Fneg = -torch.tensor(F) * step
    for _ in range(n_steps):
        Fneg = Fneg + ru.fast_3D_interp_torch(
            Fneg, xx + Fneg[:, :, :, 0], yy + Fneg[:, :, :, 1],
            zz + Fneg[:, :, :, 2], "linear")

    from brainfm_tpu.synth.deform import integrate_svf

    ours, ours_neg = integrate_svf(jnp.asarray(F), n_steps)
    np.testing.assert_allclose(np.asarray(ours), Fsvf.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_neg), Fneg.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_full_item_distribution(ref):
    """Distribution-level check of the FULL synthesis path: the reference
    BaseGen.generate_sample -> augment_sample (identity deformation, real
    RNG) vs our synth_item over several seeds — normalized-intensity
    moments and quantiles must agree. Catches systematically wrong knob
    wiring (units, ranges) that per-stage goldens with injected draws
    cannot see (VERDICT next #3 'distribution-level checks elsewhere')."""
    size = (32, 32, 32)
    rng = np.random.default_rng(7)
    # shared debug label volume: a blobby mix of generation labels
    from brainfm_tpu.synth.engine import SubjectBank

    bank = SubjectBank(bank_shape=(40, 40, 40))
    bank.add_debug_subject(seed=0, extent=(36, 36, 36))
    G_full = np.asarray(bank.to_device(0)["gen"], np.float32)

    # --- reference: BaseGen without __init__ (no file I/O), identity grid
    bg = ref.datasets.BaseGen.__new__(ref.datasets.BaseGen)
    bg.device = "cpu"
    bg.hemis_mask = None
    bg.modalities = ["T1"]
    bg.tasks = []
    bg.size = list(size)
    bg.synth_args = types.SimpleNamespace(
        ct_prob=0.0, bspline_zooming=False, gamma_std=0.1,
        bf_scale_min=0.02, bf_scale_max=0.04, bf_std_min=0.1,
        bf_std_max=0.6, noise_std_min=5.0, noise_std_max=15.0)
    bg.gen_args = types.SimpleNamespace(
        mix_synth_prob=0.0, generator=bg.synth_args)
    bg.augmentation_steps = {"synth": ["gamma", "bias_field", "resample",
                                       "noise"],
                             "real": ["gamma", "bias_field", "resample",
                                      "noise"]}
    ii, jj, kk = np.meshgrid(*[np.arange(s, dtype=np.float32)
                               for s in size], indexing="ij")
    grid = [torch.tensor(ii), torch.tensor(jj), torch.tensor(kk),
            0, 0, 0, size[0], size[1], size[2]]
    G_stub = types.SimpleNamespace(get_fdata=lambda: G_full)
    setups = {"photo_mode": False, "spac": 4.0, "flip": False,
              "resolution": np.asarray([1.0, 1.0, 1.0]),
              "thickness": np.asarray([1.0, 1.0, 1.0])}

    np.random.seed(11)
    torch.manual_seed(11)
    ref_vox = []
    for _ in range(6):
        _, _, sample = bg.generate_sample(
            "dbg", G_stub, setups, {"grid": grid},
            np.asarray([1.0, 1.0, 1.0]), {})
        ref_vox.append(np.asarray(sample["input"]).ravel())
    ref_vox = np.concatenate(ref_vox)

    # --- ours: synth_item with (near-)identity deformation bounds and the
    # same knob ranges; 1 mm fixed resolution (low_res branch off via the
    # sampled setup is stochastic — pin by zeroing deformation and
    # comparing marginals over seeds, resolution roulette matched by
    # using identical acquisition branch probabilities)
    from brainfm_tpu.synth.engine import build_knobs_stack, synth_item
    from brainfm_tpu.synth.params import SynthStatic

    scfg = SynthStatic(size=size, max_rotation=0.01, max_shear=0.001,
                       max_scaling=0.001, nonlin_scale_min=0.01,
                       nonlin_scale_max=0.02, nonlin_std_max=0.01,
                       photo_prob=0.0, flip_prob=0.0, all_samples=1,
                       mild_samples=0, low_res_only=False)
    knobs = build_knobs_stack(scfg, "synth")
    subj = bank.to_device(0)
    our_vox = []
    for i in range(6):
        _t, s = synth_item(jax.random.PRNGKey(100 + i), subj, scfg,
                           ("T1",), "synth", knobs)
        our_vox.append(np.asarray(s["input"]).ravel())
    our_vox = np.concatenate(our_vox)

    # both are max-normalized to [0,1]; compare coarse distribution shape
    for q in (0.25, 0.5, 0.75, 0.9):
        rq = np.quantile(ref_vox, q)
        oq = np.quantile(our_vox, q)
        assert abs(rq - oq) < 0.12, (q, rq, oq)
    assert abs(ref_vox.mean() - our_vox.mean()) < 0.08
    assert abs(ref_vox.std() - our_vox.std()) < 0.08


def test_chain_order_golden(ref):
    """The FULL augmentation chain with injected draws: gamma -> bias ->
    resample -> noise -> restore (datasets.py:328-345). A swapped order
    or a wrong restore/normalize step shows up as a mismatch."""
    size = (24, 24, 24)
    rng = np.random.default_rng(4)
    img = (220.0 * rng.random(size)).astype(np.float32)
    resolution = [1.5, 1.5, 3.0]
    thickness = [1.5, 1.5, 3.0]
    cfg = _mk_cfg(size)
    setup = _setup_dict(size, resolution, thickness)
    knobs = {"gamma_std": jnp.float32(0.1),
             "bf_scale_min": jnp.float32(cfg.bf_scale_min),
             "bf_scale_max": jnp.float32(cfg.bf_scale_max),
             "bf_std_min": jnp.float32(cfg.bf_std_min),
             "bf_std_max": jnp.float32(cfg.bf_std_max),
             "noise_std_min": jnp.float32(5.0),
             "noise_std_max": jnp.float32(15.0)}

    # planned draws
    g_draw = -0.8
    u_scale, u_std = 0.3, 0.7
    bf_scale = cfg.bf_scale_min + u_scale * (cfg.bf_scale_max
                                             - cfg.bf_scale_min)
    bf_std = cfg.bf_std_min + (cfg.bf_std_max - cfg.bf_std_min) * u_std
    eff_bf = np.round(bf_scale * np.asarray(size)).astype(int)
    resample_u = 0.5
    noise_u = 0.25
    noise_std = 5.0 + 10.0 * noise_u
    new_size = (np.asarray(size) / np.asarray(resolution)).astype(int)

    import math

    buf_bf = (int(math.ceil(cfg.bf_scale_max * size[0])) + 1,
              int(math.ceil(cfg.bf_scale_max * size[1])) + 1,
              int(math.ceil(cfg.bf_scale_max * size[2])) + 1)
    bf_noise = rng.standard_normal(buf_bf).astype(np.float32)
    noise_field = rng.standard_normal(size).astype(np.float32)

    # --- reference chain (utils.py:568-638 + the restore of
    # datasets.py:337-345), with patched draws
    import Generator.utils as ru

    rcfg = types.SimpleNamespace(
        gamma_std=0.1, bf_scale_min=cfg.bf_scale_min,
        bf_scale_max=cfg.bf_scale_max, bf_std_min=cfg.bf_std_min,
        bf_std_max=cfg.bf_std_max, noise_std_min=5.0, noise_std_max=15.0)
    rsetups = {"photo_mode": False, "spac": 4.0,
               "resolution": np.asarray(resolution, np.float64),
               "thickness": np.asarray(thickness, np.float64)}
    old_rand, old_randn = np.random.rand, np.random.randn
    old_trandn = torch.randn
    # call order: gamma randn; bias rand(scale), rand(std),
    # torch.randn(small); resample rand(rnd); noise rand(std),
    # torch.randn(img)
    np.random.randn = _Queue([np.asarray([g_draw])])
    np.random.rand = _Queue([np.asarray([u_scale]), np.asarray([u_std]),
                             resample_u, np.asarray([noise_u])])
    torch.randn = _Queue([
        torch.tensor(bf_noise[: eff_bf[0], : eff_bf[1], : eff_bf[2]]),
        torch.tensor(noise_field[: new_size[0], : new_size[1],
                                 : new_size[2]])])
    try:
        x = torch.tensor(img)
        aux = {}
        x, aux = ru.add_gamma_transform(x, aux, rcfg, "cpu")
        x, aux = ru.add_bias_field(x, aux, rcfg, "synth", rsetups, size,
                                   "cpu")
        x, aux = ru.resample_resolution(x, aux, rsetups,
                                        np.asarray([1.0, 1.0, 1.0]), size,
                                        "cpu")
        x, aux = ru.add_noise(x, aux, rcfg, "cpu")
        ref_restored = ru.myzoom_torch(x, 1.0 / aux["factors"]).numpy()
    finally:
        np.random.rand, np.random.randn = old_rand, old_randn
        torch.randn = old_trandn

    # --- our chain with the same injected draws
    from brainfm_tpu.synth.augment import augment_chain

    ours, aux2 = augment_chain(
        jax.random.PRNGKey(0), jnp.asarray(img), cfg, setup, knobs,
        overrides={"gamma": float(np.exp(0.1 * g_draw)),
                   "bf_scale": jnp.float32(bf_scale),
                   "bf_std": jnp.float32(bf_std),
                   "bf_small_noise": jnp.asarray(bf_noise),
                   "resample_rnd": jnp.float32(0.85 + 0.3 * resample_u),
                   "noise_std": jnp.float32(noise_std),
                   "noise_field": jnp.asarray(noise_field)})
    ours = np.asarray(ours)
    assert ours.shape == ref_restored.shape
    # blur kernels/interpolation paths differ in implementation (separable
    # MXU matmuls vs conv3d+gather), so compare to a scale-aware tolerance
    scale = np.abs(ref_restored).max()
    err = np.abs(ours - ref_restored).max() / scale
    assert err < 2e-3, f"chain mismatch: max rel err {err:.2e}"
    # sanity that the test has teeth: a swapped order (noise before
    # resample-blur) must NOT match
    ours_swapped, _ = augment_chain(
        jax.random.PRNGKey(0), jnp.asarray(img), cfg, setup, knobs,
        steps=("gamma", "bias_field", "noise", "resample"),
        overrides={"gamma": float(np.exp(0.1 * g_draw)),
                   "bf_scale": jnp.float32(bf_scale),
                   "bf_std": jnp.float32(bf_std),
                   "bf_small_noise": jnp.asarray(bf_noise),
                   "resample_rnd": jnp.float32(0.85 + 0.3 * resample_u),
                   "noise_std": jnp.float32(noise_std),
                   "noise_field": jnp.asarray(noise_field)})
    err_sw = np.abs(np.asarray(ours_swapped) - ref_restored).max() / scale
    assert err_sw > 1e-2
