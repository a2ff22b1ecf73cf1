"""Driver benchmark: whole-brain inference volumes/sec/chip, flagship model.

Emits ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.

The north star (BASELINE.md): whole-brain (220^3 @1mm) inference
throughput per chip on the joint 8-task L6 flagship. Primary path is the
single-dispatch WHOLE-VOLUME forward (the reference's own preferred mode
when memory allows — demo_test.test(), cfgs/trainer/default_val.yaml:10);
secondaries: the 160^3/stride-80 tiled walk (demo_test.py:126), generator
samples/sec with and without pathology advection, and the train step.
vs_baseline compares against the measured PyTorch-reference whole-volume
line on this host's CPU (none is published upstream).

Contract hardening (round 3 shipped `parsed: null`): file-descriptor 1 is
redirected to stderr for the WHOLE run — jax/absl logging, cache-miss
explanations, C-level writes, everything lands on stderr — and the
contract JSON is written straight to the saved real stdout fd, once after
the primary measurement and once more (identical) as the final stdout
line. A compact all-stage summary is the last stderr line so the driver's
2000-char tail always carries every north-star number.
"""

import json
import os
import sys
import time

# ---- stdout isolation MUST happen before any jax/absl import can grab a
# handle to fd 1 (see module docstring)
_REAL_STDOUT = os.dup(1)
os.dup2(2, 1)
sys.stdout = sys.stderr

import numpy as np

import jax

# the axon relay's sitecustomize pins the platform before user code runs and
# IGNORES the JAX_PLATFORMS env var; honoring it here makes the CPU smoke
# mode (BRAINFM_BENCH_SMOKE=1 JAX_PLATFORMS=cpu) work under the default env
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from brainfm_tpu.utils.cache import (looks_like_cache_poisoning,
                                     setup_compilation_cache)

# BRAINFM_EXPLAIN_MISSES=1 logs WHY any graph misses the persistent cache
# (the r2 driver run burned 412 s recompiling the whole-volume graph
# despite 49 MB of cache entries). OPT-IN ONLY: jax's own explanation code
# CRASHES the traced computation when a previously-seen function misses
# with a short cache-key payload — partial_eval.diff_tracing_cache_keys
# unpacks `(tree, dbg, qdd, *_)` from a 2-element key and raises
# `ValueError: not enough values to unpack (expected at least 3, got 2)`
# (reproduced 2026-08-20 on warp_auto's reused lax.cond branches; jax 0.8
# bug, not ours). A diagnostics flag must never be able to kill the
# contract run.
try:
    if os.environ.get("BRAINFM_EXPLAIN_MISSES") == "1":
        jax.config.update("jax_explain_cache_misses", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

T_START = time.time()
SMOKE = os.environ.get("BRAINFM_BENCH_SMOKE") == "1"
STAGES = {}          # stage metrics for the end-of-run summary line
_CONTRACT = []       # contract JSON lines written so far (for re-emit)
COLD_CACHE = True    # set in main(); gates the tiled stage by policy


def emit_contract(vols_per_sec):
    # measured reference line (BASELINE.md): torch reference UNet3D f64
    # **L6 flagship** on this host's CPU = 448 s warm / 160^3 tile
    # (433-463 s over two runs, 2026-08-17). Whole-volume 220^3 scales the
    # conv cost by voxel count: 448 s x (220/160)^3 = 1164 s/volume
    # = 0.00086 vol/s. (The reference's tiled stride-80 walk is 0.00066
    # vol/s — the whole-volume line is the FASTER, apples-to-apples
    # comparison for our whole-volume primary.) No GPU measurable here.
    baseline = 0.00086
    try:
        with open("/root/repo/BASELINE.json") as f:
            bl = json.load(f)
        baseline = (bl.get("measured", {}) or {}).get(
            "whole_volume_inference_vols_per_sec") or baseline
    except Exception:
        pass
    line = json.dumps({
        "metric": "inference_vols_per_sec_per_chip",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/s (220^3 @1mm whole-volume single-dispatch "
                "forward, joint 8-task UNet3D f64 L6 flagship bf16; "
                "vs_baseline = ratio to torch reference L6 flagship "
                f"whole-volume on 8-thread CPU, {baseline} vol/s — see "
                "BASELINE.md)",
        "vs_baseline": round(vols_per_sec / baseline, 4),
    })
    json.loads(line)  # self-verify: the line must round-trip
    assert "\n" not in line
    os.write(_REAL_STDOUT, (line + "\n").encode())
    _CONTRACT.append(line)
    STAGES["primary_vols_per_sec"] = round(vols_per_sec, 4)
    STAGES["vs_baseline"] = round(vols_per_sec / baseline, 4)


def finalize():
    """Re-emit the contract line as the FINAL stdout line and the
    all-stage summary as the final stderr line (survives tail truncation).
    Runs even when a secondary stage raised."""
    if _CONTRACT:
        os.write(_REAL_STDOUT, (_CONTRACT[-1] + "\n").encode())
    print(f"# BENCH SUMMARY {json.dumps(STAGES)}", file=sys.stderr)
    sys.stderr.flush()


def log_ts(msg):
    print(f"# [{time.time()-T_START:6.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


def _probe_backend(timeout_s: float = 180.0):
    """Probe the live backend in a disposable subprocess; returns
    (device_count, platform_version) or None. When the TPU relay tunnel
    is down, jax.devices() blocks INDEFINITELY (observed for hours,
    2026-08-17) — better to fail the bench fast with a clear message than
    hang the driver. The platform_version feeds the version-scoped cache
    key so a libtpu/terminal roll starts a fresh cache subdir."""
    import subprocess

    code = ("import jax\n"
            "d = jax.devices()\n"
            "try:\n"
            "    pv = jax.extend.backend.get_backend().platform_version\n"
            "except Exception:\n"
            "    pv = ''\n"
            "print(len(d)); print(str(pv).replace(chr(10), ' '))\n")
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return (1, "cpu")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        if out.returncode != 0:
            print(f"# backend probe rc={out.returncode}; stderr tail:\n"
                  + "\n".join(out.stderr.strip().splitlines()[-5:]),
                  file=sys.stderr)
            return None
        lines = out.stdout.strip().splitlines()
        return (int(lines[0]), lines[1] if len(lines) > 1 else "")
    except subprocess.TimeoutExpired:
        print(f"# backend probe timed out after {timeout_s:.0f}s "
              "(jax.devices() blocked — relay tunnel down)", file=sys.stderr)
        return None
    except Exception as e:
        print(f"# backend probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def _retry_without_cache():
    """Re-exec this bench with the persistent cache disabled (stale AOT
    entries hard-fail on backend build skew instead of degrading). The
    child's contract JSON flows to OUR real stdout."""
    import subprocess

    log_ts("cache entries look poisoned — retrying once with the "
           "persistent compilation cache DISABLED")
    env = dict(os.environ)
    env["BRAINFM_DISABLE_CACHE"] = "1"
    env["BRAINFM_BENCH_RETRY"] = "1"
    rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                        env=env, stdout=_REAL_STDOUT, stderr=2,
                        cwd=os.path.dirname(os.path.abspath(__file__))
                        ).returncode
    sys.stderr.flush()
    os._exit(rc)


def main():
    probe = _probe_backend()
    if probe is None:
        print("# FATAL: TPU backend unreachable (relay down?) — "
              "aborting instead of hanging", file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)
    cache_dir = setup_compilation_cache(platform_version=probe[1])
    # a COLD cache (fresh version-scoped subdir after a libtpu roll, or
    # cache disabled) means every stage pays a full compile — r4 lost both
    # north-star secondaries to a 348 s cold primary compile. The tiled
    # stage (least informative secondary) is skipped by policy when cold.
    global COLD_CACHE
    try:
        # "warm" requires at least one multi-MB entry: the stage graphs
        # cache at 14-35 MB, while ad-hoc scripts leave only small
        # entries — a subdir freshly created by one of those must still
        # count as cold for the big stages (it did not this round:
        # cold=False with the primary graph absent cost a 238 s compile
        # inside the budget)
        entries = [f for f in os.listdir(cache_dir) if f != "KEY.txt"]
        COLD_CACHE = (not cache_dir
                      or not any(os.path.getsize(os.path.join(cache_dir, f))
                                 > 5e6 for f in entries))
    except OSError:
        COLD_CACHE = True
    STAGES["cache_cold"] = COLD_CACHE
    log_ts(f"backend: {probe[0]} device(s), cache={cache_dir} "
           f"(cold={COLD_CACHE})")
    try:
        _run()
    except Exception as e:
        if (looks_like_cache_poisoning(e)
                and os.environ.get("BRAINFM_BENCH_RETRY") != "1"):
            print(f"# poisoned-cache failure: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
            _retry_without_cache()
        raise


def _run():
    # test hook (tests/test_driver_contract.py): synthesize the round-3
    # failure — a poisoned-cache error on first attempt — so the
    # retry-without-cache path is exercised end-to-end
    if (os.environ.get("BRAINFM_BENCH_FAULT") == "poison"
            and os.environ.get("BRAINFM_BENCH_RETRY") != "1"):
        raise RuntimeError("FAILED_PRECONDITION: libtpu version mismatch "
                           "(synthetic fault injection)")
    from brainfm_tpu.config import AttrDict
    from brainfm_tpu.infer.api import Inferencer
    from brainfm_tpu.synth import SynthStatic, synth_item
    from brainfm_tpu.synth.engine import SubjectBank, build_knobs_stack

    # SMOKE mode: tiny shapes so the full contract path (all stages, both
    # emissions, the summary) runs on CPU in minutes — the contract
    # regression test, not a performance measurement
    VOL = 48 if SMOKE else 220
    WIN = (32, 32, 32) if SMOKE else (160, 160, 160)
    STRIDE = (16, 16, 16) if SMOKE else (80, 80, 80)
    FM, NL = (8, 3) if SMOKE else (64, 6)
    GSIZE = (32, 32, 32) if SMOKE else (160, 160, 160)
    TSIZE = (32, 32, 32) if SMOKE else (128, 128, 128)

    cfg = AttrDict.from_nested({
        "task": {"T1": True, "T2": True, "FLAIR": True, "CT": True,
                 "segmentation": True, "distance": True,
                 "registration": True, "bias_field": True},
        "generator": {"left_hemis_only": False, "size": list(WIN)},
        "losses": {"uncertainty": None},
        "backbone": "unet3d", "f_maps": FM, "num_levels": NL,
        "num_groups": 8, "layer_order": "gcl", "unit_feat": False,
        "task_f_maps": [FM], "max_surf_distance": 3.0,
    })
    log_ts("imports done; building Inferencer (jit init)...")
    inf = Inferencer(cfg, ckpt_path=None, compute_dtype=jnp.bfloat16,
                     exact=False)
    log_ts("Inferencer ready")

    # whole-brain 1mm volume (reference inference shape, 220^3 twin of
    # demo_test / cfgs/trainer/default_val.yaml:10)
    vol = jnp.asarray(np.random.default_rng(0).random((VOL,) * 3),
                      jnp.float32)

    def sync(out):
        # the dispatch link is fully async and block_until_ready does not
        # block; a small dependent transfer is the only reliable fence
        return np.asarray(out["T1"][0, 0, 0])

    # ---- PRIMARY: whole-volume single-dispatch forward. No tile overlap
    # redundancy (the stride-80 walk recomputes ~3.1x the volume's voxels)
    # and no blend seams; dropping the decoder feature pyramid
    # (keep_feat=False) is the HBM headroom that lets the L6 flagship fit
    # 220^3 on one chip (infer/api.py, BASELINE.md)
    log_ts("compiling/loading whole-volume graph...")
    _tc = time.time()
    out = inf.evaluate_image(vol, run_postprocess=False, keep_feat=False)
    sync(out)
    STAGES["primary_compile_s"] = round(time.time() - _tc, 1)
    log_ts("whole-volume graph ready")
    # constant-folding guard (ARCHITECTURE.md measurement trap): a second,
    # different input must yield a different output — a zero-arg/closed-
    # over jit would constant-fold and return identical values
    vol2 = vol.at[0, 0, 0].set(vol[0, 0, 0] + 0.5)
    out2 = inf.evaluate_image(vol2, run_postprocess=False, keep_feat=False)
    assert not np.allclose(sync(out), sync(out2)), \
        "bench inputs are being constant-folded — thread them as jit args"

    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        out = inf.evaluate_image(vol, run_postprocess=False, keep_feat=False)
        sync(out)
    dt = (time.time() - t0) / n_rep
    vols_per_sec = 1.0 / dt

    # ---- emit the driver-contract JSON line NOW: the remote-compile
    # relay can take minutes per fresh graph, and the secondary benches
    # below each jit a large graph — a timeout there must not cost the
    # primary metric (this cost us two timed-out bench runs on 2026-08-16)
    emit_contract(vols_per_sec)
    STAGES["whole_volume_ms"] = round(dt * 1e3)
    budget = float(os.environ.get("BENCH_BUDGET_S", "460"))
    print(f"# whole-volume inference: {dt*1e3:.0f} ms / {VOL}^3 volume "
          f"(single dispatch, bf16, keep_feat=False)", file=sys.stderr)

    # secondaries in NORTH-STAR PRIORITY ORDER (VERDICT r4 #2: r4's cold
    # cache burned the budget on the tiled fallback and SKIPPED both
    # north-star secondaries): train step -> generator (pathology off AND
    # on) -> tiled fp32 LAST (and skipped by policy on a cold cache).
    # Each stage gates on remaining budget, logs what it skipped, and
    # records its own compile/warmup seconds in the summary.
    import gc

    def stage_ok(name, min_left=0.0):
        """min_left: don't even start a stage whose compile alone will
        blow the remaining budget (r5: tiled started with 15 s left and
        its ~2 min window-graph compile ate the run's tail)."""
        left = budget - (time.time() - T_START)
        if left <= min_left:
            print(f"# {name} bench skipped (budget: {left:.0f}s left < "
                  f"{min_left:.0f}s stage minimum)", file=sys.stderr)
            return False
        print(f"# starting {name} bench ({left:.0f}s budget left)",
              file=sys.stderr)
        return True

    class stage_guard:
        """One failing secondary must not cost the stages after it."""

        def __init__(self, name):
            self.name = name

        def __enter__(self):
            return self

        def __exit__(self, et, ev, tb):
            if et is not None:
                print(f"# {self.name} bench FAILED: {et.__name__}: "
                      f"{str(ev)[:300]}", file=sys.stderr)
                if looks_like_cache_poisoning(ev):
                    raise ev  # let main() run the cache-disabled retry
            return et is not None

    # release the primary's canvases (~70 output channels x 220^3) and the
    # inference model before the training state — they don't fit HBM
    # together
    del out, out2
    gc.collect()

    # secondary #1: flagship L6 training step at the single-chip crop
    # (128^3; the 160^3 flagship crop trains spatially sharded across the
    # mesh 'space' axis, see parallel/spatial.py + tests/test_flagship_l6.py).
    # Reference capability: Trainer/engine.py:66 train_one_epoch.
    if stage_ok("train-step"):
        del inf
        gc.collect()
        with stage_guard("train-step"):
            from brainfm_tpu.models import build_model
            from brainfm_tpu.models.criterion import make_criterion
            from brainfm_tpu.train.step import (TrainState, build_optimizer,
                                                make_train_step)

            tcfg = AttrDict.from_nested({
                "task": {"T1": True, "segmentation": True, "distance": True,
                         "registration": True, "bias_field": True},
                "generator": {"left_hemis_only": False, "size": list(TSIZE)},
                "losses": {"uncertainty": None, "image_grad": True,
                           "registration_grad": True,
                           "bias_field_log_type": "l2"},
                "weights": {k: 1.0 for k in ("seg_ce", "seg_dice", "image",
                                             "image_grad", "bias_field_log",
                                             "distance", "registration",
                                             "registration_grad")},
                "backbone": "unet3d", "f_maps": FM, "num_levels": NL,
                "num_groups": 8, "layer_order": "gcl", "unit_feat": False,
                "task_f_maps": [FM], "max_surf_distance": 3.0,
                "label_list_segmentation_with_csf":
                    [0, 14, 15, 16, 24, 77, 85],
                "optimizer": "adamw", "lr": 1e-4, "weight_decay": 0.0,
                # save_convs: measured 15% faster than 'full' at this shape
                # (396 vs 465 ms, scripts/profile_train.py 2026-08-19)
                "clip_max_norm": 1.0, "all_samples": 1,
                "remat": "save_convs",
            })
            tcfg, tmodel = build_model(tcfg, compute_dtype=jnp.bfloat16)
            _, twd, tloss = make_criterion(tcfg)
            topt = build_optimizer(tcfg)
            rng0 = np.random.default_rng(1)
            ts = TSIZE
            xt = jnp.asarray(rng0.random((1, *ts, 1)), jnp.float32)
            tparams = jax.jit(tmodel.init)(jax.random.PRNGKey(0), xt)
            tstate = TrainState(tparams, topt.init(tparams),
                                jnp.zeros((), jnp.int32))
            tstep = make_train_step(tmodel, tcfg, twd, tloss, topt,
                                    donate=True)
            tb = {
                "samples": {"input": xt[None],
                            "bias_field_log": jnp.zeros((1, 1, *ts, 1))},
                "targets": {
                    "T1": jnp.asarray(rng0.random((1, 1, *ts, 1)),
                                      jnp.float32),
                    "segmentation": jax.nn.one_hot(jnp.asarray(
                        rng0.integers(0, 56, (1, 1, *ts)), jnp.int32), 56),
                    "distance": jnp.asarray(rng0.random((1, 1, *ts, 4)),
                                            jnp.float32),
                    "registration": jnp.asarray(rng0.random((1, 1, *ts, 3)),
                                                jnp.float32),
                },
            }
            _tc = time.time()
            tstate, m = tstep(tstate, tb, 1e-4, 0.0)
            np.asarray(m["loss_total"])
            STAGES["train_compile_s"] = round(time.time() - _tc, 1)
            t0 = time.time()
            for _ in range(3):
                tstate, m = tstep(tstate, tb, 1e-4, 0.0)
            np.asarray(m["loss_total"])
            STAGES["train_step_ms"] = round((time.time() - t0) / 3 * 1e3)
            print(f"# train step: {STAGES['train_step_ms']} ms @{ts[0]}^3 "
                  f"joint f{FM} L{NL} flagship (remat, bf16; 160^3 crop "
                  "trains space-sharded, see tests/test_flagship_l6.py)",
                  file=sys.stderr)
            del tstate, tparams, tstep, tb, xt, m
        gc.collect()
        inf = None  # rebuilt by the tiled stage if it runs

    # secondary #2: generator throughput (north-star metric #2,
    # BASELINE.json; reference: the synth DataLoader stream,
    # scripts/train.py:133-137)
    if stage_ok("generator"):
      with stage_guard("generator"):
        bshape = tuple(int(s * 1.2) for s in GSIZE)
        bank = SubjectBank(bank_shape=bshape)
        bank.add_debug_subject(seed=0, extent=tuple(int(s * 1.125)
                                                    for s in GSIZE))
        subj = bank.to_device(0)
        scfg = SynthStatic(size=GSIZE, all_samples=2, mild_samples=1)
        tasks = ("T1", "segmentation", "distance", "registration",
                 "bias_field")
        knobs = build_knobs_stack(scfg, "synth")
        _tc = time.time()
        _t, _s = synth_item(jax.random.PRNGKey(0), subj, scfg, tasks,
                            "synth", knobs)
        np.asarray(_s["input"][0, 0, 0, 0])  # sync (see above)
        STAGES["generator_compile_s"] = round(time.time() - _tc, 1)
        t0 = time.time()
        n_gen = 2 if SMOKE else 8
        for i in range(n_gen):
            _t, _s = synth_item(jax.random.PRNGKey(i + 1), subj, scfg,
                                tasks, "synth", knobs)
            np.asarray(_s["input"][0, 0, 0, 0])
        gen_dt = (time.time() - t0) / n_gen
        STAGES["generator_ms_per_item"] = round(gen_dt * 1e3, 1)
        print(f"# generator: {2 / gen_dt:.1f} samples/s @{GSIZE[0]}^3 "
              f"({gen_dt * 1e3:.1f} ms/item)", file=sys.stderr)

        # generator WITH pathology advection (Perlin shape + adaptive
        # dopri5 dopri/advection, reference default config) at the same
        # crop — north-star #2 for the full capability (VERDICT r3 #7)
        if stage_ok("generator+pathology"):
            pcfg = SynthStatic(size=GSIZE, all_samples=2, mild_samples=1,
                               pathology_prob=1.0, random_shape_prob=1.0,
                               augment_pathology=True)
            ptasks = tasks + ("pathology",)
            pknobs = build_knobs_stack(pcfg, "synth")
            _tc = time.time()
            _t, _s = synth_item(jax.random.PRNGKey(0), subj, pcfg, ptasks,
                                "synth", pknobs)
            np.asarray(_s["input"][0, 0, 0, 0])
            STAGES["generator_pathol_compile_s"] = round(time.time() - _tc, 1)
            t0 = time.time()
            for i in range(n_gen):
                _t, _s = synth_item(jax.random.PRNGKey(i + 1), subj, pcfg,
                                    ptasks, "synth", pknobs)
                np.asarray(_s["input"][0, 0, 0, 0])
            pgen_dt = (time.time() - t0) / n_gen
            STAGES["generator_pathol_ms_per_item"] = round(pgen_dt * 1e3, 1)
            print(f"# generator+pathology(dopri5): {2 / pgen_dt:.1f} "
                  f"samples/s @{GSIZE[0]}^3 ({pgen_dt * 1e3:.1f} ms/item)",
                  file=sys.stderr)
        del bank, subj, _t, _s
        gc.collect()

    # tertiary (LAST, least informative secondary — it's the >HBM
    # fallback): the tiled sliding-window path (reference demo_test.py:126
    # plan: 8x160^3 windows, stride 80), fp32 canvas = reference-parity
    # blending default. Skipped BY POLICY on a cold cache: its graph
    # compile is minutes on the relay and r4 showed it can starve the
    # stages that carry north-star numbers.
    if COLD_CACHE and not SMOKE:
        print("# tiled fp32-parity bench skipped by policy (cold "
              "compilation cache — its compile would starve nothing now, "
              "but keeps the run inside budget for a warm re-run)",
              file=sys.stderr)
    elif stage_ok("tiled fp32-parity", min_left=0 if SMOKE else 150):
        with stage_guard("tiled fp32-parity"):
            if inf is None:
                log_ts("rebuilding Inferencer for the tiled stage...")
                inf = Inferencer(cfg, ckpt_path=None,
                                 compute_dtype=jnp.bfloat16, exact=False)
            _tc = time.time()
            out = inf.evaluate_tiled(vol, stride=STRIDE, win_size=WIN,
                                     run_postprocess=False,
                                     accum_dtype=jnp.float32)
            sync(out)  # warmup/compile
            STAGES["tiled_compile_s"] = round(time.time() - _tc, 1)
            t0 = time.time()
            out2 = inf.evaluate_tiled(vol, stride=STRIDE, win_size=WIN,
                                      run_postprocess=False,
                                      accum_dtype=jnp.float32)
            sync(out2)
            STAGES["tiled_fp32_ms"] = round((time.time() - t0) * 1e3)
            print(f"# tiled inference (fp32-parity blend): "
                  f"{STAGES['tiled_fp32_ms']} ms / {VOL}^3 volume "
                  f"(stride-{STRIDE[0]} plan)", file=sys.stderr)
            del out, out2
        gc.collect()

    print(f"# bench complete in {time.time()-T_START:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    rc = 0
    try:
        main()
    except BaseException:
        # os._exit below skips the interpreter's default traceback print —
        # record the failure ourselves or it is silently lost
        import traceback
        traceback.print_exc(file=sys.stderr)
        rc = 1
    # the contract re-emit + summary run even on a failure; os._exit skips
    # interpreter cleanup AND stdio flushing — flush explicitly or output
    # lines are lost when stdout is a pipe. Exit 0 only if the contract
    # JSON actually reached stdout (rc=0 with no JSON is the r3 failure
    # mode the driver can't distinguish from success).
    finalize()
    sys.stderr.flush()
    os._exit(rc if _CONTRACT else (rc or 3))
