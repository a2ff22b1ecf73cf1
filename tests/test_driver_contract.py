"""Driver-contract robustness: the two artifacts the round driver records
(`bench.py` stdout JSON, `__graft_entry__.dryrun_multichip` rc) must
survive ANY backend/cache state (VERDICT r3 #1-#3 — round 3 lost both to
a libtpu-skewed persistent cache and stdout pollution).

Fast tests cover the version-scoped cache module; the slow tier runs the
real entry points in subprocesses with a deliberately poisoned cache.
"""

import json
import os
import subprocess
import sys

import pytest

from brainfm_tpu.utils.cache import (client_build_id,
                                     looks_like_cache_poisoning,
                                     scoped_cache_dir,
                                     setup_compilation_cache)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- fast


def test_scoped_cache_dir_versioning(tmp_path):
    root = str(tmp_path / "cache")
    a = scoped_cache_dir(root, platform_version="libtpu 2026.8.1")
    b = scoped_cache_dir(root, platform_version="libtpu 2026.8.2")
    c = scoped_cache_dir(root, platform_version="libtpu 2026.8.1")
    assert a != b, "a backend build change must start a fresh subdir"
    assert a == c, "the same build must reuse its subdir"
    assert os.path.isdir(a) and os.path.isdir(b)
    key = open(os.path.join(a, "KEY.txt")).read()
    assert client_build_id() in key and "2026.8.1" in key


def test_scoped_cache_dir_no_platform(tmp_path):
    root = str(tmp_path / "cache")
    a = scoped_cache_dir(root)
    assert a == scoped_cache_dir(root)
    assert os.path.isdir(a)


def test_setup_compilation_cache_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BRAINFM_DISABLE_CACHE", "1")
    assert setup_compilation_cache(str(tmp_path / "c")) is None
    monkeypatch.delenv("BRAINFM_DISABLE_CACHE")
    d = setup_compilation_cache(str(tmp_path / "c"), platform_version="x")
    assert d is not None and os.path.isdir(d)
    import jax
    assert jax.config.jax_compilation_cache_dir == d


@pytest.mark.parametrize("msg,expect", [
    ("FAILED_PRECONDITION: libtpu version mismatch: compiled with "
     "2026.8.1 but runtime is 2026.7.2", True),
    ("cpu_aot_loader.cc: machine features of the serialized executable "
     "do not match", True),
    ("failed to deserialize AOT compilation result", True),
    ("FAILED_PRECONDITION: version skew between client and server", True),
    ("operands could not be broadcast together", False),
    ("RESOURCE_EXHAUSTED: out of memory allocating 12GB", False),
])
def test_poisoning_classifier(msg, expect):
    assert looks_like_cache_poisoning(RuntimeError(msg)) is expect


def _poisoned_cache_dir(tmp_path):
    """A cache dir full of garbage entries (the r3 failure was VALID-keyed
    entries with a skewed build; garbage keys prove the entries are never
    trusted blindly either way — the gates must not even look)."""
    d = tmp_path / "poisoned_cache"
    d.mkdir()
    for i in range(3):
        (d / f"jit_step-{'ab' * 20}{i}").write_bytes(b"\x00corrupt" * 64)
    return str(d)


# ---------------------------------------------------------------- slow


@pytest.mark.slow
def test_dryrun_survives_poisoned_cache(tmp_path):
    """The multichip gate must be green regardless of cache/backend state:
    it self-provisions a forced-CPU virtual mesh and drops every cache
    env var (VERDICT r3 #1; reference capability: multi-GPU DDP,
    scripts/train.py:154-158)."""
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = _poisoned_cache_dir(tmp_path)
    # the gate must force its own platform+device count even when the
    # caller's env disagrees (the r3 parent trusted the ambient backend)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(n_devices=2)"],
        capture_output=True, text=True, timeout=540, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout + out.stderr


@pytest.mark.slow
def test_bench_contract_survives_poisoned_cache(tmp_path):
    """bench.py end-to-end in SMOKE mode with a synthetic poisoned-cache
    failure injected on the first attempt (the exact r3 red-gate error
    string): the retry-without-cache path must still deliver the contract
    — exactly one distinct parseable JSON line on stdout (emitted twice:
    after the primary and as the final line) and a final `# BENCH SUMMARY`
    stderr line (VERDICT r3 #2-#3)."""
    env = dict(os.environ)
    env.update({
        "BRAINFM_BENCH_SMOKE": "1",
        "BRAINFM_BENCH_FAULT": "poison",
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": _poisoned_cache_dir(tmp_path),
        # budget already spent -> secondaries skip; the contract (primary
        # metric, both stdout emissions, the summary) is what's under test
        "BENCH_BUDGET_S": "0",
    })
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=540,
                         cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    # stdout: nothing but the contract line, twice, identical, parseable
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2 and lines[0] == lines[1], out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "inference_vols_per_sec_per_chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # stderr: retry actually happened, and the summary is the LAST line
    assert "retrying once" in out.stderr
    err_lines = [ln for ln in out.stderr.splitlines() if ln.strip()]
    assert err_lines[-1].startswith("# BENCH SUMMARY ")
    summary = json.loads(err_lines[-1][len("# BENCH SUMMARY "):])
    assert summary["primary_vols_per_sec"] == rec["value"]
