"""Import safety under a dead backend (VERDICT r4 #1).

The driver's multichip gate does `import __graft_entry__` in a process
whose default jax backend may be broken (round 4: skewed libtpu on the
live relay -> FAILED_PRECONDITION on the first device op). A single
module-level `jnp.asarray` in models/unet3d.py killed the parent before
the gate's forced-CPU subprocess armor could engage.

These tests arm exactly that trap — an in-process jax platform config
pointing at a nonexistent backend, which `jax.config.update` wins over
any ambient sitecustomize — then assert that importing EVERY
brainfm_tpu module plus __graft_entry__ dispatches no device op, and
that `dryrun_multichip(8)` still exits 0 (its child re-exec pins CPU).

Reference capability being protected: multi-device training,
/root/reference/scripts/train.py:154-158.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ARM_TRAP = """
import jax
jax.config.update("jax_platforms", "bogus_import_safety")
# sanity: the trap is armed — any device-op dispatch must now raise
armed = False
try:
    import jax.numpy as jnp
    jnp.zeros(())
except Exception:
    armed = True
if not armed:
    raise SystemExit("trap not armed: device op succeeded on bogus platform")
"""


def _run(code, extra_env=None, timeout=300):
    env = dict(os.environ)
    # the trap is the in-process config; scrub env knobs that could mask
    # or pre-break differently than the scenario under test
    env.pop("JAX_PLATFORMS", None)
    env.pop("_BRAINFM_DRYRUN_CHILD", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_package_imports_no_device_op():
    """Every brainfm_tpu module + __graft_entry__ must import cleanly in
    a process where any backend dispatch raises."""
    code = _ARM_TRAP + """
import importlib, pkgutil
import brainfm_tpu

failures = []


def onerror(name):
    import traceback
    failures.append((name, traceback.format_exc()))


names = ["brainfm_tpu"]
for m in pkgutil.walk_packages(brainfm_tpu.__path__, "brainfm_tpu.",
                               onerror=onerror):
    spec = importlib.util.find_spec(m.name)
    origin = getattr(spec, "origin", "") or ""
    if origin.endswith(".so") and "cpython" not in origin:
        continue  # ctypes payload (runtime/libvolcodec.so), not a module
    names.append(m.name)
for name in names:
    try:
        importlib.import_module(name)
    except Exception:
        import traceback
        failures.append((name, traceback.format_exc()))
try:
    import __graft_entry__  # noqa: F401
except Exception:
    import traceback
    failures.append(("__graft_entry__", traceback.format_exc()))
if failures:
    for name, tb in failures:
        print("IMPORT FAILED:", name)
        print(tb)
    raise SystemExit(1)
print("IMPORT_SAFETY_OK", len(names))
"""
    out = _run(code)
    assert out.returncode == 0, (out.stdout + "\n" + out.stderr)[-4000:]
    assert "IMPORT_SAFETY_OK" in out.stdout
    # make sure the walk actually saw the package (>= 30 modules)
    n = int(out.stdout.split("IMPORT_SAFETY_OK")[1].split()[0])
    assert n >= 30, f"package walk found only {n} modules"


@pytest.mark.slow
def test_dryrun_green_under_dead_backend():
    """dryrun_multichip(8) must exit 0 even when the CALLING process's
    default backend is broken — the exact round-4 driver scenario."""
    code = _ARM_TRAP + """
import __graft_entry__ as g
g.dryrun_multichip(8)
print("GATE_OK")
"""
    out = _run(code, timeout=540)
    assert out.returncode == 0, (out.stdout + "\n" + out.stderr)[-4000:]
    assert "GATE_OK" in out.stdout
