"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the idiomatic JAX answer to testing
multi-node logic — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU aborts the whole process (LogFatal in rendezvous.cc) when the 8
# emulated devices don't all reach a collective within 40 s — on a
# few-core host the per-device conv work between halo exchanges of the
# wide L6 tests takes minutes, so raise the emulation-only timeouts
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
               " --xla_cpu_collective_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = _flags.strip()

# the environment's sitecustomize pre-registers a TPU-relay jax plugin and may
# pin the platform before conftest runs; force the selection back to CPU
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    # The environment's TPU-relay sitecustomize can leave a non-daemon native
    # thread that blocks interpreter exit; hard-exit once pytest has fully
    # reported.
    import sys
    sys.stdout.flush()
    sys.stderr.flush()
    status = getattr(config, "_brainfm_exitstatus", 0)
    os._exit(int(status))


def pytest_sessionfinish(session, exitstatus):
    session.config._brainfm_exitstatus = exitstatus
