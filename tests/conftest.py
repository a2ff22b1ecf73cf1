"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the idiomatic JAX answer to testing
multi-node logic — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

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
