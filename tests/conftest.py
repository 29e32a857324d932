"""Test configuration.

Tests run on a fake 8-device CPU backend so that multi-chip sharding paths
are exercised without TPU hardware (the driver validates the same paths via
__graft_entry__.dryrun_multichip). float64 is enabled globally: parity tests
against the float64 NumPy reference need it, and all library code is
dtype-explicit so float32 paths remain covered.
"""

import os

# Must take effect before jax initializes its backends. The machine
# environment pins JAX_PLATFORMS to the TPU backend and a sitecustomize may
# import jax at interpreter startup, so setting the env var here is not
# enough — force the platform through jax.config as well (valid until the
# first backend initialization). The test suite runs on a fake 8-device CPU
# backend; single-chip TPU runs happen via bench.py / __graft_entry__.py
# instead, and x64 parity needs real float64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    config.addinivalue_line("markers", "parity: compares against /root/reference")
