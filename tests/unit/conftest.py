"""Shared unit-test fixtures."""

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def threefry_bits(monkeypatch):
    """Substitute the Pallas kernel's raw-bits source with a threefry stream.

    pltpu.prng_random_bits returns all zeros under interpret mode on CPU, so
    the hardware PRNG itself can only be validated on a TPU
    (scripts/verify_pallas_thermal.py). Everything downstream of the bits —
    the signed-int32 mantissa-bitcast uniforms, Box-Muller, sigma scaling,
    sort alignment — is exercised here on real random bits. A Python-side
    trace-time counter gives each call site a distinct key (inside fori_loop
    bodies the stream repeats per iteration, which is fine for these checks).
    """
    from spintorque_tpu.ops import pallas_integrator as pi

    counter = {"n": 0}

    def fake_bits(shape):
        counter["n"] += 1
        key = jax.random.PRNGKey(counter["n"])
        bits = jax.random.bits(key, shape, jnp.uint32)
        return jax.lax.bitcast_convert_type(bits, jnp.int32)

    monkeypatch.setattr(pi, "_prng_random_bits", fake_bits)
    jax.clear_caches()  # drop jitted traces captured with the real source
    yield
    jax.clear_caches()
