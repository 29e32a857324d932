"""Pallas kernel vs XLA integrator agreement (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.physics import IntegratorConfig, LLGSParams, integrate_pulse
from spintorque_tpu.ops.pallas_integrator import (
    integrate_pulse_pallas,
    pallas_supported,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
)


def _setup(B=256, seed=0):
    key = jax.random.PRNGKey(seed)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jax.random.uniform(jax.random.fold_in(key, 1), (B,), jnp.float32,
                               5e-11, 3e-10)
    cur = jax.random.uniform(jax.random.fold_in(key, 2), (B,), jnp.float32,
                             -200.0, 200.0)
    return (m[:, 0], m[:, 1], m[:, 2]), spans, cur


def test_pallas_supported_gate():
    cfg = IntegratorConfig(method="rk4")
    assert pallas_supported(PARAMS, cfg, jnp.float32)
    assert not pallas_supported(PARAMS, cfg, jnp.float64)
    tilted = PARAMS.replace(easy_axis=jnp.array([1.0, 0.0, 0.0], jnp.float32))
    assert not pallas_supported(tilted, cfg, jnp.float32)
    assert pallas_supported(PARAMS, IntegratorConfig(method="heun"), jnp.float32)
    assert not pallas_supported(
        PARAMS, IntegratorConfig(method="dop853"), jnp.float32
    )


@pytest.mark.parametrize("method", ["euler", "heun", "rk4"])
def test_pallas_matches_xla_deterministic(method):
    m0, spans, cur = _setup()
    cfg = IntegratorConfig(method=method, max_substeps=512)
    ref = integrate_pulse(m0, spans, cur, PARAMS.astype(jnp.float32), cfg)
    with jax.disable_jit():  # pallas interpret path needs eager on CPU
        pass
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        (px, py, pz), n, dt, failed = integrate_pulse_pallas(
            m0, spans, cur, PARAMS.astype(jnp.float32), cfg
        )
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref.m[0]), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(py), np.asarray(ref.m[1]), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pz), np.asarray(ref.m[2]), rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref.n_substeps))
    np.testing.assert_array_equal(np.asarray(failed), np.asarray(ref.failed))


def test_pallas_freeze_flag_matches():
    """Large currents must produce the same failed flags as the XLA path."""
    B = 128
    key = jax.random.PRNGKey(3)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jnp.full((B,), 1e-10, jnp.float32)
    # half small (fine), half large (blow-up/freeze or fallback)
    cur = jnp.where(jnp.arange(B) % 2 == 0, 50.0, 1e6).astype(jnp.float32)
    cfg = IntegratorConfig(method="rk4", max_substeps=128)
    ref = integrate_pulse((m[:, 0], m[:, 1], m[:, 2]), spans, cur,
                          PARAMS.astype(jnp.float32), cfg)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        (px, py, pz), n, dt, failed = integrate_pulse_pallas(
            (m[:, 0], m[:, 1], m[:, 2]), spans, cur, PARAMS.astype(jnp.float32), cfg
        )
    np.testing.assert_array_equal(np.asarray(failed), np.asarray(ref.failed))
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref.m[0]), rtol=2e-6, atol=2e-6)
