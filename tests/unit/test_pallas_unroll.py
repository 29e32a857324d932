"""Unrolled in-kernel substep loop must be numerically identical to the
rolled loop: masked overshoot iterations are exact no-ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spintorque_tpu.physics import IntegratorConfig, LLGSParams
from spintorque_tpu.ops import pallas_integrator as pi

PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
).astype(jnp.float32)


@pytest.mark.parametrize("unroll", [2, 3])
def test_unrolled_loop_matches_rolled(unroll):
    B = 128
    key = jax.random.PRNGKey(4)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    # spans chosen so per-env n varies and nmax is NOT a multiple of the
    # unroll factor (overshoot iterations exercised)
    spans = jnp.linspace(5e-11, 2.37e-10, B).astype(jnp.float32)
    cur = jax.random.uniform(jax.random.fold_in(key, 1), (B,), jnp.float32,
                             -200.0, 200.0)
    cfg = IntegratorConfig(method="rk4", max_substeps=512)
    try:
        pi._SUBSTEP_UNROLL_OVERRIDE = 1
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            (ax, ay, az), n1, _, f1 = pi.integrate_pulse_pallas(
                m0, spans, cur, PARAMS, cfg)
        pi._SUBSTEP_UNROLL_OVERRIDE = unroll
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            (bx, by, bz), n2, _, f2 = pi.integrate_pulse_pallas(
                m0, spans, cur, PARAMS, cfg)
    finally:
        pi._SUBSTEP_UNROLL_OVERRIDE = None
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(ax), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(ay), np.asarray(by))
    np.testing.assert_array_equal(np.asarray(az), np.asarray(bz))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.parametrize("B,unroll,chains", [(256, 1, 2), (200, 4, 2), (512, 4, 4)])
def test_dual_chain_matches_single(B, unroll, chains):
    """Dual-chain software pipelining (two independent half-tile chains per
    loop iteration) must be bitwise identical to the single chain: the same
    per-lane ops run, only their scheduling freedom changes. Covers an odd
    batch (padding rows land in chain B) and composition with unroll."""
    key = jax.random.PRNGKey(9)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.linspace(5e-11, 2.37e-10, B).astype(jnp.float32)
    cur = jax.random.uniform(jax.random.fold_in(key, 1), (B,), jnp.float32,
                             -200.0, 200.0)
    cfg = IntegratorConfig(method="rk4", max_substeps=512)
    try:
        pi._SUBSTEP_UNROLL_OVERRIDE = unroll
        pi._CHAINS_OVERRIDE = 1
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            (ax, ay, az), n1, _, f1 = pi.integrate_pulse_pallas(
                m0, spans, cur, PARAMS, cfg)
        pi._CHAINS_OVERRIDE = chains
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            (bx, by, bz), n2, _, f2 = pi.integrate_pulse_pallas(
                m0, spans, cur, PARAMS, cfg)
    finally:
        pi._SUBSTEP_UNROLL_OVERRIDE = None
        pi._CHAINS_OVERRIDE = None
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(ax), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(ay), np.asarray(by))
    np.testing.assert_array_equal(np.asarray(az), np.asarray(bz))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_dual_chain_general_axis_matches():
    """Dual chain with the general (tilted-axis) RHS: the extra easy-axis
    operand arrays must slice into the correct half-tiles."""
    B = 128
    key = jax.random.PRNGKey(11)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.linspace(5e-11, 1.6e-10, B).astype(jnp.float32)
    cur = jnp.full((B,), -150.0, jnp.float32)
    tilted = PARAMS.replace(easy_axis=jnp.array([0.6, 0.0, 0.8], jnp.float32))
    cfg = IntegratorConfig(method="rk4", max_substeps=512)
    try:
        pi._CHAINS_OVERRIDE = 1
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            a = pi.integrate_pulse_pallas(m0, spans, cur, tilted, cfg)
        pi._CHAINS_OVERRIDE = 2
        jax.clear_caches()
        with pltpu.force_tpu_interpret_mode():
            b = pi.integrate_pulse_pallas(m0, spans, cur, tilted, cfg)
    finally:
        pi._CHAINS_OVERRIDE = None
        jax.clear_caches()
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(a[0][c]), np.asarray(b[0][c]))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
