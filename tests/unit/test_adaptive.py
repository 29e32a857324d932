"""Tests for the adaptive RK45 batched solver (llgs_solver.py counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.physics import (
    LLGSParams,
    find_stable_states,
    integrate_adaptive,
    llgs_solver_rhs,
    trajectory_energy,
    trajectory_torques,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.05, uniaxial_anisotropy=1.2e6,
    volume=1e-23, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float64),
)

# beta*I is comparable to gamma*H at I ~ 5e-11 for these parameters; the
# adaptive path (like the reference's scipy RK45) is only usable where the
# ODE is not absurdly stiff.
SMALL_CURRENT = 1e-11


def _fixed_rk4_same_rhs(m0, span, current, n_steps=4000):
    """Dense fixed-step RK4 on the SAME RHS, as the accuracy reference."""
    mx, my, mz = m0
    dt = span / n_steps

    def f(a, b, c):
        n = jnp.sqrt(a * a + b * b + c * c)
        return llgs_solver_rhs(a / n, b / n, c / n, current, PARAMS)

    def body(i, m):
        a, b, c = m
        k1 = f(a, b, c)
        k2 = f(a + dt / 2 * k1[0], b + dt / 2 * k1[1], c + dt / 2 * k1[2])
        k3 = f(a + dt / 2 * k2[0], b + dt / 2 * k2[1], c + dt / 2 * k2[2])
        k4 = f(a + dt * k3[0], b + dt * k3[1], c + dt * k3[2])
        out = tuple(
            m[j] + dt / 6 * (k1[j] + 2 * k2[j] + 2 * k3[j] + k4[j])
            for j in range(3)
        )
        n = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2)
        return (out[0] / n, out[1] / n, out[2] / n)

    return jax.lax.fori_loop(0, n_steps, body, (mx, my, mz))


def test_adaptive_matches_dense_fixed_step():
    B = 8
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float64)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    span = 2e-10
    cur = jnp.full((B,), SMALL_CURRENT, jnp.float64)
    ada = integrate_adaptive(
        m0, jnp.full((B,), span, jnp.float64), cur, PARAMS, rtol=1e-8, atol=1e-11
    )
    assert bool(ada.success.all()), (np.asarray(ada.n_steps), np.asarray(ada.n_rejected))
    ref = _fixed_rk4_same_rhs(m0, span, cur)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(ada.m[c]), np.asarray(ref[c]), rtol=1e-5, atol=1e-6
        )


def test_adaptive_step_control_responds_to_tolerance():
    B = 4
    m = jnp.tile(jnp.asarray([[0.5, 0.1, 0.86]], jnp.float64), (B, 1))
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.full((B,), 5e-10, jnp.float64)
    cur = jnp.zeros((B,), jnp.float64)
    loose = integrate_adaptive(m0, spans, cur, PARAMS, rtol=1e-4, atol=1e-7)
    tight = integrate_adaptive(m0, spans, cur, PARAMS, rtol=1e-10, atol=1e-13)
    assert bool(loose.success.all()) and bool(tight.success.all())
    assert int(tight.n_steps[0]) > int(loose.n_steps[0])


def test_stable_states_relaxation():
    states = find_stable_states(PARAMS.astype(jnp.float32), n_seeds=32,
                                relax_time=3e-9)
    assert 1 <= len(states) <= 3
    assert np.all(np.abs(np.abs(states[:, 2]) - 1.0) < 0.05)


def test_trajectory_diagnostics():
    m_traj = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float64)
    e = trajectory_energy(m_traj, PARAMS)
    assert float(e[0]) < float(e[1])  # easy axis lower energy than hard axis
    tq = trajectory_torques(m_traj, 0.0, PARAMS)
    assert float(tq[0]) < 1e-3  # no torque at the pole
