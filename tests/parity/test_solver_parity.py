"""Trajectory parity vs the reference SimpleLLGSSolver (deterministic mode).

The contract (SURVEY.md section 7 / reference
tests/integration/test_environment.py:95-123): with thermal noise off and
float64, fixed trajectories must match the reference at tight tolerances.
The reference package is imported read-only from /root/reference; these tests
skip automatically when it is absent.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "spin_torque_gym"))

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not available"),
]

if HAVE_REFERENCE:
    sys.path.insert(0, REFERENCE_PATH)
    from spin_torque_gym.physics.simple_solver import SimpleLLGSSolver as RefSolver

from spintorque_tpu.physics import LLGSSolver

DEVICE_PARAMS = {
    "volume": 50e-9 * 100e-9 * 2e-9,
    "saturation_magnetization": 800e3,
    "damping": 0.01,
    "uniaxial_anisotropy": 1.2e6,
    "polarization": 0.7,
    "easy_axis": np.array([0.0, 0.0, 1.0]),
}


def _ref_solve(method, m0, span, current):
    solver = RefSolver(method=method, timeout=30.0)
    solver.optimizer.cache.clear() if hasattr(solver.optimizer.cache, "clear") else None
    return solver.solve(
        m_initial=np.array(m0, float),
        time_span=(0.0, span),
        device_params=DEVICE_PARAMS,
        current_func=(lambda t: current) if current else None,
        field_func=None,
        thermal_noise=False,
        temperature=300.0,
    )


@pytest.mark.parametrize("method", ["euler", "rk4"])
@pytest.mark.parametrize(
    "m0,span,current",
    [
        ([0.1, -0.2, 0.97], 1e-10, 0.0),
        ([0.1, -0.2, 0.97], 1e-9, 1.5e6),
        ([0.0, 0.0, 1.0], 5e-10, -2e6),
        ([0.7, 0.7, 0.14], 2.3e-10, 5e5),
        ([0.1, 0.0, -0.99], 1e-12, 1e6),  # minimum-span path (n=100)
    ],
)
def test_final_state_parity(method, m0, span, current):
    ref = _ref_solve(method, m0, span, current)
    assert ref["success"], ref["message"]
    ours = LLGSSolver(method=method, dtype=jnp.float64).solve(
        np.array(m0, float), (0.0, span), DEVICE_PARAMS, current=current
    )
    np.testing.assert_allclose(
        np.asarray(ours["m"]), ref["m"][-1], rtol=1e-9, atol=1e-12
    )
    assert int(ours["n_steps"]) == int(ref["n_steps"])


def test_trajectory_parity_rk4():
    m0 = [0.3, -0.1, 0.95]
    span, current = 3e-10, 1.8e6
    ref = _ref_solve("rk4", m0, span, current)
    ours = LLGSSolver(method="rk4", max_substeps=400, dtype=jnp.float64).solve(
        np.array(m0, float), (0.0, span), DEVICE_PARAMS,
        current=current, return_trajectory=True,
    )
    traj = np.asarray(ours["m"])  # (max_substeps+1, 3)
    n = int(ref["n_steps"])
    np.testing.assert_allclose(traj[: n + 1], ref["m"], rtol=1e-9, atol=1e-12)


def test_batched_heterogeneous_parity():
    """A batch with different (m0, span, J) per env must match per-env
    reference solves - exercises the masked variable-duration loop."""
    cases = [
        ([0.1, -0.2, 0.97], 1e-10, 1e6),
        ([0.5, 0.5, 0.7], 4e-10, -1.2e6),
        ([0.0, 0.1, 0.99], 1e-9, 2e6),
        ([0.9, 0.1, -0.4], 7.7e-11, 0.0),
    ]
    m0 = np.array([c[0] for c in cases], float)
    # integrate_pulse takes pre-normalized state (the env normalizes on
    # reset, the facade normalizes like simple_solver.py:119).
    m0 = m0 / np.linalg.norm(m0, axis=-1, keepdims=True)
    spans = np.array([c[1] for c in cases])
    currents = np.array([c[2] for c in cases])

    from spintorque_tpu.physics import IntegratorConfig, integrate_pulse
    from spintorque_tpu.physics.solver import params_from_dict

    params = params_from_dict(DEVICE_PARAMS, jnp.float64)
    res = integrate_pulse(
        (jnp.asarray(m0[:, 0]), jnp.asarray(m0[:, 1]), jnp.asarray(m0[:, 2])),
        jnp.asarray(spans),
        jnp.asarray(currents),
        params,
        IntegratorConfig(method="rk4", max_substeps=1100),
    )
    got = np.stack([np.array(c) for c in res.m], axis=-1)
    for i, (m, s, j) in enumerate(cases):
        ref = _ref_solve("rk4", m, s, j)
        np.testing.assert_allclose(got[i], ref["m"][-1], rtol=1e-9, atol=1e-12)
