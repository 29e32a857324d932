"""Episode-level parity vs the reference SpinTorqueEnv (deterministic mode).

Replays a recorded action sequence from identical (initial, target) states
with thermal noise off and compares per-step observations and rewards at
rtol 1e-6 - the contract from the reference's own determinism test
(tests/integration/test_environment.py:95-123).

Known reference bugs deliberately NOT replicated (SURVEY.md section 7):
  * stale observation cache keyed on rounded m (spin_torque_env.py:493-498):
    avoided by comparing only trajectories where m changes every step.
"""

import os
import sys

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

from spintorque_tpu.envs.gym_adapter import GymSpinTorqueEnv


def _make_ref_env(**kwargs):
    from spin_torque_gym.envs.spin_torque_env import SpinTorqueEnv as RefEnv

    env = RefEnv(**kwargs)
    # Disable the reference's stale-observation cache so its own bug doesn't
    # poison the comparison (documented divergence).
    env.cache_observations = False
    return env


COMMON = dict(
    device_type="stt_mram",
    include_thermal_fluctuations=False,
    max_steps=20,
    action_mode="continuous",
    observation_mode="vector",
)

INITIAL = np.array([0.25, -0.1, 0.96])
TARGET = np.array([0.0, 0.0, -1.0])

ACTIONS = [
    np.array([1.0e6, 5e-10]),
    np.array([-1.5e6, 1e-9]),
    np.array([0.5e6, 2e-10]),
    np.array([2.0e6, 1e-9]),
    np.array([-0.3e6, 7e-10]),
]


def test_episode_parity_vector_obs():
    ref = _make_ref_env(**COMMON)
    ours = GymSpinTorqueEnv(**COMMON)

    options = {"initial_state": INITIAL.copy(), "target_state": TARGET.copy()}
    ref_obs, _ = ref.reset(seed=123, options=dict(options))
    our_obs, _ = ours.reset(seed=123, options=dict(options))
    np.testing.assert_allclose(our_obs, ref_obs, rtol=1e-6, atol=1e-7)

    for a in ACTIONS:
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a.copy())
        o_obs, o_rew, o_term, o_trunc, o_info = ours.step(a.copy())
        np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6, atol=1e-7)
        assert o_term == r_term
        assert o_trunc == r_trunc
        np.testing.assert_allclose(
            o_info["current_alignment"], r_info["current_alignment"], rtol=1e-6
        )
        np.testing.assert_allclose(
            o_info["total_energy"], r_info["total_energy"], rtol=1e-6, atol=1e-25
        )
        if r_term or r_trunc:
            break


def test_discrete_mode_reference_is_broken_ours_works():
    """Documented divergence (SURVEY.md section 7 'bugs to consciously not
    replicate'): the reference's SafetyWrapper mangles scalar discrete
    actions into [0, 1e-12] (monitoring.py:299-303: shape-() actions are
    replaced), after which _parse_action raises and the catch-all returns
    reward -1 with truncated=True (spin_torque_env.py:397-407). Discrete
    mode in the reference therefore can never take a real step. We assert
    the reference's broken behavior to pin it, and that our discrete mode
    actually decodes the documented 5x4 action table."""
    cfg = dict(COMMON, action_mode="discrete")
    ref = _make_ref_env(**cfg)
    ours = GymSpinTorqueEnv(**cfg)
    options = {"initial_state": INITIAL.copy(), "target_state": TARGET.copy()}
    ref.reset(seed=5, options=dict(options))
    ours.reset(seed=5, options=dict(options))

    r_obs, r_rew, r_term, r_trunc, r_info = ref.step(7)
    assert r_rew == -1.0 and r_trunc and "error" in r_info  # broken on arrival

    o_obs, o_rew, o_term, o_trunc, o_info = ours.step(7)
    assert "error" not in o_info
    # Action 7 -> current level 1 (-1e6), duration level 3 (2 ns).
    np.testing.assert_allclose(o_obs[10], -0.5, rtol=1e-6)  # J / max_current
    np.testing.assert_allclose(o_obs[11], 0.4, rtol=1e-6)  # dt / max_duration
    assert o_info["step_count"] == 1


def test_success_episode_parity():
    """Drive toward switching so the success branch is compared too."""
    ref = _make_ref_env(**COMMON)
    ours = GymSpinTorqueEnv(**COMMON)
    options = {
        "initial_state": np.array([0.05, 0.05, -0.997]),
        "target_state": np.array([0.0, 0.0, -1.0]),
    }
    ref_obs, r_info0 = ref.reset(seed=1, options=dict(options))
    our_obs, o_info0 = ours.reset(seed=1, options=dict(options))
    a = np.array([0.0, 1e-10])
    r_obs, r_rew, r_term, r_trunc, _ = ref.step(a.copy())
    o_obs, o_rew, o_term, o_trunc, _ = ours.step(a.copy())
    assert r_term and o_term  # aligned with target -> immediate success
    np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6)
