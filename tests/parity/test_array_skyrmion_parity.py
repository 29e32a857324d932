"""Episode parity vs the reference array and skyrmion environments.

Deterministic configurations (no thermal, no pinning for skyrmion; coupling
on for the array), identical initial conditions via reset options, identical
action sequences; obs/reward compared at rtol 1e-6 in float64.
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

from spintorque_tpu.envs.gym_adapter import (
    GymSkyrmionRacetrackEnv,
    GymSpinTorqueArrayEnv,
)


def _rand_pattern(rows, cols, seed):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(rows, cols, 3))
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


@pytest.mark.parametrize("action_mode", ["individual", "row", "column", "global"])
def test_array_episode_parity(action_mode):
    from spin_torque_gym.envs.array_env import SpinTorqueArrayEnv as RefEnv

    kwargs = dict(
        array_size=(3, 3),
        include_thermal_fluctuations=False,
        include_coupling=True,
        coupling_strength=0.2,
        coupling_type="dipolar",
        action_mode=action_mode,
        observation_mode="vector",
        max_steps=10,
    )
    ref = RefEnv(**kwargs)
    ours = GymSpinTorqueArrayEnv(**kwargs)

    init = _rand_pattern(3, 3, 42)
    options = {"initial_pattern": init.copy()}
    r_obs, _ = ref.reset(seed=0, options=dict(options))
    o_obs, _ = ours.reset(seed=0, options=dict(options))
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)

    if action_mode == "global":
        actions = [np.array([5e5, 1e-9]), np.array([-8e5, 5e-10])]
    else:
        actions = [
            np.array([1.0, 5e5, 1e-9]),
            np.array([2.0, -8e5, 5e-10]),
            np.array([0.0, 3e5, 2e-9]),
        ]
    for a in actions:
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a.copy())
        o_obs, o_rew, o_term, o_trunc, o_info = ours.step(a.copy())
        np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6, atol=1e-7)
        assert (o_term, o_trunc) == (r_term, r_trunc)
        np.testing.assert_allclose(
            o_info["pattern_similarity"], r_info["pattern_similarity"], rtol=1e-6
        )
        if r_term or r_trunc:
            break


def _patched_ref_skyrmion_env():
    """The reference SkyrmionRacetrackEnv cannot be constructed at all: its
    default racetrack params omit 'volume', which SkyrmionDevice requires
    (skyrmion_env.py:157-171 vs skyrmion_device.py:55-61) - construction
    raises RuntimeError. Documented divergence: our env ships complete
    defaults. For behavioral parity we patch the missing geometry fields in
    a subclass (they do not enter the dynamics path)."""
    from spin_torque_gym.envs.skyrmion_env import SkyrmionRacetrackEnv as RefEnv

    class PatchedRefEnv(RefEnv):
        def _get_default_racetrack_params(self):
            p = super()._get_default_racetrack_params()
            p["volume"] = p["length"] * p["width"] * p["thickness"]
            p["area"] = p["length"] * p["width"]
            return p

    return PatchedRefEnv


def test_reference_skyrmion_env_is_broken_on_arrival():
    from spin_torque_gym.envs.skyrmion_env import SkyrmionRacetrackEnv as RefEnv

    with pytest.raises(RuntimeError, match="volume"):
        RefEnv()
    # Ours constructs fine with the same (default) arguments.
    GymSkyrmionRacetrackEnv()


def test_skyrmion_episode_parity():
    RefEnv = _patched_ref_skyrmion_env()

    kwargs = dict(
        n_skyrmions=2,
        include_thermal_fluctuations=False,
        include_pinning=False,
        action_mode="continuous",
        observation_mode="vector",
        max_steps=10,
    )
    ref = RefEnv(**kwargs)
    ours = GymSkyrmionRacetrackEnv(**kwargs)

    init = np.array([[300e-9, 100e-9], [700e-9, 100e-9]])
    options = {"initial_positions": init.copy()}
    r_obs, _ = ref.reset(seed=0, options=dict(options))
    o_obs, _ = ours.reset(seed=0, options=dict(options))
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)

    actions = [
        np.array([3e11, 0.0, 0.0, 0.0, 1e-9]),
        np.array([-2e11, 1e11, 5e17, 0.0, 5e-10]),
        np.array([0.0, 0.0, 0.0, -1e17, 1e-9]),
        np.array([1e11, -1e11, 0.0, 0.0, 2e-9]),
    ]
    for a in actions:
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a.copy())
        o_obs, o_rew, o_term, o_trunc, o_info = ours.step(a.copy())
        np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6, atol=1e-6)
        assert (o_term, o_trunc) == (r_term, r_trunc)
        if r_term or r_trunc:
            break


def test_skyrmion_discrete_parity():
    RefEnv = _patched_ref_skyrmion_env()

    kwargs = dict(
        n_skyrmions=1,
        include_thermal_fluctuations=False,
        include_pinning=False,
        action_mode="discrete",
        observation_mode="vector",
        max_steps=10,
    )
    ref = RefEnv(**kwargs)
    ours = GymSkyrmionRacetrackEnv(**kwargs)
    init = np.array([[500e-9, 100e-9]])
    r_obs, _ = ref.reset(seed=0, options={"initial_positions": init.copy()})
    o_obs, _ = ours.reset(seed=0, options={"initial_positions": init.copy()})
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)
    for a in [0, 13, 27, 44, 8]:
        r_obs, r_rew, r_term, r_trunc, _ = ref.step(a)
        o_obs, o_rew, o_term, o_trunc, _ = ours.step(a)
        np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6, atol=1e-6)
        assert (o_term, o_trunc) == (r_term, r_trunc)
        if r_term or r_trunc:
            break
