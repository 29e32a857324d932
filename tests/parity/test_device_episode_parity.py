"""Per-device-type episode parity + randomized parity sweep vs the reference.

Closes the round-2 verdict's parity-breadth gap: full episodes for sot_mram
and vcma_mram (explicit device params - the reference's own factory defaults
for these types crash, a documented divergence; params below are the ones
the reference's OWN integration suite uses,
/root/reference/tests/integration/test_environment.py:167-251), plus a
property-style sweep replaying seeded RANDOM action sequences across device
types at rtol 1e-6 (the reference's determinism contract,
tests/integration/test_environment.py:95-123).

Thermal off throughout: with noise on, parity is not defined (the reference
draws from the unseeded global np.random - SURVEY.md section 4).
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

# Explicit per-type device params based on the reference's integration suite
# (test_environment.py:172-246), with GEOMETRY FULLY SPECIFIED (area,
# thickness, resistances). The reference's sot/vcma factory DEFAULTS raise on
# construction (documented divergence, devices/factory.py), and when `area`
# is omitted the reference uses TWO different implied areas for one device -
# 1e-14 for pulse energy (spin_torque_env.py:476) but volume/thickness for
# SOT resistance (sot_mram.py:76) - while our DeviceParams carries a single
# canonical area (documented in docs/REFERENCE_PARITY.md). Explicit geometry
# makes both reference code paths use the same value, so episodes compare.
_GEOM = dict(
    volume=1e-24,
    area=1e-14,
    thickness=1e-9,
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1e6,
    easy_axis=np.array([0.0, 0.0, 1.0]),
    resistance_parallel=1e3,
    resistance_antiparallel=2e3,
    # The reference's RobustLLGSSolver REQUIRES 'polarization' for every
    # device type (validation.py validate_device_params); when absent (as in
    # the reference's own sot/vcma integration-test params) every solve
    # fails and the state freezes for the whole episode - see
    # test_reference_freezes_without_polarization below. Specify it so real
    # dynamics are compared.
    polarization=0.7,
)

DEVICE_CASES = {
    "stt_mram": dict(
        params=dict(_GEOM),
        action=np.array([5e6, 1e-9]),
    ),
    "sot_mram": dict(
        params=dict(_GEOM, spin_hall_angle=0.1),
        action=np.array([1e7, 1e-9]),
    ),
    "vcma_mram": dict(
        params=dict(_GEOM, vcma_coefficient=100e-6),
        action=np.array([1.5, 1e-9]),
    ),
}

INITIAL = np.array([0.25, -0.1, 0.96])
TARGET = np.array([0.0, 0.0, -1.0])


def _make_pair(device_type, device_params, max_steps=20):
    from spin_torque_gym.envs.spin_torque_env import SpinTorqueEnv as RefEnv

    cfg = dict(
        device_type=device_type,
        device_params=dict(device_params),
        include_thermal_fluctuations=False,
        max_steps=max_steps,
        action_mode="continuous",
        observation_mode="vector",
    )
    ref = RefEnv(**cfg)
    # Disable the reference's stale-observation cache (its own documented
    # bug, spin_torque_env.py:493-498) so it cannot poison the comparison.
    ref.cache_observations = False
    ours = GymSpinTorqueEnv(**cfg)
    return ref, ours


def _assert_step_parity(r, o, ctx=""):
    r_obs, r_rew, r_term, r_trunc, r_info = r
    o_obs, o_rew, o_term, o_trunc, o_info = o
    assert "error" not in r_info, f"{ctx}: reference errored: {r_info.get('error')}"
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7, err_msg=ctx)
    np.testing.assert_allclose(o_rew, r_rew, rtol=1e-6, atol=1e-7, err_msg=ctx)
    assert o_term == r_term, ctx
    assert o_trunc == r_trunc, ctx
    np.testing.assert_allclose(
        o_info["current_alignment"], r_info["current_alignment"],
        rtol=1e-6, err_msg=ctx,
    )
    np.testing.assert_allclose(
        o_info["total_energy"], r_info["total_energy"],
        rtol=1e-6, atol=1e-25, err_msg=ctx,
    )


@pytest.mark.parametrize("device_type", ["sot_mram", "vcma_mram"])
def test_episode_parity_per_device_type(device_type):
    """Full fixed-action episode parity for the non-STT device types
    (stt_mram is covered by test_env_parity.py)."""
    case = DEVICE_CASES[device_type]
    ref, ours = _make_pair(device_type, case["params"])
    options = {"initial_state": INITIAL.copy(), "target_state": TARGET.copy()}
    r_obs, _ = ref.reset(seed=11, options=dict(options))
    o_obs, _ = ours.reset(seed=11, options=dict(options))
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)

    a = case["action"]
    for i in range(6):
        r = ref.step(a.copy())
        o = ours.step(a.copy())
        _assert_step_parity(r, o, ctx=f"{device_type} step {i}")
        if r[2] or r[3]:
            break


def test_reference_freezes_without_polarization_ours_simulates():
    """Documented divergence pin: with the reference's OWN sot_mram
    integration-test params (test_environment.py:197-208 - no
    'polarization'), the reference's RobustLLGSSolver rejects EVERY solve
    ("Missing required parameter: polarization", robust_solver.py:152-190 ->
    validation.py) and silently freezes the magnetization for the whole
    episode. Our params always carry the solver's polarization fallback
    (0.7, the same default simple_solver.py:316 uses), so dynamics actually
    run."""
    params = {k: v for k, v in DEVICE_CASES["sot_mram"]["params"].items()
              if k != "polarization"}
    # Benign dynamics so OUR side provably integrates: weak anisotropy keeps
    # the per-substep precession angle ~0.35 rad (stable RK4), and a ZERO
    # current pulse skips the spin-torque term entirely (both solvers gate on
    # |J| > 1e-12), leaving pure damped precession.
    params["uniaxial_anisotropy"] = 1e3
    ref, ours = _make_pair("sot_mram", params)
    options = {"initial_state": INITIAL.copy(), "target_state": TARGET.copy()}
    r_obs0, _ = ref.reset(seed=7, options=dict(options))
    o_obs0, _ = ours.reset(seed=7, options=dict(options))

    a = np.array([0.0, 1e-9])
    r_obs, _, _, _, r_info = ref.step(a.copy())
    o_obs, _, _, _, o_info = ours.step(a.copy())
    # Reference: frozen exactly at the initial magnetization.
    np.testing.assert_array_equal(r_obs[:3], r_obs0[:3])
    # Ours: the solve was accepted and the magnetization actually moved.
    assert o_info["simulation_success"]
    assert np.abs(np.asarray(o_obs[:3]) - np.asarray(o_obs0[:3])).max() > 1e-6


@pytest.mark.parametrize("device_type", sorted(DEVICE_CASES))
@pytest.mark.parametrize("episode_seed", [0, 1])
def test_randomized_episode_parity_sweep(device_type, episode_seed):
    """Property-style sweep: seeded RANDOM continuous actions (current and
    duration both drawn over their legal ranges, durations capped at 1 ns to
    bound the reference's Python-loop runtime) and random initial/target
    states, replayed through both envs step by step."""
    case = DEVICE_CASES[device_type]
    # Seed from the device type's INDEX, not hash(): str hashing is
    # randomized per interpreter, which would make the "seeded" sweep draw
    # different episodes every run.
    type_idx = sorted(DEVICE_CASES).index(device_type)
    rng = np.random.default_rng(1000 * episode_seed + 7 * type_idx)

    ref, ours = _make_pair(device_type, case["params"], max_steps=10)

    m0 = rng.normal(size=3)
    m0 /= np.linalg.norm(m0)
    target = np.array([0.0, 0.0, 1.0]) if rng.random() < 0.5 else TARGET
    options = {"initial_state": m0.copy(), "target_state": target.copy()}
    seed = int(rng.integers(0, 2**31 - 1))
    r_obs, _ = ref.reset(seed=seed, options=dict(options))
    o_obs, _ = ours.reset(seed=seed, options=dict(options))
    np.testing.assert_allclose(o_obs, r_obs, rtol=1e-6, atol=1e-7)

    max_current = 2e6 if device_type != "vcma_mram" else 2.0
    for i in range(4):
        a = np.array(
            [
                rng.uniform(-max_current, max_current),
                rng.uniform(1e-10, 1e-9),
            ]
        )
        r = ref.step(a.copy())
        o = ours.step(a.copy())
        _assert_step_parity(
            r, o, ctx=f"{device_type} seed={episode_seed} step {i} action={a}"
        )
        if r[2] or r[3]:
            break
