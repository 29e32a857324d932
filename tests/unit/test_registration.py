"""Gymnasium registry ownership: gymnasium keeps ONE process-global registry,
and the reference package (imported by the parity suite) registers the same
env ids (spin_torque_gym/__init__.py:14-32). ``register_envs(force=True)``
must reclaim the ids for spintorque_tpu without disturbing foreign ids."""

import gymnasium as gym
from gymnasium.envs.registration import register, registry

from spintorque_tpu.registration import register_envs


def _entry(env_id):
    spec = registry[env_id]
    return spec.entry_point


def test_force_reclaims_ids_after_foreign_override():
    register_envs()
    # Simulate the reference package overriding our id (gymnasium warns and
    # replaces the spec in place).
    register(
        id="SpinTorque-v0",
        entry_point="spin_torque_gym.envs:SpinTorqueEnv",
        max_episode_steps=100,
    )
    assert _entry("SpinTorque-v0").startswith("spin_torque_gym")

    register_envs(force=True)
    assert _entry("SpinTorque-v0").startswith("spintorque_tpu.")
    # Untouched ids keep their (already ours) specs.
    assert _entry("SpinTorqueArray-v0").startswith("spintorque_tpu.")
    assert _entry("SkyrmionRacetrack-v0").startswith("spintorque_tpu.")

    env = gym.make("SpinTorque-v0")
    try:
        assert "rk4_noise" in env.unwrapped.get_solver_info()
    finally:
        env.close()


def test_force_is_idempotent_and_nonforce_skips():
    register_envs(force=True)
    before = _entry("SpinTorque-v0")
    register_envs(force=True)
    assert _entry("SpinTorque-v0") == before
    register_envs()  # no-op
    assert _entry("SpinTorque-v0") == before
