"""Gymnasium environment registration.

Registers the same ids as the reference (spin_torque_gym/__init__.py:14-32 /
envs/__init__.py:14-33). The reference registers each id twice with
conflicting max_episode_steps (a documented quirk, SURVEY.md section 1); we
register once with the effective values (the envs/__init__ ones).
"""

from __future__ import annotations

_REGISTERED = False


def register_envs() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    from gymnasium.envs.registration import register, registry

    specs = [
        (
            "SpinTorque-v0",
            "spintorque_tpu.envs.gym_adapter:GymSpinTorqueEnv",
            100,
            {"device_type": "stt_mram"},
        ),
        (
            "SpinTorqueArray-v0",
            "spintorque_tpu.envs.gym_adapter:GymSpinTorqueArrayEnv",
            200,
            {"array_size": (4, 4)},
        ),
        (
            "SkyrmionRacetrack-v0",
            "spintorque_tpu.envs.gym_adapter:GymSkyrmionRacetrackEnv",
            150,
            {},
        ),
    ]
    for env_id, entry_point, max_steps, kwargs in specs:
        if env_id in registry:
            continue
        register(
            id=env_id,
            entry_point=entry_point,
            max_episode_steps=max_steps,
            kwargs=kwargs,
        )
    _REGISTERED = True
