"""Gymnasium environment registration.

Registers the same ids as the reference (spin_torque_gym/__init__.py:14-32 /
envs/__init__.py:14-33). The reference registers each id twice with
conflicting max_episode_steps (a documented quirk, SURVEY.md section 1); we
register once with the effective values (the envs/__init__ ones).
"""

from __future__ import annotations

_REGISTERED = False


def register_envs(force: bool = False) -> None:
    """Register the env ids.

    ``force=True`` re-registers even when the ids already exist — needed when
    another package (e.g. the reference ``spin_torque_gym``) has overridden
    the same ids in gymnasium's process-global registry after our import.
    """
    global _REGISTERED
    if _REGISTERED and not force:
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
        existing = registry.get(env_id)
        if existing is not None:
            entry = getattr(existing, "entry_point", None)
            ours = isinstance(entry, str) and entry.startswith("spintorque_tpu.")
            if ours or not force:
                continue
            del registry[env_id]
        register(
            id=env_id,
            entry_point=entry_point,
            max_episode_steps=max_steps,
            kwargs=kwargs,
        )
    _REGISTERED = True
