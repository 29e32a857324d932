"""RL environments: vectorized functional cores + Gymnasium adapters.

TPU counterpart of spin_torque_gym/envs (__init__.py:14-33).
"""

from .spin_torque import EnvState, SpinTorqueEnv, SpinTorqueEnvConfig, TimeStep

try:
    from .gym_adapter import GymSpinTorqueEnv, VectorSpinTorqueEnv
except ImportError:  # gymnasium unavailable
    GymSpinTorqueEnv = None
    VectorSpinTorqueEnv = None

__all__ = [
    "EnvState",
    "SpinTorqueEnv",
    "SpinTorqueEnvConfig",
    "TimeStep",
    "GymSpinTorqueEnv",
    "VectorSpinTorqueEnv",
]
