"""Quickstart: the Gymnasium-compatible adapter.

Run: python examples/quickstart_gymnasium.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gymnasium as gym
import numpy as np

import spintorque_tpu  # noqa: F401  (registers env ids)

env = gym.make("SpinTorque-v0", include_thermal_fluctuations=False)
obs, info = env.reset(seed=0)
total = 0.0
for step in range(20):
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    total += reward
    if terminated or truncated:
        break
print(f"episode finished after {step+1} steps, return {total:.3f}, "
      f"alignment {info['current_alignment']:.3f}")
