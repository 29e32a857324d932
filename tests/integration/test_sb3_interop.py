"""Real stable-baselines3 interop smoke (no monkeypatching).

The reference's CLI drives sb3's PPO/SAC/TD3/DQN .learn() directly
(/root/reference/spin_torque_gym/cli.py:89-129,257-277); this exercises the
same contract through our GymSpinTorqueEnv adapter with the REAL library.
Skips when stable-baselines3 isn't installed (it is an optional [sb3]
extra); CI runs it in a dedicated job that installs the extra.
"""

import numpy as np
import pytest

sb3 = pytest.importorskip("stable_baselines3")

from spintorque_tpu.envs.gym_adapter import GymSpinTorqueEnv

FAST = dict(
    include_thermal_fluctuations=False,
    max_duration=2e-10,  # few substeps per pulse: keep sb3's Python loop quick
    max_steps=8,
)


def test_sb3_ppo_continuous_learn_and_predict():
    env = GymSpinTorqueEnv(action_mode="continuous", **FAST)
    model = sb3.PPO("MlpPolicy", env, n_steps=32, batch_size=32, n_epochs=1, seed=0)
    model.learn(total_timesteps=100)

    obs, _ = env.reset(seed=1)
    action, _ = model.predict(obs, deterministic=True)
    assert action.shape == env.action_space.shape
    assert env.action_space.contains(
        np.clip(action, env.action_space.low, env.action_space.high)
    )
    obs, reward, term, trunc, info = env.step(action)
    assert np.isfinite(reward)
    assert obs.shape == env.observation_space.shape


def test_sb3_dqn_discrete_learn_and_predict():
    env = GymSpinTorqueEnv(action_mode="discrete", **FAST)
    model = sb3.DQN(
        "MlpPolicy",
        env,
        learning_starts=16,
        buffer_size=256,
        train_freq=4,
        seed=0,
    )
    model.learn(total_timesteps=100)

    obs, _ = env.reset(seed=2)
    action, _ = model.predict(obs, deterministic=True)
    assert env.action_space.contains(int(action))
    obs, reward, term, trunc, info = env.step(int(action))
    assert np.isfinite(reward)
