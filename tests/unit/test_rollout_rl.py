"""Tests for rollout collection and the PPO trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.parallel import random_policy, rollout_jit, summarize
from spintorque_tpu.rl import PPOConfig, PPOTrainer


def make_env(batch=16, **kw):
    defaults = dict(include_thermal=False, max_duration=1e-10, dtype="float32")
    defaults.update(kw)
    return SpinTorqueEnv(batch_size=batch, config=SpinTorqueEnvConfig(**defaults))


def test_rollout_shapes_and_summary():
    env = make_env(batch=8)
    policy = random_policy(env)
    run = rollout_jit(env, policy, num_steps=12)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, obs, traj = run(None, state, obs, jax.random.PRNGKey(1))
    assert traj.obs.shape == (12, 8, 12)
    assert traj.reward.shape == (12, 8)
    stats = summarize(traj)
    assert int(stats["steps"]) == 12 * 8
    assert np.isfinite(float(stats["mean_reward"]))


def test_rollout_discrete_policy():
    env = make_env(batch=4, action_mode="discrete")
    run = rollout_jit(env, random_policy(env), num_steps=5)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, obs, traj = run(None, state, obs, jax.random.PRNGKey(1))
    a = np.asarray(traj.action)
    assert a.shape == (5, 4)
    assert (a >= 0).all() and (a < env.num_actions).all()


def test_ppo_trainer_improves_or_at_least_runs():
    env = make_env(batch=32, max_steps=8)
    trainer = PPOTrainer(
        env, PPOConfig(rollout_steps=8, num_epochs=2, num_minibatches=2,
                       hidden_sizes=(32, 32))
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    for _ in range(3):
        ts, metrics = trainer.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts.update_count) == 3


def test_ppo_discrete_mode():
    env = make_env(batch=16, action_mode="discrete", max_steps=8)
    trainer = PPOTrainer(
        env, PPOConfig(rollout_steps=4, num_epochs=1, num_minibatches=2,
                       hidden_sizes=(16, 16))
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, metrics = trainer.train_step(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_ppo_rejects_dict_obs():
    env = make_env(batch=4, observation_mode="dict")
    with pytest.raises(ValueError, match="vector"):
        PPOTrainer(env, PPOConfig())


def test_ppo_checkpoint_roundtrip(tmp_path):
    from spintorque_tpu.utils.checkpoint import load_pytree, save_pytree

    env = make_env(batch=8, max_steps=4)
    trainer = PPOTrainer(env, PPOConfig(rollout_steps=4, num_epochs=1,
                                        num_minibatches=1, hidden_sizes=(16, 16)))
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_step(ts)
    save_pytree(tmp_path / "params", ts.params)
    restored = load_pytree(tmp_path / "params")
    orig = jax.tree.leaves(ts.params)
    back = jax.tree.leaves(restored)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
