"""Unit tests for the vectorized SpinTorqueEnv functional core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig


def make_env(batch=8, **kw):
    defaults = dict(
        include_thermal=False, dtype="float64", max_duration=2e-9, autoreset=False
    )
    defaults.update(kw)
    cfg = SpinTorqueEnvConfig(**defaults)
    return SpinTorqueEnv(batch_size=batch, config=cfg)


def test_reset_shapes_and_normalization():
    env = make_env(batch=16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert state.m.shape == (16, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.m), axis=-1), 1.0, rtol=1e-12
    )
    assert obs.shape == (16, 12)
    # Targets are +-z.
    tz = np.asarray(state.target)[:, 2]
    assert set(np.round(tz).tolist()) <= {1.0, -1.0}


def test_step_shapes_and_bookkeeping():
    env = make_env(batch=8)
    state, obs = env.reset(jax.random.PRNGKey(1))
    actions = jnp.tile(jnp.asarray([[1e6, 1e-10]], jnp.float64), (8, 1))
    state, ts = env.step(state, actions)
    assert ts.obs.shape == (8, 12)
    assert ts.reward.shape == (8,)
    assert np.all(np.asarray(state.step) == 1)
    # Energy accounted: J^2 A^2 R dt > 0 for nonzero J.
    assert np.all(np.asarray(state.total_energy) > 0)
    # steps_remaining in obs reflects post-increment count.
    np.testing.assert_allclose(np.asarray(ts.obs)[:, 8], (100 - 1) / 100)


def test_determinism_same_seed():
    env = make_env(batch=4)
    a = jnp.tile(jnp.asarray([[1.5e6, 5e-10]], jnp.float64), (4, 1))
    s1, o1 = env.reset(jax.random.PRNGKey(7))
    s2, o2 = env.reset(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    for _ in range(3):
        s1, t1 = env.step(s1, a)
        s2, t2 = env.step(s2, a)
        np.testing.assert_array_equal(np.asarray(t1.obs), np.asarray(t2.obs))
        np.testing.assert_array_equal(np.asarray(t1.reward), np.asarray(t2.reward))


def test_truncation_and_autoreset():
    env = make_env(batch=4, max_steps=3, autoreset=True)
    state, _ = env.reset(jax.random.PRNGKey(2))
    # Zero-current actions: no switching, so truncation at step 3.
    a = jnp.zeros((4, 2), jnp.float64)
    for i in range(2):
        state, ts = env.step(state, a)
        assert not np.any(np.asarray(ts.truncated))
    state, ts = env.step(state, a)
    assert np.all(np.asarray(ts.truncated))
    # Auto-reset: state counters cleared.
    assert np.all(np.asarray(state.step) == 0)
    assert np.all(np.asarray(state.total_energy) == 0)


def test_success_termination():
    env = make_env(batch=4)
    state, _ = env.reset(jax.random.PRNGKey(3))
    # Force m = target -> immediate success on any step.
    state = state.replace(m=state.target)
    a = jnp.zeros((4, 2), jnp.float64)
    state, ts = env.step(state, a)
    assert np.all(np.asarray(ts.terminated))
    # Success reward: 10 (weight) * 10 (component) = 100; energy/progress 0.
    np.testing.assert_allclose(np.asarray(ts.reward), 100.0, atol=1e-9)


def test_discrete_action_mode():
    env = make_env(batch=6, action_mode="discrete")
    state, _ = env.reset(jax.random.PRNGKey(4))
    actions = jnp.arange(6, dtype=jnp.int32)
    state, ts = env.step(state, actions)
    # Action 0 -> current level 0 = -max_current, duration 0.1 ns.
    np.testing.assert_allclose(float(np.asarray(state.last_current)[0]), -2e6)
    np.testing.assert_allclose(float(np.asarray(state.last_duration)[0]), 0.1e-9)
    # Action 5 -> current idx 1 (-1e6), duration idx 1 (0.5 ns).
    np.testing.assert_allclose(float(np.asarray(state.last_current)[5]), -1e6)
    np.testing.assert_allclose(float(np.asarray(state.last_duration)[5]), 0.5e-9)


def test_nan_action_scrubbed():
    env = make_env(batch=2)
    state, _ = env.reset(jax.random.PRNGKey(5))
    a = jnp.asarray([[jnp.nan, 1e-9], [1e6, 1e-10]], jnp.float64)
    state, ts = env.step(state, a)
    assert np.isfinite(np.asarray(ts.obs)).all()
    assert float(np.asarray(state.last_current)[0]) == 0.0
    assert float(np.asarray(state.last_duration)[0]) == 1e-12


def test_dict_observation_mode():
    env = make_env(batch=4, observation_mode="dict")
    state, obs = env.reset(jax.random.PRNGKey(6))
    assert set(obs.keys()) == {
        "magnetization", "target", "resistance", "temperature",
        "steps_remaining", "energy_consumed", "last_action",
    }
    assert obs["magnetization"].shape == (4, 3)
    state, ts = env.step(state, jnp.zeros((4, 2), jnp.float64))
    assert ts.obs["steps_remaining"].shape == (4, 1)


def test_thermal_env_runs(rng_key):
    env = SpinTorqueEnv(
        batch_size=8,
        config=SpinTorqueEnvConfig(include_thermal=True, max_duration=1e-9,
                                   dtype="float32"),
    )
    state, _ = env.reset(rng_key)
    a = jnp.tile(jnp.asarray([[1e6, 1e-10]], jnp.float32), (8, 1))
    state, ts = env.step(state, a)
    assert np.isfinite(np.asarray(ts.obs)).all()


def test_per_env_heterogeneous_device_params():
    """(B,)-shaped device parameters give per-env physics."""
    B = 4
    damping = jnp.asarray([0.005, 0.01, 0.02, 0.04], jnp.float64)
    env = make_env(batch=B)
    env.device_params = env.device_params.replace(damping=damping)
    state, _ = env.reset(jax.random.PRNGKey(8))
    m0 = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]], jnp.float64), (B, 1))
    m0 = m0 / jnp.linalg.norm(m0, axis=-1, keepdims=True)
    state = state.replace(m=m0)
    state, ts = env.step(state, jnp.tile(jnp.asarray([[0.0, 1e-9]], jnp.float64), (B, 1)))
    mz = np.asarray(state.m)[:, 2]
    # Higher damping -> relaxes to +z faster -> strictly increasing mz.
    assert np.all(np.diff(mz) > 0), mz
