"""Unit tests for the vectorized skyrmion racetrack environment."""

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.envs import SkyrmionEnvConfig, SkyrmionRacetrackEnv


def make_env(batch=4, **kw):
    defaults = dict(
        dtype="float64", autoreset=False, include_thermal=False,
        include_pinning=False,
    )
    defaults.update(kw)
    return SkyrmionRacetrackEnv(batch_size=batch, config=SkyrmionEnvConfig(**defaults))


def test_reset_positions_in_track():
    env = make_env(batch=8)
    state, obs = env.reset(jax.random.PRNGKey(0))
    pos = np.asarray(state.positions)
    cfg = env.config
    assert pos.shape == (8, 1, 2)
    assert (pos[..., 0] >= cfg.skyrmion_radius).all()
    assert (pos[..., 0] <= cfg.track_length - cfg.skyrmion_radius).all()
    np.testing.assert_allclose(pos[..., 1], cfg.track_width / 2)
    assert obs.shape == (8, 1 * 4 + 1 * 2 + 4)


def test_current_moves_skyrmion_with_hall_deflection():
    env = make_env(batch=1)
    state, _ = env.reset(jax.random.PRNGKey(1))
    start = np.asarray(state.positions)[0, 0].copy()
    # +x current for 2 ns
    a = jnp.asarray([[5e11, 0.0, 0.0, 0.0, 2e-9]], jnp.float64)
    for _ in range(5):
        state, ts = env.step(state, a)
    end = np.asarray(state.positions)[0, 0]
    assert end[0] > start[0]  # driven along +x
    assert end[1] != start[1]  # Magnus deflection in y
    assert float(np.asarray(ts.info["step_energy"])[0]) > 0


def test_boundary_reflection_keeps_in_track():
    env = make_env(batch=2)
    state, _ = env.reset(jax.random.PRNGKey(2))
    cfg = env.config
    a = jnp.asarray([[cfg.max_current, 0.0, 0.0, 0.0, 2e-9]] * 2, jnp.float64)
    for _ in range(20):
        state, _ = env.step(state, a)
    pos = np.asarray(state.positions)
    assert (pos[..., 0] >= cfg.skyrmion_radius - 1e-15).all()
    assert (pos[..., 0] <= cfg.track_length - cfg.skyrmion_radius + 1e-15).all()
    assert (pos[..., 1] >= cfg.skyrmion_radius - 1e-15).all()
    assert (pos[..., 1] <= cfg.track_width - cfg.skyrmion_radius + 1e-15).all()


def test_success_when_at_targets():
    env = make_env(batch=2)
    state, _ = env.reset(jax.random.PRNGKey(3))
    cfg = env.config
    target = np.stack(
        [np.asarray(env.target_x), [cfg.track_width / 2]], axis=-1
    )
    state = state.replace(
        positions=jnp.broadcast_to(jnp.asarray(target, jnp.float64), (2, 1, 2))
    )
    # zero current -> no motion -> still at target -> success
    state, ts = env.step(state, jnp.zeros((2, 5), jnp.float64))
    assert np.all(np.asarray(ts.terminated))
    # positioning: 10*10 + stability 5*1 = 105 (all velocities zero).
    np.testing.assert_allclose(np.asarray(ts.reward), 105.0, atol=1e-9)


def test_discrete_action_decoding():
    env = make_env(batch=3, action_mode="discrete")
    state, _ = env.reset(jax.random.PRNGKey(4))
    assert env.num_actions == 45
    state, ts = env.step(state, jnp.asarray([0, 9, 44], jnp.int32))
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_multi_skyrmion_and_pinning_and_thermal(rng_key):
    env = SkyrmionRacetrackEnv(
        batch_size=4,
        config=SkyrmionEnvConfig(
            n_skyrmions=3, include_pinning=True, include_thermal=True,
            dtype="float32", autoreset=True,
        ),
        seed=7,
    )
    assert env.pin_x.shape[0] > 0
    state, obs = env.reset(rng_key)
    assert state.positions.shape == (4, 3, 2)
    a = jnp.tile(jnp.asarray([[1e11, 1e10, 0.0, 0.0, 1e-9]], jnp.float32), (4, 1))
    for _ in range(3):
        state, ts = env.step(state, a)
    assert np.isfinite(np.asarray(ts.obs)).all()
    assert ts.info["position_errors"].shape == (4, 3)


def test_determinism():
    env = make_env(batch=2)
    a = jnp.asarray([[1e11, 0.0, 1e17, 0.0, 1e-9]] * 2, jnp.float64)
    s1, o1 = env.reset(jax.random.PRNGKey(9))
    s2, o2 = env.reset(jax.random.PRNGKey(9))
    for _ in range(3):
        s1, t1 = env.step(s1, a)
        s2, t2 = env.step(s2, a)
    np.testing.assert_array_equal(np.asarray(t1.obs), np.asarray(t2.obs))
    np.testing.assert_array_equal(np.asarray(t1.reward), np.asarray(t2.reward))
