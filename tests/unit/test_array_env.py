"""Unit tests for the vectorized crossbar array environment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.envs import (
    ArrayEnvConfig,
    SpinTorqueArrayEnv,
    checkerboard_pattern,
    coupling_matrix,
)


def make_env(batch=4, **kw):
    defaults = dict(dtype="float64", autoreset=False)
    defaults.update(kw)
    return SpinTorqueArrayEnv(batch_size=batch, config=ArrayEnvConfig(**defaults))


def test_coupling_matrix_types():
    cfg = ArrayEnvConfig(rows=3, cols=3, coupling_type="dipolar", coupling_strength=0.1)
    C = coupling_matrix(cfg)
    assert C.shape == (9, 9)
    assert C[0, 0] == 0.0
    np.testing.assert_allclose(C[0, 1], 0.1)  # distance 1
    np.testing.assert_allclose(C[0, 4], 0.1 / np.sqrt(2) ** 3)  # diagonal
    C_ex = coupling_matrix(ArrayEnvConfig(rows=3, cols=3, coupling_type="exchange"))
    assert C_ex[0, 1] > 0 and C_ex[0, 4] == 0.0  # NN only
    C_off = coupling_matrix(ArrayEnvConfig(include_coupling=False))
    assert not C_off.any()


def test_checkerboard_target():
    t = checkerboard_pattern(4, 4)
    assert t[0, 0, 2] == 1.0 and t[0, 1, 2] == -1.0 and t[1, 1, 2] == 1.0


def test_reset_and_shapes():
    env = make_env(batch=3)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert state.pattern.shape == (3, 16, 3)
    assert obs.shape == (3, 4, 4, 6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.pattern), axis=-1), 1.0, rtol=1e-12
    )


def test_individual_action_updates_one_device():
    env = make_env(batch=2, include_coupling=False)
    state, _ = env.reset(jax.random.PRNGKey(1))
    before = np.asarray(state.pattern).copy()
    # device 5, current 1e6, duration 1 ns
    action = jnp.asarray([[5.0, 1e6, 1e-9]] * 2, jnp.float64)
    state, ts = env.step(state, action)
    after = np.asarray(state.pattern)
    changed = np.any(np.abs(after - before) > 1e-12, axis=-1)  # (B, N)
    assert changed[:, 5].all()
    assert not changed[:, [i for i in range(16) if i != 5]].any()
    assert np.all(np.asarray(ts.info["step_energy"]) > 0)


def test_row_and_column_masks():
    env_r = make_env(batch=1, action_mode="row", include_coupling=False)
    state, _ = env_r.reset(jax.random.PRNGKey(2))
    before = np.asarray(state.pattern).copy()
    state, _ = env_r.step(state, jnp.asarray([[1.0, 1e6, 1e-9]], jnp.float64))
    changed = np.any(np.abs(np.asarray(state.pattern) - before) > 1e-12, axis=-1)[0]
    assert changed[4:8].all() and not changed[:4].any() and not changed[8:].any()

    env_c = make_env(batch=1, action_mode="column", include_coupling=False)
    state, _ = env_c.reset(jax.random.PRNGKey(3))
    before = np.asarray(state.pattern).copy()
    state, _ = env_c.step(state, jnp.asarray([[2.0, 1e6, 1e-9]], jnp.float64))
    changed = np.any(np.abs(np.asarray(state.pattern) - before) > 1e-12, axis=-1)[0]
    assert changed[[2, 6, 10, 14]].all() and changed.sum() == 4


def test_zero_current_is_noop():
    env = make_env(batch=2, action_mode="global")
    state, _ = env.reset(jax.random.PRNGKey(4))
    before = np.asarray(state.pattern).copy()
    # global mode reads current from action[1]; set it to 0.
    state, ts = env.step(state, jnp.asarray([[0.0, 0.0]] * 2, jnp.float64))
    np.testing.assert_array_equal(np.asarray(state.pattern), before)
    assert np.all(np.asarray(ts.info["step_energy"]) == 0)


def test_success_on_target_pattern():
    env = make_env(batch=2)
    state, _ = env.reset(jax.random.PRNGKey(5))
    state = state.replace(pattern=state.target)
    state, ts = env.step(state, jnp.asarray([[0.0, 0.0, 1e-9]] * 2, jnp.float64))
    assert np.all(np.asarray(ts.terminated))
    # pattern_match 10*10 + uniformity 2*1 = 102 (energy/progress zero).
    np.testing.assert_allclose(np.asarray(ts.reward), 102.0, atol=1e-9)


def test_sequential_coupling_order_matters():
    """With coupling on, device 1 must see device 0's update within the same
    step (the reference's sequential in-place semantics)."""
    env = make_env(batch=1, action_mode="global", coupling_strength=0.5)
    state, _ = env.reset(jax.random.PRNGKey(6))
    # Run one global step; then verify vs a manual replay of the same
    # sequential algorithm in numpy.
    action = jnp.asarray([[0.0, 1e5]], jnp.float64)  # current=1e5 (slot 1)
    state2, _ = env.step(state, action)

    from spintorque_tpu.constants import GAMMA, MU0

    p = env.device_params
    C = np.asarray(env.coupling)
    pattern = np.asarray(state.pattern)[0].copy()
    current, duration = 1e5, 1e-9
    for d in range(16):
        m = pattern[d]
        ku = float(np.asarray(p.uniaxial_anisotropy))
        ms = float(np.asarray(p.saturation_magnetization))
        h = (2 * ku / (MU0 * ms)) * m[2] * np.array([0.0, 0.0, 1.0])
        h = h + C[d] @ pattern
        tau = 0.1 * current * np.cross(m, np.cross(m, [0.0, 0.0, 1.0]))
        dmdt = -GAMMA * np.cross(m, h)
        dmdt = dmdt + 0.01 * np.cross(m, dmdt)
        dmdt = dmdt + tau
        dt = duration / 10
        out = m.copy()
        for _ in range(10):
            out = out + dmdt * dt
            out = out / np.linalg.norm(out)
        pattern[d] = out
    np.testing.assert_allclose(
        np.asarray(state2.pattern)[0], pattern, rtol=1e-9, atol=1e-12
    )


def test_vector_and_dict_observation_modes():
    env = make_env(batch=2, observation_mode="vector")
    state, obs = env.reset(jax.random.PRNGKey(7))
    assert obs.shape == (2, 16 * 6 + 4)
    env2 = make_env(batch=2, observation_mode="dict")
    state2, obs2 = env2.reset(jax.random.PRNGKey(7))
    assert set(obs2.keys()) == {
        "current_pattern", "target_pattern", "pattern_similarity",
        "steps_remaining", "total_energy",
    }


# --- coupling_update='simultaneous' (round-4 verdict #5) -------------------


def test_simultaneous_mode_selectable_and_validated():
    env = make_env(batch=2, coupling_update="simultaneous")
    state, obs = env.reset(jax.random.PRNGKey(0))
    action = jnp.asarray([[5.0, 1e6, 1e-9]] * 2, jnp.float64)
    state, ts = env.step(state, action)
    assert np.isfinite(np.asarray(ts.reward)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.pattern), axis=-1), 1.0, rtol=1e-12)
    with pytest.raises(ValueError, match="coupling_update"):
        make_env(coupling_update="bogus")


# The inline quirk dynamics use the HARDCODED gamma with the device's
# anisotropy field; at the stock K_u the 'global' 1 ns pulse has
# gamma*H*dt >> 1 and the renormalized Euler is effectively chaotic, which
# would swamp any mode comparison with discretization noise. A small K_u
# keeps gamma*H*dt << 1 so the two coupling semantics are actually
# comparable (both modes are exercised at stock K_u by the other tests).
_TAME = dict(uniaxial_anisotropy=1.0)


def _tame_env(mode, coupling_strength, batch=3):
    return SpinTorqueArrayEnv(
        batch_size=batch, device_params=dict(_TAME),
        config=ArrayEnvConfig(
            dtype="float64", autoreset=False, action_mode="global",
            coupling_update=mode, coupling_strength=coupling_strength),
    )


def test_simultaneous_matches_sequential_at_weak_coupling():
    """Energy sanity + dynamics agreement where the semantics should not
    matter: weak coupling, tame slopes. Pre-step resistances are identical
    by construction (each device's own m is untouched until its turn in the
    sequential scan), so step energies must agree exactly; patterns agree
    to the (second-order) constant-slope-vs-refreshed-slope difference."""
    env_seq = _tame_env("sequential", 1e-4)
    env_sim = _tame_env("simultaneous", 1e-4)
    state, _ = env_seq.reset(jax.random.PRNGKey(2))
    action = jnp.asarray([[0.0, 1e6]] * 3, jnp.float64)
    s_seq, ts_seq = env_seq.step(state, action)
    s_sim, ts_sim = env_sim.step(state, action)
    np.testing.assert_allclose(
        np.asarray(ts_sim.info["step_energy"]),
        np.asarray(ts_seq.info["step_energy"]), rtol=1e-12)
    moved = np.abs(np.asarray(s_seq.pattern) - np.asarray(state.pattern)).max()
    assert moved > 1e-5  # the comparison is not vacuous
    np.testing.assert_allclose(
        np.asarray(s_sim.pattern), np.asarray(s_seq.pattern), atol=1e-6)


def test_simultaneous_is_permutation_equivariant_sequential_is_not():
    """The physical-correctness property the sequential quirk lacks:
    relabeling devices (permuting the pattern and the coupling matrix
    consistently) must permute the outcome. Holds for 'simultaneous',
    demonstrably fails for 'sequential' at strong coupling."""
    rng = np.random.default_rng(7)
    perm = rng.permutation(16)
    action = jnp.asarray([[0.0, 1e6]] * 2, jnp.float64)

    def run(mode):
        env_a = _tame_env(mode, 2000.0, batch=2)
        env_b = _tame_env(mode, 2000.0, batch=2)
        # Consistently relabeled copy: permute the coupling before the
        # first step traces (self.coupling is captured at trace time).
        env_b.coupling = env_a.coupling[perm][:, perm]
        state, _ = env_a.reset(jax.random.PRNGKey(3))
        state_b = state.replace(pattern=state.pattern[:, perm, :],
                                target=state.target[:, perm, :])
        s_a, _ = env_a.step(state, action)
        s_b, _ = env_b.step(state_b, action)
        return (np.asarray(s_a.pattern)[:, perm, :], np.asarray(s_b.pattern))

    out_perm, out_b = run("simultaneous")
    np.testing.assert_allclose(out_b, out_perm, atol=1e-9)
    out_perm, out_b = run("sequential")
    assert np.abs(out_b - out_perm).max() > 1e-3  # order dependence is real


def test_simultaneous_scales_to_large_arrays():
    """No lax.scan over N: a 16x16 array (N=256, beyond the reference's
    O(N^2)-per-device Python loop regime) steps in one jitted program."""
    env = make_env(batch=2, rows=16, cols=16, coupling_update="simultaneous",
                   action_mode="global", dtype="float32")
    state, _ = env.reset(jax.random.PRNGKey(4))
    action = jnp.asarray([[0.0, 1e6]] * 2, jnp.float32)
    state, ts = env.step(state, action)
    assert state.pattern.shape == (2, 256, 3)
    assert np.isfinite(np.asarray(state.pattern)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.pattern), axis=-1), 1.0, rtol=1e-5)


def test_gym_adapter_exposes_coupling_update():
    """gym.make must ROUTE the knob, not swallow it in **extra (review
    follow-up: the kwarg was silently accepted but dropped)."""
    import gymnasium as gym

    from spintorque_tpu.registration import register_envs

    # force=True: the parity tests import the reference package, whose
    # import side effect re-registers these ids pointing at ITS envs;
    # reclaim them (module import alone is cached and would not).
    register_envs(force=True)

    e = gym.make("SpinTorqueArray-v0", coupling_update="simultaneous")
    try:
        assert e.unwrapped._env.config.coupling_update == "simultaneous"
        e.reset(seed=0)
        _, r, *_ = e.step(np.asarray([5.0, 1e6, 1e-9]))
        assert np.isfinite(float(r))
    finally:
        e.close()
