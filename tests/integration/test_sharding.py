"""Multi-device sharding tests on the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.parallel import (
    make_mesh,
    local_batch_size,
    random_policy,
    rollout_jit,
    shard_batch,
    shard_env_state,
    summarize,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (fake) devices"
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=2)
    assert local_batch_size(64, mesh) == 8
    with pytest.raises(ValueError):
        local_batch_size(63, mesh)


def test_sharded_env_step_zero_collectives():
    """Env batch sharded over 8 devices: step must run and keep the batch
    axis sharded (no implicit gather)."""
    mesh = make_mesh()
    env = SpinTorqueEnv(
        batch_size=64,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32"),
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_env_state(state, mesh)
    actions = shard_batch(
        jnp.tile(jnp.asarray([[1e5, 1e-10]], jnp.float32), (64, 1)), mesh
    )
    state, ts = env.step(state, actions)
    # The magnetization output keeps the data sharding.
    shard_info = state.m.sharding
    assert len(shard_info.device_set) == 8
    assert np.isfinite(np.asarray(ts.obs)).all()

    # HLO of the step program contains no DATA collectives. The only
    # permitted collective is the scalar all-reduce computing max(n) for
    # the shared while-loop bound (8 bytes per step).
    lowered = jax.jit(env._step_impl).lower(state, actions)
    hlo = lowered.compile().as_text()
    for coll in ("all-gather", "collective-permute", "reduce-scatter",
                 "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll} in env step"
    for line in hlo.splitlines():
        if "all-reduce(" in line:
            # result shape appears as e.g. "s32[] all-reduce(...)"
            shape = line.split("all-reduce(")[0].strip().split()[-1]
            assert shape.endswith("[]"), (
                f"non-scalar all-reduce in env step: {line.strip()[:120]}"
            )


def test_sharded_step_pallas_zero_collectives():
    """Round-3 verdict #1: the zero-collectives claim must hold with the
    PALLAS fast path engaged, not just the XLA fallback. use_pallas is
    forced on (interpret mode executes the kernel on CPU) and the mesh is
    passed to the env, so the duration sort runs per shard under shard_map.
    The compiled HLO must contain NO collectives at all - unlike the XLA
    path, the per-shard kernel does not even need the scalar max(n)
    all-reduce (each tile's trip bound is shard-local scalar prefetch)."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = make_mesh()
    env = SpinTorqueEnv(
        batch_size=64,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32", use_pallas=True),
        mesh=mesh,
    )
    assert env.config.use_pallas, "fast path did not engage"
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_env_state(state, mesh)
    actions = shard_batch(
        jnp.tile(jnp.asarray([[1e5, 1e-10]], jnp.float32), (64, 1)), mesh
    )
    with pltpu.force_tpu_interpret_mode():
        # Execute a real step through the public API (kernel runs, output
        # stays batch-sharded)...
        state2, ts = env.step(state, actions)
        assert len(state2.m.sharding.device_set) == 8
        assert np.isfinite(np.asarray(ts.obs)).all()
        # ...and inspect the compiled HLO of the same program.
        lowered = jax.jit(
            env._step_impl, static_argnames=("mesh",)
        ).lower(state, actions, mesh=mesh)
        hlo = lowered.compile().as_text()
    for coll in ("all-gather", "collective-permute", "reduce-scatter",
                 "all-to-all", "all-reduce("):
        assert coll not in hlo, f"unexpected collective {coll} in Pallas step"


def test_sharded_rollout_metrics():
    mesh = make_mesh()
    env = SpinTorqueEnv(
        batch_size=32,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32"),
    )
    run = rollout_jit(env, random_policy(env), num_steps=6)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_env_state(state, mesh)
    obs = shard_batch(obs, mesh)
    state, obs, traj = run(None, state, obs, jax.random.PRNGKey(1))
    stats = summarize(traj)
    assert int(stats["steps"]) == 6 * 32
    assert np.isfinite(float(stats["mean_reward"]))


def test_sharded_vs_single_device_identical():
    """Sharding must not change numerics: same seed, same results."""
    cfg = SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                              dtype="float32")
    env = SpinTorqueEnv(batch_size=16, config=cfg)
    actions = jnp.tile(jnp.asarray([[5e5, 1e-10]], jnp.float32), (16, 1))

    s1, o1 = env.reset(jax.random.PRNGKey(3))
    s1, t1 = env.step(s1, actions)

    mesh = make_mesh()
    s2, o2 = env.reset(jax.random.PRNGKey(3))
    s2 = shard_env_state(s2, mesh)
    s2, t2 = env.step(s2, shard_batch(actions, mesh))

    np.testing.assert_array_equal(np.asarray(t1.obs), np.asarray(t2.obs))
    np.testing.assert_array_equal(np.asarray(t1.reward), np.asarray(t2.reward))


def test_per_device_work_and_memory_balance():
    """Each mesh device must hold exactly B/n_data rows of every batch-major
    state array - before AND after a step. Guards against a regression that
    silently replicates the batch (each chip would then do ALL the work and
    'env-steps/s/chip' claims would be inflated by n_data)."""
    mesh = make_mesh()
    n_data = mesh.shape["data"]
    B = 64
    env = SpinTorqueEnv(
        batch_size=B,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32"),
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_env_state(state, mesh)

    def assert_balanced(arr, name):
        shards = arr.addressable_shards
        assert len(shards) == n_data, f"{name}: {len(shards)} shards"
        seen_rows = 0
        for s in shards:
            expect = (B // n_data,) + arr.shape[1:]
            assert s.data.shape == expect, (
                f"{name}: device {s.device} holds shard {s.data.shape}, "
                f"expected {expect} (replicated batch?)"
            )
            seen_rows += s.data.shape[0]
        assert seen_rows == B

    assert_balanced(state.m, "state.m (pre-step)")
    assert not state.m.sharding.is_fully_replicated

    actions = shard_batch(
        jnp.tile(jnp.asarray([[1e5, 1e-10]], jnp.float32), (B, 1)), mesh
    )
    state, ts = env.step(state, actions)
    assert_balanced(state.m, "state.m (post-step)")
    assert_balanced(ts.obs, "obs (post-step)")
    assert_balanced(ts.reward, "reward (post-step)")


def test_pmean_metrics_reduces_across_mesh():
    """pmean_metrics: batch-sharded leaves reduce to the GLOBAL mean and the
    result is replicated on every mesh device."""
    from spintorque_tpu.parallel import pmean_metrics

    mesh = make_mesh()
    x = jnp.arange(64, dtype=jnp.float32)        # mean = 31.5
    y = jnp.ones((32, 3), jnp.float32) * 2.0     # mean = 2.0
    tree = {"reward": shard_batch(x, mesh), "m": shard_batch(y, mesh)}
    out = pmean_metrics(tree, mesh)
    assert float(out["reward"]) == pytest.approx(31.5)
    assert float(out["m"]) == pytest.approx(2.0)
    # replicated output: every device holds the scalar
    assert len(out["reward"].sharding.device_set) == 8
    assert out["reward"].sharding.is_fully_replicated


def test_tp_sharded_ppo_gradients_flow():
    from spintorque_tpu.rl import PPOConfig, PPOTrainer

    mesh = make_mesh(n_data=4, n_model=2)
    env = SpinTorqueEnv(
        batch_size=16,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32"),
    )
    trainer = PPOTrainer(
        env, PPOConfig(rollout_steps=4, num_epochs=1, num_minibatches=2,
                       hidden_sizes=(64, 64)), mesh=mesh,
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    # First hidden kernel must actually live sharded over 'model'.
    k0 = ts.params["actor_dense_0"]["kernel"]
    assert len(k0.sharding.device_set) >= 2
    before = np.asarray(jax.device_get(k0)).copy()
    ts, metrics = trainer.train_step(ts)
    after = np.asarray(jax.device_get(ts.params["actor_dense_0"]["kernel"]))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(before, after)  # gradients actually applied
