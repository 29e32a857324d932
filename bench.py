"""Headline benchmark: env-steps/s/chip on vectorized SpinTorque-v0.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Configuration follows BASELINE.json's north-star metric: 4096 vectorized
SpinTorque-v0 envs (default physics: STT-MRAM, thermal fluctuations on,
RK4, max_duration 5 ns), random continuous actions spanning the full action
space, measured in steady state on the local accelerator.

Baseline: the reference's measured 1.802 s/step single env on CPU
(quality_gates_report.json "Performance") = 0.555 env-steps/s.
"""

import json
import time

import jax

# NOTE: deliberately NO jax_compilation_cache_dir here. Enabling the
# persistent compilation cache makes the compiled step program ~3.4x slower
# on this TPU generation (21.7 ms vs 6.3 ms per 4096-env step, measured with
# a fresh empty cache dir - it is the config, not stale artifacts; the
# serializable-executable path pessimizes the Pallas kernel). Compile time
# (~30 s once) is an acceptable price for a 3.4x faster measured program.

import jax.numpy as jnp

REFERENCE_STEPS_PER_S = 1.0 / 1.802  # reference quality-gate measurement


def main():
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.ops.pallas_integrator import tpu_kernel_available
    from spintorque_tpu.parallel import (
        make_mesh,
        random_policy,
        shard_batch,
        shard_env_state,
    )

    B = 4096
    # Pin the fast path explicitly (instead of trusting auto-detection) so
    # the headline number provably includes the Pallas kernel whenever the
    # hardware can run it; record the resolved flag in the JSON line.
    use_pallas = tpu_kernel_available()
    cfg = SpinTorqueEnvConfig(dtype="float32", use_pallas=use_pallas or None)
    env = SpinTorqueEnv(batch_size=B, config=cfg)  # defaults: thermal, rk4, 5 ns
    policy = random_policy(env)

    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    # Shard the env batch over ALL local chips so "env-steps/s/chip" stays
    # honest on multi-chip hosts: each chip steps B/n_chips envs (the same
    # placement tests/integration/test_sharding.py verifies keeps the hot
    # loop collective-free). On one chip this is a no-op.
    mesh = make_mesh()
    state = shard_env_state(state, mesh)
    obs = shard_batch(obs, mesh)

    @jax.jit
    def step_n(state, obs, key, n=8):
        def body(carry, k):
            state, obs = carry
            action = policy(None, obs, k)
            state, ts = env._step_impl(state, action)
            return (state, ts.obs), ts.reward.mean()
        keys = jax.random.split(key, n)
        # unroll=2: a rolled XLA While around the Pallas pulse kernel with a
        # data-dependent scalar-prefetch trip bound runs ~4x slower on this
        # TPU generation (22 ms vs 6 ms per 4096-env step); any unrolling
        # restores full speed.
        (state, obs), rewards = jax.lax.scan(body, (state, obs), keys, unroll=2)
        return state, obs, rewards.mean()

    # Warmup: compile, then run until steady state. The first ~10 executions
    # of a fresh executable run ~3.5x slower on tunneled TPU runtimes (program
    # residency warmup); measuring them would understate throughput by 3x+.
    n_inner = 8
    for _ in range(12):
        key, sub = jax.random.split(key)
        state, obs, _ = step_n(state, obs, sub)
    jax.block_until_ready(obs)

    n_iters = 8
    t0 = time.perf_counter()
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        state, obs, r = step_n(state, obs, sub)
    jax.block_until_ready(obs)
    elapsed = time.perf_counter() - t0

    total_steps = n_iters * n_inner * B
    n_chips = jax.local_device_count()
    steps_per_s_per_chip = total_steps / elapsed / n_chips

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip_4096envs_SpinTorque-v0",
                "value": round(steps_per_s_per_chip, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(steps_per_s_per_chip / REFERENCE_STEPS_PER_S, 1),
                "use_pallas": bool(env.config.use_pallas),
                "backend": jax.default_backend(),
                "device_kind": getattr(dev, "device_kind", dev.platform),
            }
        )
    )


if __name__ == "__main__":
    main()
