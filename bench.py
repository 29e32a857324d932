"""Headline benchmark: env-steps/s/chip on vectorized SpinTorque-v0.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Configuration follows BASELINE.json's north-star metric: 4096 vectorized
SpinTorque-v0 envs (default physics: STT-MRAM, thermal fluctuations on,
RK4, max_duration 5 ns), random continuous actions spanning the full action
space, measured in steady state on the local accelerator. The env batch is
sharded over all local chips (no-op on one chip) so the per-chip number
stays honest on multi-chip hosts.

measure_env_throughput() is the ONE measurement program: the artifact
recorder (scripts/record_tpu_bench.py) imports it so docs/BENCH_TPU_v5e.json
and the headline are the same program, not lookalikes.

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

REFERENCE_STEPS_PER_S = 1.0 / 1.802  # reference quality-gate measurement


def measure_env_throughput(
    env,
    *,
    n_inner: int = 8,
    warmup: int = 12,
    blocks: int = 1,
    iters_per_block: int = 8,
    seed: int = 0,
    make_action=None,
    return_final=False,
):
    """Steady-state throughput of the public vectorized env step program.

    Builds the jitted scan-of-steps program (the headline program), shards
    the env batch over a ('data','model') mesh covering all local devices,
    warms to steady state (the first ~10 executions of a fresh executable
    run ~3.5x slower on tunneled TPU runtimes), then times ``blocks``
    independent blocks of ``iters_per_block`` dispatches with ONE device
    sync per block (a per-dispatch sync pays the tunnel round-trip each
    iteration and understates throughput ~1.6x).

    ``make_action(key, batch_size)`` overrides the action source for envs
    whose action space differs from SpinTorqueEnv's (array/skyrmion) - the
    SAME measurement program serves every env, so the recorded artifact
    can never drift from the headline (scripts/record_tpu_bench.py).

    Returns (rates, total_env_steps_per_block) - rates is a list of
    ``blocks`` env-steps/s numbers (total across all mesh devices) - plus
    the final sharded obs when ``return_final`` (so callers/tests can
    assert the measured program kept the batch sharded).
    """
    from spintorque_tpu.parallel import (
        make_mesh,
        random_policy,
        shard_batch,
        shard_env_state,
    )

    if make_action is None:
        policy = random_policy(env)

        def make_action(key, batch_size, _obs=None):
            return policy(None, _obs, key)

        obs_driven = True
    else:
        obs_driven = False

    key = jax.random.PRNGKey(seed)
    state, obs = env.reset(key)
    mesh = make_mesh()
    state = shard_env_state(state, mesh)
    obs = jax.tree.map(lambda x: shard_batch(x, mesh), obs)

    @jax.jit
    def step_n(state, obs, key):
        def body(carry, k):
            state, obs = carry
            if obs_driven:
                action = make_action(k, env.batch_size, _obs=obs)
            else:
                action = make_action(k, env.batch_size)
            state, ts = env._step_impl(state, action)
            return (state, ts.obs), ts.reward.mean()

        keys = jax.random.split(key, n_inner)
        # unroll=2: a rolled XLA While around the Pallas pulse kernel with a
        # data-dependent scalar-prefetch trip bound runs ~4x slower on this
        # TPU generation (22 ms vs 6 ms per 4096-env step); any unrolling
        # restores full speed.
        (state, obs), rewards = jax.lax.scan(body, (state, obs), keys, unroll=2)
        return state, obs, rewards.mean()

    # Pre-split all per-dispatch keys OUTSIDE the timed region and fetch
    # them to host: an eager jax.random.split per iteration is its own
    # dispatch through the (tunneled) runtime and contaminates the timing -
    # it made the small-program benches (array env, solver micro-bench)
    # report 2-10x low with 4x-wide CIs.
    import numpy as _np

    n_keys = warmup + blocks * iters_per_block
    subs = _np.asarray(jax.random.split(key, n_keys))
    ki = 0
    for _ in range(warmup):
        state, obs, _ = step_n(state, obs, subs[ki]); ki += 1
    jax.block_until_ready(obs)

    steps_per_block = iters_per_block * n_inner * env.batch_size
    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters_per_block):
            state, obs, r = step_n(state, obs, subs[ki]); ki += 1
        jax.block_until_ready(obs)
        rates.append(steps_per_block / (time.perf_counter() - t0))
    if return_final:
        return rates, steps_per_block, obs
    return rates, steps_per_block


def main():
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.ops.pallas_integrator import tpu_kernel_available

    B = 4096
    # Pin the fast path explicitly (instead of trusting auto-detection) so
    # the headline number provably includes the Pallas kernel whenever the
    # hardware can run it; record the resolved flag in the JSON line.
    use_pallas = tpu_kernel_available()
    cfg = SpinTorqueEnvConfig(dtype="float32", use_pallas=use_pallas or None)
    env = SpinTorqueEnv(batch_size=B, config=cfg)  # defaults: thermal, rk4, 5 ns

    rates, _ = measure_env_throughput(env, blocks=1, iters_per_block=8)
    # Denominator matches the mesh measure_env_throughput builds (ALL
    # devices, jax.devices()) - local_device_count() would overstate
    # per-chip throughput by the process count under a multi-process
    # runtime where the two differ.
    n_chips = jax.device_count()
    steps_per_s_per_chip = rates[0] / n_chips

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
