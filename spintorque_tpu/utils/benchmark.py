"""Steady-state throughput measurement for the vectorized envs.

THE one measurement program: bench.py (the driver headline), the artifact
recorder (scripts/record_tpu_bench.py), and the CLI `benchmark` subcommand
all call measure_env_throughput, so no recorded number can come from a
lookalike of the measured program.
"""

import time

import jax


def measure_env_throughput(
    env,
    *,
    # n_inner: env steps per dispatched scan program. 16 matches the
    # production PPO trainer's rollout length (PPOConfig.rollout_steps) -
    # the headline measures the program shape production actually runs.
    # Rounds 2-3 used 8; the difference is pure host-dispatch amortization
    # (the tunneled runtime costs ~0.4 ms per dispatch, quantified with a
    # device trace in docs/DISPATCH_OVERHEAD_TPU_v5e.json - device-only
    # step time is scan-length independent).
    n_inner: int = 16,
    warmup: int = 12,
    blocks: int = 1,
    iters_per_block: int = 8,
    seed: int = 0,
    make_action=None,
    return_final=False,
    mesh=None,
    # 'block' (production) or 'host_read': how each timed block is ended.
    # scripts/check_sync_discipline.py runs THIS program both ways to
    # certify that block_until_ready is a sound sync for it (the remote
    # pool overlaps independent tiny calls, but these dispatches chain
    # through state) - keeping the validation tied to the real program,
    # not a lookalike.
    final_sync: str = "block",
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

    ``mesh`` overrides the default all-devices mesh (scripts/
    pod_validation.py measures per-chip scaling by comparing a full mesh
    against a single-device mesh through this same program).

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
    if mesh is None:
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
            # mesh: the Pallas fast path's duration sort must run per shard
            # on multi-chip meshes (global argsort => cross-chip gathers).
            state, ts = env._step_impl(state, action, mesh=mesh)
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

    if final_sync not in ("block", "host_read"):
        raise ValueError(f"final_sync must be 'block' or 'host_read', got {final_sync!r}")

    def sync(obs, r):
        if final_sync == "host_read":
            float(r)  # host scalar fetch: forces full remote completion
        else:
            jax.block_until_ready(obs)

    n_keys = warmup + blocks * iters_per_block
    subs = _np.asarray(jax.random.split(key, n_keys))
    ki = 0
    r = None
    for _ in range(warmup):
        state, obs, r = step_n(state, obs, subs[ki]); ki += 1
    sync(obs, r)

    steps_per_block = iters_per_block * n_inner * env.batch_size
    rates = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters_per_block):
            state, obs, r = step_n(state, obs, subs[ki]); ki += 1
        sync(obs, r)
        rates.append(steps_per_block / (time.perf_counter() - t0))
    if return_final:
        return rates, steps_per_block, obs
    return rates, steps_per_block
