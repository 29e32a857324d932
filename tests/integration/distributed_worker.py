"""Worker process for the two-process jax.distributed integration test.

Launched (twice) by test_distributed.py with args: <process_id> <port>.
Each process owns 4 fake CPU devices; after rendezvous the global mesh has
8 devices spanning both processes. Exercises the REAL multi-host code
paths a pod-slice deployment uses (parallel/distributed.py,
parallel/mesh.py, the env step, pmean_metrics) — the counterpart of
launching the DeploymentSpec commands in deployment/manager.py.

Prints one "WORKER<i> OK ..." line on success; any assertion or hang makes
the parent test fail.
"""

import os
import sys


def main() -> None:
    process_id, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from spintorque_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    info = distributed.process_info()
    assert distributed.is_multihost(), info
    assert info["process_count"] == 2, info
    assert info["local_device_count"] == 4, info
    assert info["global_device_count"] == 8, info

    import jax.numpy as jnp
    import numpy as np

    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.parallel import (
        env_sharding,
        make_mesh,
        pmean_metrics,
        shard_batch,
        shard_env_state,
    )

    mesh = make_mesh()  # ('data', 'model') over all 8 global devices
    assert mesh.shape == {"data": 8, "model": 1}

    env = SpinTorqueEnv(
        batch_size=16,
        config=SpinTorqueEnvConfig(
            include_thermal=False, max_duration=1e-10, dtype="float32"
        ),
    )
    # Host-side reset is deterministic in the seed, so every process holds
    # the same global state; placing it on the mesh shards the batch axis
    # across BOTH processes' devices.
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_env_state(state, mesh)
    actions = shard_batch(
        jnp.tile(jnp.asarray([[5e5, 1e-10]], jnp.float32), (16, 1)), mesh
    )
    state, ts = env.step(state, actions)
    assert state.m.sharding.device_set == set(mesh.devices.flat)
    assert not ts.reward.is_fully_addressable  # really spans both processes

    # Cross-process metric reduction: the global mean must come out
    # replicated (readable on every process) and identical across hosts.
    reduced = pmean_metrics({"reward": ts.reward, "obs": ts.obs}, mesh)
    local_val = float(np.asarray(reduced["reward"].addressable_data(0)))
    assert np.isfinite(local_val)

    # Cross-check against an explicit jitted global sum on the same mesh.
    total = jax.jit(
        lambda r: jnp.sum(r),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
    )(ts.reward)
    expect = float(np.asarray(total.addressable_data(0))) / 16.0
    assert abs(local_val - expect) < 1e-5, (local_val, expect)

    print(f"WORKER{process_id} OK mean_reward={local_val:.6f}", flush=True)


if __name__ == "__main__":
    main()
