"""Validate the benchmark sync discipline against a host-read ground truth.

Round 5 discovered (scripts/bench_vpu_op_costs.py) that on the tunneled
axon runtime, INDEPENDENT tiny kernel calls overlap in the remote pool and
``jax.block_until_ready`` can return before remote completion for that
call pattern — which would invalidate every recorded throughput number if
it also held for the measurement programs. This script settles it for the
HEADLINE program shape: the scan-of-16-steps dispatch chain (state threads
call-to-call, so calls serialize), timed three ways —

  (a) bench.py's discipline: N dispatches + one block_until_ready(obs)
  (b) N dispatches + a host scalar read (forces full remote completion)
  (c) N dispatches + block + a host read of the final scalar

If (a) and (b) agree, the recorded numbers stand. Measured (v5e, B=4096
thermal): 26.40 vs 26.84 ms/dispatch — within 2%, the difference being one
extra in-region host fetch. Writes docs/SYNC_DISCIPLINE_TPU_v5e.json.

Run: timeout 590 python scripts/check_sync_discipline.py  (one TPU process)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.parallel import (
    make_mesh,
    random_policy,
    shard_batch,
    shard_env_state,
)

B = 4096
N_DISPATCH = 8


def main():
    env = SpinTorqueEnv(batch_size=B, config=SpinTorqueEnvConfig(dtype="float32"))
    policy = random_policy(env)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    mesh = make_mesh()
    state = shard_env_state(state, mesh)
    obs = jax.tree.map(lambda x: shard_batch(x, mesh), obs)

    @jax.jit
    def step_n(state, obs, key):
        def body(carry, k):
            state, obs = carry
            state, ts = env._step_impl(state, policy(None, obs, k), mesh=mesh)
            return (state, ts.obs), ts.reward.mean()

        keys = jax.random.split(key, 16)
        (state, obs), r = jax.lax.scan(body, (state, obs), keys, unroll=2)
        return state, obs, r.mean()

    subs = np.asarray(jax.random.split(key, 12 + 3 * N_DISPATCH))
    ki = 0
    for _ in range(12):
        state, obs, r = step_n(state, obs, subs[ki]); ki += 1
    jax.block_until_ready(obs)

    def run(sync):
        nonlocal state, obs, ki
        t0 = time.perf_counter()
        r = None
        for _ in range(N_DISPATCH):
            state, obs, r = step_n(state, obs, subs[ki]); ki += 1
        if sync in ("block", "both"):
            jax.block_until_ready(obs)
        if sync in ("host_read", "both"):
            float(r)
        return (time.perf_counter() - t0) / N_DISPATCH * 1e3

    t_block = run("block")
    t_read = run("host_read")
    t_both = run("both")
    ratio = t_read / t_block
    verdict = "PASS" if 0.9 < ratio < 1.1 else "FAIL"
    out = {
        "bench": "sync_discipline",
        "backend": jax.default_backend(),
        "batch": B,
        "program": "scan-of-16 env steps (the headline program shape)",
        "block_until_ready_ms_per_dispatch": round(t_block, 3),
        "host_read_ms_per_dispatch": round(t_read, 3),
        "block_plus_read_ms_per_dispatch": round(t_both, 3),
        "host_read_over_block_ratio": round(ratio, 4),
        "verdict": verdict,
        "note": (
            "Chained stateful dispatches serialize, so block_until_ready is "
            "a sound sync for the measurement programs; the independent-"
            "tiny-call pathology (bench_vpu_op_costs.py docstring) does not "
            "apply to them."
        ),
        "recorded": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SYNC_DISCIPLINE_TPU_v5e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
