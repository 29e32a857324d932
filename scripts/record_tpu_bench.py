"""Regenerate docs/BENCH_TPU_v5e.json on the real TPU backend.

Mirrors the artifact's round-1 structure (solver pulses/s, env thermal,
env deterministic) with bootstrap-free mean/std/ci95 over repeat blocks.
Run: python scripts/record_tpu_bench.py  (one process only — TPU tunnel)
"""

import json
import os
import platform
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _stats(rates, name, unit, wall_s):
    mean = statistics.fmean(rates)
    std = statistics.stdev(rates) if len(rates) > 1 else 0.0
    lo, hi = np.percentile(rates, [2.5, 97.5])
    return {
        "name": name,
        "value": mean,
        "unit": unit,
        "std": std,
        "ci95": [float(lo), float(hi)],
        "extra": {"wall_s": round(wall_s, 3)},
    }


def main():
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.ops.pallas_integrator import tpu_kernel_available
    from spintorque_tpu.parallel import random_policy
    from spintorque_tpu.physics import IntegratorConfig, integrate_pulse
    from spintorque_tpu.physics.solver import params_from_dict

    B = 4096
    use_pallas = tpu_kernel_available()
    results = {}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "BENCH_TPU_v5e.json")

    def flush_json():
        out = {
            "suite": "spintorque_tpu",
            "backend": jax.default_backend(),
            "devices": jax.local_device_count(),
            "platform": platform.platform(),
            "use_pallas": bool(use_pallas),
            "results": results,
        }
        with open(path, "w") as fh:
            json.dump(out, fh, indent=2)

    # Env benches first (the headline programs); incremental JSON writes so a
    # timeout on the slow remote-compile tunnel still refreshes the artifact.
    for label, thermal in (("env_4096_thermal", True), ("env_4096_det", False)):
        ecfg = SpinTorqueEnvConfig(dtype="float32", include_thermal=thermal,
                                   use_pallas=use_pallas or None)
        env = SpinTorqueEnv(batch_size=B, config=ecfg)
        policy = random_policy(env)
        state, obs = env.reset(jax.random.PRNGKey(1))

        @jax.jit
        def step8(state, obs, key, env=env, policy=policy):
            def body(carry, k):
                state, obs = carry
                state, ts = env._step_impl(state, policy(None, obs, k))
                return (state, ts.obs), ts.reward.mean()
            (state, obs), rw = jax.lax.scan(
                body, (state, obs), jax.random.split(key, 8), unroll=2)
            return state, obs, rw.mean()

        t_wall = time.time()
        k = jax.random.PRNGKey(2)
        for _ in range(12):
            k, sub = jax.random.split(k)
            state, obs, _ = step8(state, obs, sub)
        jax.block_until_ready(obs)
        # Time blocks of 4 async dispatches with ONE sync at the end: on the
        # tunneled runtime a per-dispatch block_until_ready pays the tunnel
        # round-trip every iteration and understates throughput ~1.6x.
        rates = []
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                k, sub = jax.random.split(k)
                state, obs, r = step8(state, obs, sub)
            jax.block_until_ready(r)
            rates.append(4 * 8 * B / (time.perf_counter() - t0))
        results[label] = _stats(
            rates, f"env_steps_per_s_B4096_thermal={thermal}", "env-steps/s",
            time.time() - t_wall)
        print(label + ":", round(results[label]["value"]), flush=True)
        flush_json()

    # Solver micro-bench: 1000-substep 1 ns pulses, thermal on.
    p = params_from_dict(
        dict(volume=1e-23, saturation_magnetization=800e3, damping=0.01,
             uniaxial_anisotropy=1.2e6, polarization=0.7,
             easy_axis=np.array([0.0, 0.0, 1.0]))
    )
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.full((B,), 1e-9, jnp.float32)
    cur = jnp.full((B,), 1e2, jnp.float32)
    cfg = IntegratorConfig(method="rk4", max_substeps=1024, thermal=True,
                           use_pallas=use_pallas or None)
    f = jax.jit(lambda m0, k: integrate_pulse(m0, spans, cur, p, cfg, key=k))
    t_wall = time.time()
    jax.block_until_ready(f(m0, key))
    for _ in range(10):  # steady-state warmup
        jax.block_until_ready(f(m0, key))
    rates = []
    for i in range(8):
        t0 = time.perf_counter()
        for _ in range(4):
            r = f(m0, jax.random.fold_in(key, i))
        jax.block_until_ready(r)
        rates.append(4 * B / (time.perf_counter() - t0))
    results["solver_4096x1000"] = _stats(
        rates, "solver_pulses_per_s_B4096_1000substeps_thermal",
        "pulses/s", time.time() - t_wall)
    print("solver:", round(results["solver_4096x1000"]["value"]), flush=True)
    flush_json()
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
