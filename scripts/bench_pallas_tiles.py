"""Microbench: Pallas pulse-integrator wall time vs tile size and noise cost.

Measures the two round-2 perf levers on real TPU hardware:
  * duration bucketing — at B=4096 one 32-row tile degenerates the per-tile
    substep bound to the global max; smaller tiles recover sum-of-maxes work
  * thermal-noise sampler cost — deterministic vs thermal per substep

Run: timeout 550 python scripts/bench_pallas_tiles.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spintorque_tpu.physics import IntegratorConfig, LLGSParams
from spintorque_tpu.ops import pallas_integrator as pi

PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
).astype(jnp.float32)

B = 4096


def setup(seed=0):
    key = jax.random.PRNGKey(seed)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    # Uniform durations like the env's continuous action space: [1e-12, 5e-9]
    spans = jax.random.uniform(
        jax.random.fold_in(key, 1), (B,), jnp.float32, 1e-12, 5e-9
    )
    cur = jax.random.uniform(
        jax.random.fold_in(key, 2), (B,), jnp.float32, -2e6, 0.0
    )
    return (m[:, 0], m[:, 1], m[:, 2]), spans, cur


def timed(fn, iters=20):
    # Warm to steady state: the first ~10 executions of a fresh executable
    # run ~3.5x slower on tunneled TPU runtimes.
    for _ in range(12):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import json

    m0, spans, cur = setup()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    artifact = {"backend": jax.default_backend(), "batch": B, "results": []}
    # thermal runs rk4_noise='per_substep' - the ENV default body the tile
    # choice actually serves (the round-2 sweep ran per_stage).
    # try/finally: a mid-sweep exception or timeout must not leave the
    # module-global override set, silently perturbing any later measurement
    # in the same process.
    try:
        for thermal in (False, True):
            cfg = IntegratorConfig(
                method="rk4", max_substeps=5101, thermal=thermal,
                noise_mode="reference", rk4_noise="per_substep",
            )
            key = jax.random.PRNGKey(7) if thermal else None
            for tile_rows in (32, 16, 8):
                pi._TILE_ROWS_OVERRIDE = tile_rows
                jax.clear_caches()
                dt = timed(
                    lambda: pi.integrate_pulse_pallas(
                        m0, spans, cur, PARAMS, cfg, key=key
                    )
                )
                label = "thermal" if thermal else "determ "
                print(
                    f"{label} tile_rows={tile_rows:3d} tiles={-(-32 // tile_rows)}"
                    f"  {dt * 1e3:8.3f} ms/pulse-batch"
                    f"  {B / dt:12.0f} env-pulses/s",
                    flush=True,
                )
                artifact["results"].append(
                    {"thermal": thermal, "tile_rows": tile_rows,
                     "ms_per_pulse_batch": round(dt * 1e3, 4)}
                )
    finally:
        pi._TILE_ROWS_OVERRIDE = None
        jax.clear_caches()
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "BENCH_TILES_TPU_v5e.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
