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

from spintorque_tpu.physics import IntegratorConfig  # noqa: F401
from _bench_util import BENCH_PARAMS as PARAMS, setup_pulse_inputs, timed
from spintorque_tpu.ops import pallas_integrator as pi


B = 4096






def main():
    import json

    m0, spans, cur = setup_pulse_inputs(B)
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
