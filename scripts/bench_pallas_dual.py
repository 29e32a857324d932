"""Microbench: dual-chain software pipelining x tile height x unroll.

The RK4 substep body is latency-bound on its serial dependency chain
(docs/ROOFLINE_TPU_v5e.json: ~43-47% of the VPU ops ceiling single-chain).
``dual`` splits each grid tile into two independent half-tile chains
advanced in the same loop iteration, giving the scheduler explicit ILP to
fill the stalls. The three knobs interact (chain width changes register
pressure, unroll changes scheduling windows), so they are swept TOGETHER;
every cell is measured over ``--trials`` fresh compiles because Mosaic's
compiled schedule varies run to run (the rolled det loop is bimodal
2.8/4.7 ms).

Writes docs/BENCH_DUAL_TPU_v5e.json and prints the table.
Run: timeout 590 python scripts/bench_pallas_dual.py --trials 1
(then re-run the leaders with --trials 3)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spintorque_tpu.ops import pallas_integrator as pi
from spintorque_tpu.physics import IntegratorConfig  # noqa: F401
from _bench_util import BENCH_PARAMS as PARAMS, setup_pulse_inputs, timed


B = 4096






def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=1,
                    help="fresh-compile trials per cell")
    ap.add_argument("--modes", default="det,thermal")
    ap.add_argument("--cells", default=None,
                    help="comma list of dual:tile:unroll cells, e.g. "
                         "'1:16:4,1:32:8'; default = baseline + dual grid")
    ap.add_argument("--out", default="BENCH_DUAL_TPU_v5e.json")
    args = ap.parse_args()

    m0, spans, cur = setup_pulse_inputs(B)
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    artifact = {
        "backend": jax.default_backend(),
        "batch": B,
        "workload": "rk4 pulses, uniform random spans 1e-12..5e-9 s",
        "recorded": time.strftime("%Y-%m-%d"),
        "results": [],
    }
    if args.cells:
        cells = []
        for c in args.cells.split(","):
            d, t, u = c.split(":")
            cells.append((int(d), int(t), None if u == "def" else int(u)))
    else:
        cells = [(1, 16, None)]  # current default knobs as baseline
        cells += [(k, t, u) for k in (2, 4) for t in (16, 32) for u in (2, 8)]

    modes = args.modes.split(",")
    try:
        for mode in modes:
            thermal = mode == "thermal"
            cfg = IntegratorConfig(
                method="rk4", max_substeps=5101, thermal=thermal,
                noise_mode="reference", rk4_noise="per_substep",
            )
            key = jax.random.PRNGKey(7) if thermal else None
            for chains_n, tile, unroll in cells:
                pi._CHAINS_OVERRIDE = chains_n
                pi._TILE_ROWS_OVERRIDE = tile
                pi._SUBSTEP_UNROLL_OVERRIDE = unroll
                trials = []
                for _ in range(args.trials):
                    jax.clear_caches()
                    trials.append(timed(
                        lambda: pi.integrate_pulse_pallas(
                            m0, spans, cur, PARAMS, cfg, key=key
                        )
                    ))
                u_lbl = unroll if unroll is not None else "def"
                print(
                    f"{mode:7s} chains={chains_n} tile={tile:2d} "
                    f"unroll={u_lbl}: "
                    + " ".join(f"{t * 1e3:7.3f}" for t in trials)
                    + " ms/pulse-batch",
                    flush=True,
                )
                artifact["results"].append(
                    {
                        "thermal": thermal,
                        "chains": chains_n,
                        "tile_rows": tile,
                        "unroll": unroll,
                        "ms_per_pulse_batch_trials": [
                            round(t * 1e3, 4) for t in trials
                        ],
                    }
                )
    finally:
        pi._CHAINS_OVERRIDE = None
        pi._TILE_ROWS_OVERRIDE = None
        pi._SUBSTEP_UNROLL_OVERRIDE = None
        jax.clear_caches()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", args.out,
    )
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
