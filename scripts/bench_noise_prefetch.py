"""Round-5 sweep: trip-level noise prefetch in the thermal Pallas kernel.

Round-4 verdict #1: the thermal kernel (north-star config) ran at 35.8% of
the VPU ops ceiling vs 55.5% deterministic, with noise generated inline in
the serial RK4 chain's loop body. The kernel now fronts the WHOLE unrolled
trip's PRNG draws before the first chain op (ops/pallas_integrator.py
run()/draw_noise), so the sampler's transcendentals are free to fill the
chain's dependency stalls. This sweep measures the result across unroll
factors with the repo's fresh-compile-median discipline (Mosaic schedules
vary 0.1-0.5 ms across compiles) and writes
docs/BENCH_NOISE_PREFETCH_TPU_v5e.json.

Run: timeout 590 python scripts/bench_noise_prefetch.py  (one TPU process)
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from _bench_util import BENCH_PARAMS as PARAMS, setup_pulse_inputs, timed
from spintorque_tpu.physics import IntegratorConfig
from spintorque_tpu.ops import pallas_integrator as pi

B = 4096
N_COMPILES = 3


def main():
    m0, spans, cur = setup_pulse_inputs(B)
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    artifact = {
        "bench": "noise_prefetch_sweep",
        "backend": jax.default_backend(),
        "batch": B,
        "workload": "rk4 pulses, uniform random spans 1e-12..5e-9 s",
        "n_fresh_compiles": N_COMPILES,
        "baseline_round4": {
            "thermal_per_substep_unroll8_ms": [3.16, 3.31],
            "det_unroll16_ms": [2.51, 2.75],
            "source": "docs/BENCH_DUAL4/5/6_TPU_v5e.json (inline noise)",
        },
        "results": [],
    }
    cases = [
        ("thermal/substep", True, u) for u in (4, 8, 16)
    ] + [("determ", False, u) for u in (8, 16)]
    try:
        for label, thermal, unroll in cases:
            cfg = IntegratorConfig(
                method="rk4", max_substeps=5101, thermal=thermal,
                noise_mode="reference", rk4_noise="per_substep",
            )
            key = jax.random.PRNGKey(7) if thermal else None
            pi._SUBSTEP_UNROLL_OVERRIDE = unroll
            per_compile = []
            for c in range(N_COMPILES):
                jax.clear_caches()
                dt = timed(
                    lambda: pi.integrate_pulse_pallas(
                        m0, spans, cur, PARAMS, cfg, key=key
                    )
                )
                per_compile.append(dt * 1e3)
                print(f"{label:16s} unroll={unroll:2d} compile {c}: "
                      f"{dt * 1e3:7.3f} ms", flush=True)
            artifact["results"].append({
                "case": label, "thermal": thermal, "unroll": unroll,
                "per_compile_ms": [round(x, 3) for x in per_compile],
                "median_ms": round(statistics.median(per_compile), 3),
            })
    finally:
        pi._SUBSTEP_UNROLL_OVERRIDE = None
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs",
        "BENCH_NOISE_PREFETCH_TPU_v5e.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
