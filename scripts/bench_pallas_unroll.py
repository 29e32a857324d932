"""Microbench: in-kernel substep-loop unroll factor on real TPU.

The deterministic pulse loop is latency-bound on the scf.for carried
dependency chain (~1.2 us per substep-batch); unrolling the masked body
trades loop-control overhead for ILP. Masked substeps are exact no-ops, so
any unroll factor is numerically identical (tests/unit/test_pallas_unroll.py).

Writes docs/BENCH_UNROLL_TPU_v5e.json (the recorded sweep the round-2
verdict asked for) and prints the table.

Run: timeout 590 python scripts/bench_pallas_unroll.py
"""

import json
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
    m0, spans, cur = setup_pulse_inputs(B)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    artifact = {
        "backend": jax.default_backend(),
        "batch": B,
        "workload": "rk4 pulses, uniform random spans 1e-12..5e-9 s",
        "results": [],
    }
    # Three bodies: deterministic, thermal per_substep (the ENV default:
    # 2 Box-Muller transforms/substep), thermal per_stage (the library
    # IntegratorConfig default: 6 transforms) - the unroll winner can
    # differ per body length, so each is swept separately and the kernel
    # defaults must cite the matching row.
    cases = [
        ("determ      ", False, "per_substep"),
        ("th/substep  ", True, "per_substep"),
        ("th/stage    ", True, "per_stage"),
    ]
    # try/finally: a mid-sweep exception or timeout must not leave the
    # module-global override set, silently perturbing any later measurement
    # in the same process.
    try:
        for label, thermal, rk4_noise in cases:
            cfg = IntegratorConfig(
                method="rk4", max_substeps=5101, thermal=thermal,
                noise_mode="reference", rk4_noise=rk4_noise,
            )
            key = jax.random.PRNGKey(7) if thermal else None
            for unroll in (1, 2, 4, 8):
                pi._SUBSTEP_UNROLL_OVERRIDE = unroll
                jax.clear_caches()  # override is read at trace time
                dt = timed(
                    lambda: pi.integrate_pulse_pallas(
                        m0, spans, cur, PARAMS, cfg, key=key
                    )
                )
                print(
                    f"{label} unroll={unroll}  {dt * 1e3:8.3f} ms/pulse-batch"
                    f"  {B / dt:12.0f} env-pulses/s",
                    flush=True,
                )
                artifact["results"].append(
                    {
                        "thermal": thermal,
                        "rk4_noise": rk4_noise,
                        "unroll": unroll,
                        "ms_per_pulse_batch": round(dt * 1e3, 4),
                        "env_pulses_per_s": round(B / dt, 1),
                    }
                )
    finally:
        pi._SUBSTEP_UNROLL_OVERRIDE = None
        jax.clear_caches()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "BENCH_UNROLL_TPU_v5e.json",
    )
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
