"""Measure the bf16-RHS kernel variant (IntegratorConfig.bf16_rhs) on TPU:
speed vs the f32 kernel and deterministic accuracy (angular deviation after
a 1000-substep pulse). ROADMAP item "bf16 kernel variant"; parity and env
default paths stay f32 - this is a sweep-workload knob.

Writes docs/BENCH_BF16_TPU_v5e.json.
Run: timeout 590 python scripts/bench_bf16.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.ops import pallas_integrator as pi
from spintorque_tpu.physics import IntegratorConfig  # noqa: F401
from _bench_util import BENCH_PARAMS as PARAMS, setup_pulse_inputs, timed

B = 4096




def main():
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.full((B,), 1e-9, jnp.float32)  # 1000 substeps, uniform
    # Speed workload keeps a driving current; the ACCURACY comparison below
    # uses J=0 (precession+damping): strong-torque dynamics snap both
    # variants onto the exact pole fixed point and would hide the rounding.
    cur = jnp.full((B,), -1e6, jnp.float32)
    cur0 = jnp.zeros((B,), jnp.float32)
    print(f"backend={jax.default_backend()}", flush=True)

    results = {}
    finals = {}
    for thermal in (False, True):
        k = jax.random.PRNGKey(7) if thermal else None
        for bf16 in (False, True):
            cfg = IntegratorConfig(
                method="rk4", max_substeps=1024, thermal=thermal,
                noise_mode="reference", rk4_noise="per_substep",
                bf16_rhs=bf16,
            )
            trials = []
            for _ in range(3):
                jax.clear_caches()
                trials.append(timed(
                    lambda: pi.integrate_pulse_pallas(
                        m0, spans, cur, PARAMS, cfg, key=k)
                ))
            label = f"{'thermal' if thermal else 'det'}_{'bf16' if bf16 else 'f32'}"
            if not thermal:
                out = pi.integrate_pulse_pallas(m0, spans, cur0, PARAMS, cfg)
                finals[label] = np.stack(
                    [np.asarray(c) for c in out[0]], axis=-1)
            results[label] = {
                "ms_per_pulse_batch_trials": [round(t * 1e3, 4) for t in trials],
            }
            print(label, [round(t * 1e3, 3) for t in trials], flush=True)

    cosang = np.clip(
        np.sum(finals["det_f32"] * finals["det_bf16"], axis=-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosang))
    accuracy = {
        "workload": "deterministic J=0 precession, 1000-substep 1 ns pulse, B=4096",
        "mean_angular_error_deg": round(float(ang.mean()), 5),
        "p99_angular_error_deg": round(float(np.percentile(ang, 99)), 5),
        "max_angular_error_deg": round(float(ang.max()), 5),
    }
    print("accuracy:", accuracy, flush=True)

    speed32 = min(results["thermal_f32"]["ms_per_pulse_batch_trials"])
    speed16 = min(results["thermal_bf16"]["ms_per_pulse_batch_trials"])
    art = {
        "backend": jax.default_backend(),
        "batch": B,
        "recorded": time.strftime("%Y-%m-%d"),
        "results": results,
        "accuracy_det_bf16_vs_f32": accuracy,
        "thermal_speedup_bf16_over_f32": round(speed32 / speed16, 4),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "BENCH_BF16_TPU_v5e.json")
    with open(out, "w") as fh:
        json.dump(art, fh, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
