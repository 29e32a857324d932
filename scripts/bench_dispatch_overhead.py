"""Quantify host-dispatch overhead in the headline measurement and record
the DEVICE-ONLY step time of the headline program.

Round-4 finding: with the pulse ablated to identity, the remaining
~0.4 ms/step was NOT env compute (reward/obs/reset ablations move it <5%),
NOT threefry, NOT fusion-launch count (11 fusions) - a device trace showed
the no-pulse step program executes in 33 us on device; the rest is the
tunneled runtime's PER-DISPATCH latency between executions. The same gap
taxes the real headline: wall 2.32 ms/step at scan length 8 vs 1.91 ms
device-only.

This script records:
  * wall ms/step for scan lengths (n_inner) 8 / 16 / 32
  * device-only ms/step of the scan-8 program, from a jax.profiler trace
    parsed with jax.profiler.ProfileData

Writes docs/DISPATCH_OVERHEAD_TPU_v5e.json.
Run: timeout 590 python scripts/bench_dispatch_overhead.py
"""

import glob
import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.utils.benchmark import measure_env_throughput

B = 4096
TRACE_DIR = "/tmp/spintorque_dispatch_trace"


def main():
    env = SpinTorqueEnv(batch_size=B, config=SpinTorqueEnvConfig(dtype="float32"))
    art = {
        "backend": jax.default_backend(),
        "batch": B,
        "recorded": time.strftime("%Y-%m-%d"),
        "wall_ms_per_step": {},
    }
    for n_inner in (8, 16, 32):
        rates, _ = measure_env_throughput(
            env, blocks=2, iters_per_block=8, n_inner=n_inner
        )
        art["wall_ms_per_step"][str(n_inner)] = round(B / max(rates) * 1e3, 4)
        print(f"n_inner={n_inner}: {B / max(rates) * 1e3:.3f} ms/step", flush=True)

    # Device-only time of the scan-8 program from a trace.
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    measure_env_throughput(env, blocks=1, iters_per_block=4, warmup=2, n_inner=8)
    jax.profiler.stop_trace()
    traces = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    if not traces:
        raise SystemExit("no xplane trace produced - is this a TPU backend?")
    f = traces[0]
    pd = jax.profiler.ProfileData.from_serialized_xspace(open(f, "rb").read())
    per_exec = None
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            total = defaultdict(float)
            count = defaultdict(int)
            for ev in line.events:
                total[ev.name] += ev.duration_ns
                count[ev.name] += 1
            name, ns = max(total.items(), key=lambda kv: kv[1])
            per_exec = ns / 1e6 / count[name]
            print(f"device: {name[:40]} -> {per_exec:.3f} ms per scan-8 exec")
    if per_exec is None:
        raise SystemExit(
            "trace has no '/device:TPU:0' plane with an 'XLA Modules' line - "
            "device naming differs on this runtime; inspect the trace planes")
    art["device_ms_per_step_scan8"] = round(per_exec / 8, 4)
    art["device_env_steps_per_s_per_chip"] = round(B / (per_exec / 8) * 1e3, 1)
    art["dispatch_gap_ms_per_step_scan8"] = round(
        art["wall_ms_per_step"]["8"] - art["device_ms_per_step_scan8"], 4
    )
    print(
        f"device-only: {art['device_ms_per_step_scan8']} ms/step = "
        f"{art['device_env_steps_per_s_per_chip']:,.0f} env-steps/s/chip; "
        f"dispatch gap {art['dispatch_gap_ms_per_step_scan8']} ms/step",
        flush=True,
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "DISPATCH_OVERHEAD_TPU_v5e.json",
    )
    with open(out, "w") as fh:
        json.dump(art, fh, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
