"""Validate the benchmark sync discipline against a host-read ground truth.

Round 5 discovered (scripts/bench_vpu_op_costs.py) that on the tunneled
axon runtime, INDEPENDENT tiny kernel calls overlap in the remote pool and
``jax.block_until_ready`` can return before remote completion for that
call pattern — which would invalidate every recorded throughput number if
it also held for the measurement programs. This script settles it for THE
measurement program itself: it runs ``measure_env_throughput`` (the one
program behind bench.py, the recorder, and the CLI benchmark) twice,
differing only in its ``final_sync`` mode —

  (a) 'block'     — the production discipline (block_until_ready)
  (b) 'host_read' — a host scalar fetch, which provably waits

If the two rates agree, the recorded numbers stand: the program's
dispatches chain through env state, so they serialize and the block sync
is sound. The recorded artifact (docs/SYNC_DISCIPLINE_TPU_v5e.json)
carries the measured ratio; it is only written on a real TPU backend
(pass --out elsewhere).

Run: timeout 590 python scripts/check_sync_discipline.py  (one TPU process)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
from spintorque_tpu.utils.benchmark import measure_env_throughput

B = 4096


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="artifact path override")
    args = ap.parse_args()

    env = SpinTorqueEnv(batch_size=B, config=SpinTorqueEnvConfig(dtype="float32"))
    rates_block, _ = measure_env_throughput(
        env, blocks=3, iters_per_block=8, final_sync="block")
    rates_read, _ = measure_env_throughput(
        env, blocks=3, iters_per_block=8, final_sync="host_read")
    rb = sorted(rates_block)[1]
    rr = sorted(rates_read)[1]
    ratio = rb / rr  # >1 would mean block under-waits (reports too fast)
    verdict = "PASS" if 0.9 < ratio < 1.1 else "FAIL"
    out = {
        "bench": "sync_discipline",
        "backend": jax.default_backend(),
        "batch": B,
        "program": "measure_env_throughput (THE headline program, "
                   "final_sync parameterized)",
        "block_sync_env_steps_per_s": round(rb, 1),
        "host_read_sync_env_steps_per_s": round(rr, 1),
        "block_over_host_read_ratio": round(ratio, 4),
        "verdict": verdict,
        "note": (
            "Chained stateful dispatches serialize, so block_until_ready "
            "is a sound sync for the measurement programs; the "
            "independent-tiny-call pathology (bench_vpu_op_costs.py "
            "docstring) does not apply to them."
        ),
        "recorded": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out))
    path = args.out
    if path is None:
        if jax.default_backend() == "tpu":
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "docs", "SYNC_DISCIPLINE_TPU_v5e.json")
        else:
            print("# non-TPU backend: canonical artifact NOT written "
                  "(pass --out to save)")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path)
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
