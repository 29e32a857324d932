"""Turnkey pod-slice validation: one command, one artifact.

When a real multi-chip TPU slice becomes available, the whole validation
opportunity should cost one command (docs/ROADMAP.md "Real pod-slice
validation"), not an improvisation:

    python scripts/pod_validation.py                  # on the slice
    python scripts/pod_validation.py --rehearsal      # 8 fake CPU devices

It runs, in order, and writes ONE artifact (default docs/POD_VALIDATION.json;
--rehearsal writes docs/POD_VALIDATION_REHEARSAL.json):

  1. device inventory + ('data','model') mesh construction over all chips;
  2. the sharding test suites (tests/unit/test_pallas_sharding.py +
     tests/integration/test_sharding.py) as a subprocess, pass counts
     recorded;
  3. the headline bench program SHARDED over the full mesh — the same
     measure_env_throughput program as bench.py, B = per-chip-envs x chips;
  4. per-chip scaling: the same program on a single-device mesh at
     per-chip B; efficiency = (full_rate / n_chips) / single_rate.

On a multi-host slice, run under the process launcher with
jax.distributed.initialize (parallel/distributed.py); each host runs the
same command and process 0 writes the artifact.

The --rehearsal mode (8 virtual CPU devices, tiny shapes, interpret-mode
Pallas disabled in favor of the XLA path) exists so the script and its
artifact schema stay exercised end-to-end in CI without hardware; the
schema is asserted before writing either way.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA_KEYS = {
    "artifact": str, "rehearsal": bool, "backend": str, "device_kind": str,
    "n_devices": int, "mesh_shape": dict, "suites": list,
    "throughput": dict, "scaling": dict,
}
THROUGHPUT_KEYS = {"batch_total", "env_steps_per_s_total",
                   "env_steps_per_s_per_chip", "use_pallas"}
SCALING_KEYS = {"single_chip_batch", "single_chip_env_steps_per_s",
                "per_chip_efficiency"}


def validate_schema(artifact: dict) -> None:
    for k, t in SCHEMA_KEYS.items():
        assert k in artifact, f"artifact missing key {k!r}"
        assert isinstance(artifact[k], t), (k, type(artifact[k]))
    assert THROUGHPUT_KEYS <= set(artifact["throughput"]), artifact["throughput"]
    assert SCALING_KEYS <= set(artifact["scaling"]), artifact["scaling"]
    for suite in artifact["suites"]:
        assert {"suite", "passed", "failed", "ok"} <= set(suite), suite
    assert artifact["scaling"]["per_chip_efficiency"] > 0


def run_suites():
    """The sharding suites, exactly as CI runs them (fake 8-device CPU
    backend via tests/conftest.py regardless of the hardware — they pin
    LOGIC; the throughput phases below exercise the real chips)."""
    results = []
    for suite in ("tests/unit/test_pallas_sharding.py",
                  "tests/integration/test_sharding.py"):
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", suite, "-q", "--no-header"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
        )
        tail = (proc.stdout.strip().splitlines() or ["<no output>"])[-1]
        passed = failed = 0
        for tok in tail.replace(",", " ").split():
            if tok.isdigit():
                last_num = int(tok)
            elif tok.startswith("passed"):
                passed = last_num
            elif tok.startswith("failed"):
                failed = last_num
        results.append({
            "suite": suite, "passed": passed, "failed": failed,
            "ok": proc.returncode == 0, "summary": tail,
        })
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--rehearsal", action="store_true",
                    help="8 fake CPU devices, tiny shapes (schema/CI mode)")
    ap.add_argument("--out", default=None, help="artifact path")
    ap.add_argument("--per-chip-envs", type=int, default=None,
                    help="env batch per chip (default 4096 real / 64 rehearsal)")
    args = ap.parse_args()

    if args.rehearsal:
        # Must precede the jax import (and out-prioritize any TPU plugin).
        # The pool-IPs override must be UNCONDITIONAL: setdefault would be
        # a no-op exactly when the axon tunnel is configured, and a
        # rehearsal must never dial the (single-process) TPU.
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.rehearsal:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.parallel import make_mesh
    from spintorque_tpu.utils.benchmark import measure_env_throughput

    devices = jax.devices()
    n = len(devices)
    per_chip = args.per_chip_envs or (64 if args.rehearsal else 4096)
    mesh = make_mesh(devices=devices)
    print(f"[pod_validation] {n} x {devices[0].device_kind} "
          f"mesh={dict(zip(mesh.axis_names, mesh.devices.shape))}")

    print("[pod_validation] running sharding suites ...")
    suites = run_suites()
    for s in suites:
        print(f"  {s['suite']}: {s['summary']}")

    if args.rehearsal:
        cfg = SpinTorqueEnvConfig(dtype="float32", use_pallas=False,
                                  max_duration=1e-10, max_substeps=128)
        bench_kw = dict(warmup=2, blocks=1, iters_per_block=2, n_inner=4)
    else:
        from spintorque_tpu.ops.pallas_integrator import tpu_kernel_available
        cfg = SpinTorqueEnvConfig(
            dtype="float32", use_pallas=tpu_kernel_available() or None)
        bench_kw = dict(blocks=3, iters_per_block=8)

    print(f"[pod_validation] sharded throughput: B={per_chip * n} over {n} chips ...")
    env = SpinTorqueEnv(batch_size=per_chip * n, config=cfg, mesh=mesh)
    rates, _ = measure_env_throughput(env, mesh=mesh, **bench_kw)
    rate_full = sorted(rates)[len(rates) // 2]  # median over blocks
    print(f"  {rate_full:,.0f} env-steps/s total, "
          f"{rate_full / n:,.0f} /chip")

    print(f"[pod_validation] single-chip baseline: B={per_chip} ...")
    mesh1 = make_mesh(n_data=1, n_model=1, devices=[devices[0]])
    env1 = SpinTorqueEnv(batch_size=per_chip, config=cfg, mesh=mesh1)
    rates1, _ = measure_env_throughput(env1, mesh=mesh1, **bench_kw)
    rate_single = sorted(rates1)[len(rates1) // 2]
    efficiency = (rate_full / n) / rate_single
    print(f"  {rate_single:,.0f} env-steps/s; per-chip efficiency "
          f"{efficiency:.3f}")

    artifact = {
        "artifact": "pod_validation",
        "rehearsal": bool(args.rehearsal),
        "backend": jax.default_backend(),
        "device_kind": str(getattr(devices[0], "device_kind",
                                   devices[0].platform)),
        "n_devices": n,
        "mesh_shape": {str(k): int(v) for k, v in
                       zip(mesh.axis_names, mesh.devices.shape)},
        "suites": suites,
        "throughput": {
            "batch_total": per_chip * n,
            "env_steps_per_s_total": round(rate_full, 1),
            "env_steps_per_s_per_chip": round(rate_full / n, 1),
            "use_pallas": bool(env.config.use_pallas),
            "blocks": rates,
        },
        "scaling": {
            "single_chip_batch": per_chip,
            "single_chip_env_steps_per_s": round(rate_single, 1),
            "per_chip_efficiency": round(efficiency, 4),
        },
    }
    validate_schema(artifact)
    out = args.out or os.path.join(
        REPO, "docs",
        "POD_VALIDATION_REHEARSAL.json" if args.rehearsal
        else "POD_VALIDATION.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"[pod_validation] wrote {out}")
    ok = all(s["ok"] for s in suites)
    if not ok:
        print("[pod_validation] SUITE FAILURES — see artifact")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
