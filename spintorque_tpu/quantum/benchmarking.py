"""Quantum-module benchmark suite.

Counterpart of the reference's quantum/benchmarking.py (848 LoC:
``QuantumBenchmarkSuite``, ``BenchmarkResult``,
``create_standard_benchmark_suite``). Scenarios time the REAL jitted
programs (state-vector batches, QAOA grid sweeps, surface-code Monte Carlo)
with warm-up compile excluded, and every number ships with bootstrap CIs via
the shared research.benchmarking statistics - no self-reported marketing
multipliers (the reference's claims are catalogued as untrusted in
SURVEY.md section 6).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..research.benchmarking import BenchmarkResult, BenchmarkSuite, bootstrap_ci
from . import statevector as sv
from .circuits import QuantumCircuit
from .error_correction import SurfaceCodeErrorCorrection
from .optimization import IterationFreeQAOA

__all__ = [
    "BenchmarkResult",
    "QuantumBenchmarkSuite",
    "create_standard_benchmark_suite",
]


def _time_repeats(fn: Callable[[], Any], repeats: int = 5) -> np.ndarray:
    fn()  # warm-up / compile
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        out.append(time.perf_counter() - t0)
    return np.asarray(out)


def _statevector_scenario(n_qubits: int = 12, depth: int = 20, batch: int = 64):
    def run() -> BenchmarkResult:
        circ = QuantumCircuit(n_qubits)
        rng = np.random.default_rng(0)
        for d in range(depth):
            for w in range(n_qubits):
                circ.add("RY", w, float(rng.uniform(0, np.pi)))
            for w in range(d % 2, n_qubits - 1, 2):
                circ.cz(w, w + 1)

        base = sv.zero_state(n_qubits)
        states = jnp.broadcast_to(base, (batch,) + base.shape)
        run_batch = jax.jit(jax.vmap(lambda s: circ.run(state=s)))
        times = _time_repeats(lambda: run_batch(states))
        rates = batch * len(circ.gates) / times
        return BenchmarkResult(
            name=f"statevector_{n_qubits}q_d{depth}_b{batch}",
            value=float(rates.mean()),
            unit="gate_applications/s",
            std=float(rates.std()),
            ci95=bootstrap_ci(rates),
            extra={
                "n_qubits": n_qubits,
                "depth": depth,
                "batch": batch,
                "n_gates": len(circ.gates),
            },
        )

    return run


def _qaoa_scenario(n_vars: int = 10, grid_points: int = 24):
    def run() -> BenchmarkResult:
        rng = np.random.default_rng(1)
        Q = rng.normal(size=(n_vars, n_vars))
        Q = np.triu(Q)
        qaoa = IterationFreeQAOA(grid_points=grid_points)
        t0 = time.perf_counter()
        result = qaoa.optimize(Q)
        elapsed = time.perf_counter() - t0
        evals_per_s = result.n_evaluations / elapsed
        return BenchmarkResult(
            name=f"qaoa_{n_vars}vars_{grid_points}grid",
            value=float(evals_per_s),
            unit="angle_evaluations/s",
            extra={
                "n_evaluations": result.n_evaluations,
                "best_value": result.best_value,
                "elapsed_s": elapsed,
            },
        )

    return run


def _surface_code_scenario(n_trials: int = 500_000, p: float = 0.01):
    def run() -> BenchmarkResult:
        code = SurfaceCodeErrorCorrection()
        times = _time_repeats(
            lambda: code.logical_error_rate(p, n_trials=n_trials)["logical_x_rate"],
            repeats=3,
        )
        rate = 2 * n_trials / times  # X and Z decodes per call
        return BenchmarkResult(
            name=f"surface_code_decode_{n_trials}",
            value=float(rate.mean()),
            unit="decodes/s",
            std=float(rate.std()),
            ci95=bootstrap_ci(rate),
            extra={"physical_rate": p, "n_trials": n_trials},
        )

    return run


class QuantumBenchmarkSuite(BenchmarkSuite):
    """BenchmarkSuite pre-registered with the quantum scenarios."""

    def __init__(self, name: str = "spintorque_tpu_quantum"):
        super().__init__(name)
        self.register("statevector", _statevector_scenario())
        self.register("qaoa", _qaoa_scenario())
        self.register("surface_code", _surface_code_scenario())


def create_standard_benchmark_suite() -> QuantumBenchmarkSuite:
    """Mirror of the reference's create_standard_benchmark_suite
    (quantum/benchmarking.py)."""
    return QuantumBenchmarkSuite()
