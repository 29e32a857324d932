"""Reproducibility and correctness validation harnesses.

Counterpart of the reference's research/validation_framework.py (1137 LoC:
``ResearchValidationFramework`` :43, ``QuantumValidationFramework`` :561).
Validations here are executable invariants of THIS framework's actual
components: physics conservation laws, PRNG determinism, integrator
convergence order, state-vector unitarity, decoder exactness, and autodiff
gradient checks - each check returns pass/fail with the measured quantity,
suitable for CI gating.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ValidationCheck", "ResearchValidationFramework", "QuantumValidationFramework"]


class ValidationCheck:
    def __init__(self, name: str, fn: Callable[[], Dict[str, Any]]):
        self.name = name
        self.fn = fn

    def run(self) -> Dict[str, Any]:
        try:
            out = self.fn()
            out.setdefault("passed", False)
            return {"name": self.name, **out}
        except Exception as exc:  # validation harness must not crash CI
            return {"name": self.name, "passed": False, "error": repr(exc)}


class ResearchValidationFramework:
    """Physics/reproducibility validation of the simulation core."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.checks: List[ValidationCheck] = []
        self._register_defaults()

    def register(self, name: str, fn: Callable[[], Dict[str, Any]]) -> None:
        self.checks.append(ValidationCheck(name, fn))

    # -- default physics checks --------------------------------------------
    def _params(self):
        from ..physics.solver import params_from_dict

        return params_from_dict(
            dict(
                volume=1e-24,
                saturation_magnetization=800e3,
                damping=0.01,
                uniaxial_anisotropy=8e5,
                polarization=0.7,
                easy_axis=np.array([0.0, 0.0, 1.0]),
            )
        )

    def _register_defaults(self) -> None:
        self.register("norm_preservation", self._check_norm_preservation)
        self.register("seed_determinism", self._check_seed_determinism)
        self.register("zero_damping_energy", self._check_energy_conservation)
        self.register("convergence_order", self._check_convergence_order)
        self.register("equilibrium_stability", self._check_equilibrium)

    def _check_norm_preservation(self) -> Dict[str, Any]:
        from ..physics.integrator import IntegratorConfig, integrate_pulse

        params = self._params()
        cfg = IntegratorConfig(method="rk4", max_substeps=2048)
        key = jax.random.PRNGKey(0)
        m0 = jax.random.normal(key, (64, 3))
        m0 = m0 / jnp.linalg.norm(m0, axis=-1, keepdims=True)
        res = integrate_pulse(
            (m0[:, 0], m0[:, 1], m0[:, 2]),
            jnp.full((64,), 1e-9), jnp.full((64,), 1e6), params, cfg,
        )
        norms = np.sqrt(sum(np.asarray(c) ** 2 for c in res.m))
        err = float(np.abs(norms - 1.0).max())
        return {"passed": err < 1e-5, "max_norm_error": err}

    def _check_seed_determinism(self) -> Dict[str, Any]:
        from ..envs import SpinTorqueEnv, SpinTorqueEnvConfig

        env = SpinTorqueEnv(
            batch_size=8,
            config=SpinTorqueEnvConfig(max_duration=1e-10, max_substeps=128),
        )
        outs = []
        for _ in range(2):
            state, obs = env.reset(jax.random.PRNGKey(7))
            action = jnp.tile(jnp.asarray([1e6, 5e-11]), (8, 1))
            state, ts = env.step(state, action)
            outs.append(np.asarray(ts.obs))
        identical = bool(np.array_equal(outs[0], outs[1]))
        return {"passed": identical, "identical": identical}

    def _check_energy_conservation(self) -> Dict[str, Any]:
        """alpha=0, J=0: precession conserves single-domain energy."""
        from ..physics.integrator import IntegratorConfig, integrate_pulse
        from ..physics.llgs import energy_density
        from ..physics.solver import params_from_dict

        params = params_from_dict(
            dict(
                volume=1e-24, saturation_magnetization=800e3, damping=0.0,
                uniaxial_anisotropy=8e5, easy_axis=np.array([0.0, 0.0, 1.0]),
            )
        )
        m0 = jnp.asarray([[0.5, 0.0, np.sqrt(1 - 0.25)]], jnp.float32)
        cfg = IntegratorConfig(method="rk4", max_substeps=2048)
        res = integrate_pulse(
            (m0[:, 0], m0[:, 1], m0[:, 2]),
            jnp.asarray([1e-9]), jnp.asarray([0.0]), params, cfg,
        )
        e0 = float(energy_density(m0[0, 0], m0[0, 1], m0[0, 2], params))
        e1 = float(energy_density(res.m[0][0], res.m[1][0], res.m[2][0], params))
        rel = abs(e1 - e0) / (abs(e0) + 1e-30)
        return {"passed": rel < 5e-3, "relative_energy_drift": rel}

    def _check_convergence_order(self) -> Dict[str, Any]:
        """RK4 error should shrink ~16x when dt halves (order 4)."""
        from ..physics.integrator import IntegratorConfig, integrate_pulse

        params = self._params()
        span = jnp.asarray([1e-10])
        # Smooth-dynamics current scale: the simplified STT coefficient
        # P*J/(Ms*V) is stiff at env-scale currents; order measurement needs
        # resolvable dynamics, not pole-snapping.
        cur = jnp.asarray([2e-7])
        m0 = (jnp.asarray([0.3]), jnp.asarray([0.0]), jnp.asarray([0.954]))

        def final(max_step):
            cfg = IntegratorConfig(
                method="rk4", max_step=max_step, max_substeps=1 << 14
            )
            res = integrate_pulse(m0, span, cur, params, cfg)
            return np.asarray(jnp.stack(res.m)).ravel()

        ref = final(1e-14)
        e1 = np.abs(final(4e-13) - ref).max()
        e2 = np.abs(final(2e-13) - ref).max()
        order = float(np.log2((e1 + 1e-16) / (e2 + 1e-16)))
        # float32 floors the achievable error; accept >= 2.0 measured order
        return {"passed": order > 2.0, "measured_order": order,
                "coarse_error": float(e1), "fine_error": float(e2)}

    def _check_equilibrium(self) -> Dict[str, Any]:
        """m aligned with easy axis, no drive: must stay put."""
        from ..physics.integrator import IntegratorConfig, integrate_pulse

        params = self._params()
        cfg = IntegratorConfig(method="rk4", max_substeps=2048)
        res = integrate_pulse(
            (jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.0])),
            jnp.asarray([1e-9]), jnp.asarray([0.0]), params, cfg,
        )
        drift = float(
            np.abs(np.asarray(jnp.stack(res.m)).ravel() - np.array([0, 0, 1.0])).max()
        )
        return {"passed": drift < 1e-6, "drift": drift}

    def run_all(self) -> Dict[str, Any]:
        results = [c.run() for c in self.checks]
        return {
            "passed": all(r["passed"] for r in results),
            "n_checks": len(results),
            "n_passed": sum(r["passed"] for r in results),
            "checks": results,
        }


class QuantumValidationFramework:
    """Correctness invariants of the quantum tier."""

    def __init__(self):
        self.checks: List[ValidationCheck] = []
        self._register_defaults()

    def register(self, name: str, fn: Callable[[], Dict[str, Any]]) -> None:
        self.checks.append(ValidationCheck(name, fn))

    def _register_defaults(self) -> None:
        self.register("unitarity", self._check_unitarity)
        self.register("norm_preservation", self._check_norm)
        self.register("gradient_vs_parameter_shift", self._check_gradient)
        self.register("decoder_single_errors", self._check_decoder)
        self.register("compiled_circuit_equivalence", self._check_compiler)

    def _check_unitarity(self) -> Dict[str, Any]:
        from ..quantum.circuits import QuantumCircuit

        rng = np.random.default_rng(0)
        circ = QuantumCircuit(3)
        for _ in range(8):
            circ.add(rng.choice(["H", "S", "T", "X"]), int(rng.integers(3)))
        circ.cnot(0, 2)
        U = circ.unitary()
        err = float(np.abs(U.conj().T @ U - np.eye(8)).max())
        return {"passed": err < 1e-5, "max_deviation": err}

    def _check_norm(self) -> Dict[str, Any]:
        from ..quantum import statevector as sv
        from ..quantum.circuits import QuantumCircuit

        rng = np.random.default_rng(1)
        circ = QuantumCircuit(8)
        for d in range(20):
            for w in range(8):
                circ.add("RY", w, float(rng.uniform(0, np.pi)))
            for w in range(d % 2, 7, 2):
                circ.cz(w, w + 1)
        psi = circ.run()
        norm = float(jnp.sum(sv.probabilities(psi)))
        return {"passed": abs(norm - 1.0) < 1e-4, "norm": norm}

    def _check_gradient(self) -> Dict[str, Any]:
        """Autodiff d<Z>/dtheta must equal the parameter-shift value."""
        from ..quantum import statevector as sv
        from ..quantum.circuits import QuantumCircuit

        circ = QuantumCircuit(2).rx(0, 0).ry(1, 1)
        circ.cnot(0, 1)

        def f(p):
            return sv.expectation_z(circ.run(p), 1)

        theta = jnp.asarray([0.4, 0.9])
        auto = np.asarray(jax.grad(f)(theta))
        shift = np.zeros(2)
        for i in range(2):
            e = np.zeros(2)
            e[i] = np.pi / 2
            shift[i] = 0.5 * (
                float(f(theta + e)) - float(f(theta - e))
            )
        err = float(np.abs(auto - shift).max())
        return {"passed": err < 1e-4, "max_gradient_error": err}

    def _check_decoder(self) -> Dict[str, Any]:
        from ..quantum.error_correction import SurfaceCodeErrorCorrection

        code = SurfaceCodeErrorCorrection()
        errors = jnp.eye(9, dtype=jnp.int32)
        fx = bool(code.logical_failure(errors, "x").any())
        fz = bool(code.logical_failure(errors, "z").any())
        return {"passed": not (fx or fz), "x_failures": fx, "z_failures": fz}

    def _check_compiler(self) -> Dict[str, Any]:
        from ..quantum.circuits import HardwareCompiler, QuantumCircuit

        circ = QuantumCircuit(3).h(0).cnot(0, 2).add("T", 1)
        compiled = HardwareCompiler().compile(circ)
        U1, U2 = circ.unitary(), compiled.unitary()
        ov = U1.conj().ravel() @ U2.ravel()
        ok = abs(ov) > 1e-9 and np.allclose(
            U1 * (ov / abs(ov)), U2, atol=1e-4
        )
        return {"passed": bool(ok), "overlap": float(abs(ov)) / U1.shape[0]}

    def run_all(self) -> Dict[str, Any]:
        results = [c.run() for c in self.checks]
        return {
            "passed": all(r["passed"] for r in results),
            "n_checks": len(results),
            "n_passed": sum(r["passed"] for r in results),
            "checks": results,
        }
