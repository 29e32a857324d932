"""Unit tests for the quantum add-on tier (spintorque_tpu/quantum/).

Coverage model follows the reference's test style for its quantum modules
(which have none - these tests are an upgrade): golden quantum-mechanical
identities, code-theoretic invariants, and end-to-end optimizer sanity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spintorque_tpu.quantum import (
    AdaptiveResourceOptimizer,
    AdaptiveScheduler,
    CircuitOptimizer,
    HardwareCompiler,
    HybridMultiDeviceSimulator,
    IterationFreeQAOA,
    LogicalQubitOperations,
    ProgrammableQuantumSimulator,
    QuantumAdvantageVerifier,
    QuantumCircuit,
    QuantumEnhancedEnergyLandscape,
    QuantumMLDeviceOptimizer,
    SimulationTask,
    SkyrmionErrorCorrection,
    SurfaceCodeErrorCorrection,
    SymmetryEnhancedVQE,
    TopologicalProtection,
)
from spintorque_tpu.quantum import statevector as sv


# ---------------------------------------------------------------------------
# state vector core

def test_bell_state():
    psi = QuantumCircuit(2).h(0).cnot(0, 1).run()
    np.testing.assert_allclose(
        sv.probabilities(psi), [0.5, 0, 0, 0.5], atol=1e-6
    )


def test_ghz_stabilizers():
    psi = QuantumCircuit(3).h(0).cnot(0, 1).cnot(1, 2).run()
    assert abs(float(sv.expectation_pauli(psi, "ZZI")) - 1.0) < 1e-6
    assert abs(float(sv.expectation_pauli(psi, "IZZ")) - 1.0) < 1e-6
    assert abs(float(sv.expectation_pauli(psi, "XXX")) - 1.0) < 1e-6


def test_rotation_gradient_matches_analytic():
    circ = QuantumCircuit(1).rx(0, 0)
    grad = jax.grad(lambda p: sv.expectation_z(circ.run(p), 0))(jnp.array([0.7]))
    assert abs(float(grad[0]) + np.sin(0.7)) < 1e-5


def test_expectation_z_wire_order():
    # |01> (wire 0 = 1, wire 1 = 0): <Z0> = -1, <Z1> = +1
    psi = sv.basis_state(2, 1)
    assert float(sv.expectation_z(psi, 0)) == pytest.approx(-1.0)
    assert float(sv.expectation_z(psi, 1)) == pytest.approx(1.0)


def test_sample_counts_distribution():
    psi = QuantumCircuit(1).h(0).run()
    samples = sv.sample_counts(psi, jax.random.PRNGKey(0), 2000)
    frac = float(jnp.mean((samples == 1).astype(jnp.float32)))
    assert 0.4 < frac < 0.6


# ---------------------------------------------------------------------------
# circuit optimizer / compiler

def _unitaries_equal(c1, c2, atol=1e-4):
    U1, U2 = np.asarray(c1.unitary()), np.asarray(c2.unitary())
    ov = U1.conj().ravel() @ U2.ravel()
    if abs(ov) < 1e-9:
        return False
    phase = ov / abs(ov)
    return np.allclose(U1 * phase, U2, atol=atol)


def test_optimizer_cancels_self_inverse():
    circ = QuantumCircuit(2).h(0).h(0).x(1).x(1)
    opt = CircuitOptimizer().optimize(circ)
    assert len(opt.gates) == 0


def test_optimizer_preserves_unitary():
    rng = np.random.default_rng(3)
    circ = QuantumCircuit(3)
    for _ in range(12):
        circ.add(rng.choice(["H", "X", "Y", "S", "T"]), int(rng.integers(3)))
    circ.cnot(0, 2)
    assert _unitaries_equal(circ, CircuitOptimizer().optimize(circ))


def test_compiler_random_equivalence():
    rng = np.random.default_rng(7)
    hc = HardwareCompiler()
    for _ in range(3):
        circ = QuantumCircuit(4)
        for _ in range(10):
            kind = rng.integers(3)
            if kind == 0:
                circ.add(rng.choice(["H", "X", "S", "T"]), int(rng.integers(4)))
            elif kind == 1:
                a, b = rng.choice(4, 2, replace=False)
                circ.add(rng.choice(["CNOT", "CZ", "SWAP"]), (int(a), int(b)))
            else:
                a, b = rng.choice(4, 2, replace=False)
                circ.add("CRZ", (int(a), int(b)), float(rng.uniform(0, 2 * np.pi)))
        compiled = hc.compile(circ)
        assert _unitaries_equal(circ, compiled)
        # native set only
        for g in compiled.gates:
            assert g.name in ("RZ", "RX", "CZ", "FUSED")


def test_compiler_adjacency():
    compiled = HardwareCompiler().compile(QuantumCircuit(4).cnot(0, 3))
    for g in compiled.gates:
        if len(g.wires) == 2:
            assert abs(g.wires[0] - g.wires[1]) == 1


# ---------------------------------------------------------------------------
# QAOA / surrogate optimizers

def test_qaoa_finds_small_qubo_optimum():
    Q = np.array([[-1.0, 2.0, 0.0], [0.0, -1.0, 2.0], [0.0, 0.0, -1.0]])
    qaoa = IterationFreeQAOA(grid_points=16)
    res = qaoa.optimize(Q)
    cost = np.asarray(qaoa.qubo_cost_vector(Q))
    assert res.best_value == pytest.approx(float(cost.min()))
    assert qaoa.approximation_ratio(Q, res) == pytest.approx(1.0)


def test_qaoa_cost_vector():
    Q = np.array([[1.0, 0.0], [0.0, 2.0]])
    cost = np.asarray(IterationFreeQAOA.qubo_cost_vector(Q))
    np.testing.assert_allclose(cost, [0.0, 1.0, 2.0, 3.0])


def test_surrogate_optimizer_converges():
    def objective(d):
        return (d["a"] - 0.3) ** 2 + (d["b"] + 0.5) ** 2

    opt = QuantumMLDeviceOptimizer(
        n_train=256, train_steps=150, refine_starts=32, refine_steps=40
    )
    res = opt.optimize(objective, {"a": (-1, 1), "b": (-1, 1)}, seed=0)
    assert res.best_value < 0.05


# ---------------------------------------------------------------------------
# error correction

def test_surface_code_structure():
    code = SurfaceCodeErrorCorrection()
    SZ, SX = code.Z_STABILIZERS, code.X_STABILIZERS
    assert ((SZ @ SX.T) % 2 == 0).all()  # CSS commutation
    assert ((SZ @ code.LOGICAL_X) % 2 == 0).all()
    assert ((SX @ code.LOGICAL_Z) % 2 == 0).all()
    assert (code.LOGICAL_X @ code.LOGICAL_Z) % 2 == 1


def test_surface_code_corrects_all_single_errors():
    code = SurfaceCodeErrorCorrection()
    errors = jnp.eye(9, dtype=jnp.int32)
    assert not bool(code.logical_failure(errors, "x").any())
    assert not bool(code.logical_failure(errors, "z").any())


def test_surface_code_suppression():
    code = SurfaceCodeErrorCorrection()
    res = code.logical_error_rate(0.01, n_trials=100_000)
    assert res["logical_x_rate"] < 0.01
    assert res["logical_z_rate"] < 0.01


def test_topological_protection_arrhenius():
    tp = TopologicalProtection()
    kT = 1.380649e-23 * 300
    low = tp.error_rate(60 * kT, 300.0)
    high = tp.error_rate(20 * kT, 300.0)
    assert low < high
    assert tp.stability_ratio(40 * kT, 300.0) == pytest.approx(40.0)


def test_skyrmion_majority_vote():
    sk = SkyrmionErrorCorrection(3)
    kT = 1.380649e-23 * 300
    out = sk.logical_error_rate(10 * kT, 300.0, op_time=1e-6, n_trials=50_000)
    assert out["logical_rate"] <= out["physical_rate"]


def test_logical_qubit_cnot():
    lq = LogicalQubitOperations()
    control = lq.logical_x(lq.init_frames(2))
    control, target = lq.logical_cnot(control, lq.init_frames(2))
    assert (np.asarray(target[:, 0]) == 1).all()


# ---------------------------------------------------------------------------
# VQE / energy landscape

def test_vqe_finds_diagonal_minimum():
    diag = jnp.asarray([3.0, 1.0, -2.0, 0.5, 2.0, 1.5, 0.0, 4.0])
    vqe = SymmetryEnhancedVQE(n_qubits=3, n_layers=2, iterations=200)
    res = vqe.minimize_diagonal(diag)
    assert res["ground_state_index"] == 2
    assert res["final_energy"] < 0.0


def test_quantum_energy_landscape_ground_state():
    from spintorque_tpu.physics.solver import params_from_dict

    params = params_from_dict(
        dict(
            volume=1e-24,
            saturation_magnetization=800e3,
            damping=0.01,
            uniaxial_anisotropy=1e6,
            easy_axis=np.array([0.0, 0.0, 1.0]),
        )
    )
    # without demag the minimum is along +-z (theta 0 or pi)
    qel = QuantumEnhancedEnergyLandscape(
        params, n_theta_qubits=4, include_demag=False
    )
    adv = qel.symmetry_advantage()
    assert adv["reduction_factor"] == 2**4
    res = qel.find_ground_state("uniaxial")
    assert abs(np.sin(res["theta"])) < 0.25  # near a pole


# ---------------------------------------------------------------------------
# hybrid scheduling

def test_scheduler_routes_both_paths():
    from spintorque_tpu.physics.solver import params_from_dict

    params = params_from_dict(dict(volume=1e-24))
    tasks = [
        SimulationTask("quantum_circuit", {"circuit": QuantumCircuit(2).h(0).cnot(0, 1)}),
        SimulationTask(
            "classical_llgs",
            {"m0": np.tile([0.1, 0.0, 0.995], (4, 1)), "params": params,
             "span": 1e-10, "max_substeps": 128},
        ),
    ]
    sched = AdaptiveScheduler()
    done = sched.submit(tasks)
    stats = sched.get_statistics()
    assert stats["quantum_tasks"] == 1 and stats["classical_tasks"] == 1
    for t in done:
        assert t.result is not None and t.cost_estimate > 0


def test_noisy_simulator_decoheres():
    circ = QuantumCircuit(2).h(0).cnot(0, 1)
    clean = ProgrammableQuantumSimulator(0.0).expectation(circ, "XX")
    noisy = ProgrammableQuantumSimulator(0.3, seed=1).expectation(
        circ, "XX", batch=64
    )
    assert clean == pytest.approx(1.0, abs=1e-5)
    assert noisy < clean - 0.05


def test_hybrid_multidevice_step():
    from spintorque_tpu.physics.solver import params_from_dict

    params = params_from_dict(dict(volume=1e-24))
    sim = HybridMultiDeviceSimulator(params, n_devices=4)
    m0 = np.tile([0.1, 0.0, 0.995], (4, 1)).astype(np.float32)
    out = sim.run(m0, currents=[1e6, -1e6], span=1e-10)
    assert out["trajectory"].shape == (3, 4, 3)
    norms = np.linalg.norm(out["final"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_resource_optimizer_caps_batch():
    ro = AdaptiveResourceOptimizer(hbm_bytes=1e9)
    rec = ro.recommend(
        SimulationTask("quantum_circuit", {"circuit": QuantumCircuit(16), "batch": 10**9})
    )
    assert rec["batch"] < 10**9
    rec2 = ro.recommend(
        SimulationTask("classical_llgs", {"m0": np.zeros((100, 3))})
    )
    assert rec2["padded_batch"] == 128


# ---------------------------------------------------------------------------
# advantage verification

def test_verifier_detects_real_advantage():
    rng = np.random.default_rng(0)

    def better(inst):
        return inst * 0.5  # lower cost, instant

    def worse(inst):
        return inst

    v = QuantumAdvantageVerifier(n_instances=10)
    report = v.verify("halves the cost", better, worse, lambda i: float(i + 1))
    assert report.verified
    assert report.quality_delta > 0


def test_verifier_rejects_no_advantage():
    def same_slow(inst):
        import time as _t

        _t.sleep(0.002)
        return inst

    def same_fast(inst):
        return inst

    v = QuantumAdvantageVerifier(n_instances=8)
    report = v.verify("slower, same quality", same_slow, same_fast, lambda i: float(i))
    assert not report.verified
