"""Unit tests for the LLGS right-hand side and integrator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.constants import GAMMA, MU0
from spintorque_tpu.physics import (
    IntegratorConfig,
    LLGSParams,
    LLGSSolver,
    dmdt,
    effective_field,
    integrate_pulse,
    normalize_with_fallback,
    substep_counts,
)

STT_PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=50e-9 * 100e-9 * 2e-9,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0]),
)


def _np_dmdt(m, current, p):
    """Independent NumPy reimplementation of simple_solver.py:297-344."""
    alpha, ms, k_u = p["damping"], p["saturation_magnetization"], p["uniaxial_anisotropy"]
    volume, pol = p["volume"], p["polarization"]
    easy = np.asarray(p["easy_axis"], float)
    easy = easy / np.linalg.norm(easy)
    h_k = (2 * k_u) / (MU0 * ms)
    h = h_k * np.dot(m, easy) * easy + np.array([0.0, 0.0, -ms * m[2]])
    if abs(current) > 1e-12:
        torque = (pol * current / (ms * volume)) * np.cross(m, np.cross(m, easy))
    else:
        torque = np.zeros(3)
    gamma_eff = GAMMA / (1 + alpha**2)
    prec = np.cross(m, h)
    damp = alpha * np.cross(m, prec)
    return -gamma_eff * (prec + damp) + torque


@pytest.mark.parametrize("current", [0.0, 1e6, -2e6])
def test_dmdt_matches_numpy_reference_form(current):
    m = np.array([0.6, -0.48, 0.64])
    m = m / np.linalg.norm(m)
    p = dict(
        damping=0.01, saturation_magnetization=800e3, uniaxial_anisotropy=1.2e6,
        volume=1e-23, polarization=0.7, easy_axis=[0.0, 0.0, 1.0],
    )
    params = LLGSParams(
        saturation_magnetization=p["saturation_magnetization"], damping=p["damping"],
        uniaxial_anisotropy=p["uniaxial_anisotropy"], volume=p["volume"],
        polarization=p["polarization"], easy_axis=jnp.array(p["easy_axis"], jnp.float64),
    )
    got = dmdt(
        jnp.float64(m[0]), jnp.float64(m[1]), jnp.float64(m[2]),
        jnp.float64(current), params,
    )
    want = _np_dmdt(m, current, p)
    np.testing.assert_allclose(np.array(got), want, rtol=1e-12)


def test_effective_field_components():
    params = STT_PARAMS.astype(jnp.float64)
    hx, hy, hz = effective_field(
        jnp.float64(0.0), jnp.float64(0.0), jnp.float64(1.0), params
    )
    h_k = 2 * 1.2e6 / (MU0 * 800e3)
    assert float(hx) == 0.0 and float(hy) == 0.0
    np.testing.assert_allclose(float(hz), h_k - 800e3, rtol=1e-12)


def test_normalize_with_fallback():
    mx = jnp.array([3.0, 0.0, jnp.nan, 1e-20])
    my = jnp.array([0.0, 0.0, 0.0, 0.0])
    mz = jnp.array([4.0, 0.0, 1.0, 0.0])
    nx, ny, nz = normalize_with_fallback(mx, my, mz)
    np.testing.assert_allclose(np.array(nx), [0.6, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.array(nz), [0.8, 1.0, 1.0, 1.0])


def test_substep_counts_matches_reference_law():
    spans = jnp.array([1e-12, 1e-10, 1e-9, 5e-9], jnp.float64)
    dt, n = substep_counts(spans, 1e-12)
    for s, dt_i, n_i in zip(np.array(spans), np.array(dt), np.array(n)):
        dt0 = min(1e-12, s / 100)
        n_ref = max(10, int(s / dt0))
        assert n_i == n_ref
        np.testing.assert_allclose(dt_i, s / n_ref, rtol=0)


def test_integrate_pulse_preserves_norm_and_damps_to_easy_axis():
    # High damping, no torque: m should relax toward +/-z and stay unit norm.
    params = LLGSParams(
        saturation_magnetization=800e3, damping=0.5, uniaxial_anisotropy=1.2e6,
        volume=1e-23, polarization=0.7, easy_axis=jnp.array([0.0, 0.0, 1.0]),
    ).astype(jnp.float64)
    B = 32
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (B, 3), jnp.float64)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    cfg = IntegratorConfig(method="rk4", max_substeps=2048)
    res = integrate_pulse(
        (m[:, 0], m[:, 1], m[:, 2]),
        span=jnp.full((B,), 2e-9, jnp.float64),
        current=jnp.zeros((B,), jnp.float64),
        params=params,
        config=cfg,
    )
    mx, my, mz = res.m
    norm = np.array(jnp.sqrt(mx**2 + my**2 + mz**2))
    np.testing.assert_allclose(norm, 1.0, atol=1e-9)
    # Relaxed: |mz| should have grown toward 1 for nearly all envs.
    assert float(jnp.mean(jnp.abs(mz))) > float(jnp.mean(jnp.abs(m[:, 2])))


def test_integrate_pulse_variable_durations_masked():
    params = STT_PARAMS.astype(jnp.float64)
    B = 8
    m = jnp.tile(jnp.array([[0.1, 0.0, 0.995]], jnp.float64), (B, 1))
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jnp.array([1e-10 * (i + 1) for i in range(B)], jnp.float64)
    cfg = IntegratorConfig(method="rk4", max_substeps=1200)
    res = integrate_pulse(
        (m[:, 0], m[:, 1], m[:, 2]), spans, jnp.full((B,), 1e6, jnp.float64),
        params, cfg,
    )
    # Each env must match an independently-run batch of its own duration.
    for i in [0, 3, 7]:
        solo = integrate_pulse(
            (m[i : i + 1, 0], m[i : i + 1, 1], m[i : i + 1, 2]),
            spans[i : i + 1],
            jnp.full((1,), 1e6, jnp.float64),
            params,
            cfg,
        )
        for c in range(3):
            np.testing.assert_allclose(
                float(res.m[c][i]), float(solo.m[c][0]), rtol=1e-12
            )


def test_thermal_modes_run_and_are_reproducible(rng_key):
    params = STT_PARAMS.astype(jnp.float32)
    B = 16
    m = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (B, 1))
    for mode, method in [("reference", "rk4"), ("physical", "heun")]:
        cfg = IntegratorConfig(method=method, thermal=True, noise_mode=mode, max_substeps=256)
        r1 = integrate_pulse(
            (m[:, 0], m[:, 1], m[:, 2]), jnp.full((B,), 1e-10, jnp.float32),
            jnp.zeros((B,), jnp.float32), params, cfg, key=rng_key, temperature=300.0,
        )
        r2 = integrate_pulse(
            (m[:, 0], m[:, 1], m[:, 2]), jnp.full((B,), 1e-10, jnp.float32),
            jnp.zeros((B,), jnp.float32), params, cfg, key=rng_key, temperature=300.0,
        )
        for c in range(3):
            np.testing.assert_array_equal(np.array(r1.m[c]), np.array(r2.m[c]))
        # Noise actually perturbed the state off the pole.
        assert float(jnp.max(jnp.abs(r1.m[0]))) > 0.0


def test_solver_facade_single_and_batch():
    solver = LLGSSolver(method="rk4", dtype=jnp.float64)
    p = dict(
        damping=0.01, saturation_magnetization=800e3, uniaxial_anisotropy=1.2e6,
        volume=1e-23, polarization=0.7, easy_axis=np.array([0.0, 0.0, 1.0]),
    )
    res = solver.solve(np.array([0.0, 0.1, 0.995]), (0.0, 1e-10), p, current=1e2)
    assert res["success"]
    assert np.asarray(res["m"]).shape == (3,)
    resb = solver.solve(np.tile([0.0, 0.1, 0.995], (4, 1)), (0.0, 1e-10), p, current=1e2)
    assert np.asarray(resb["m"]).shape == (4, 3)
    np.testing.assert_allclose(np.asarray(resb["m"])[0], np.asarray(res["m"]), rtol=1e-12)
    # Zero span -> trivial solution.
    triv = solver.solve(np.array([0.0, 0.0, 1.0]), (0.0, 0.0), p)
    assert triv["success"] and triv["n_steps"] == 1
    # Large current -> RK4 norm-overflow -> reference "freeze" failure
    # (see PulseResult.failed). The facade reports success=False.
    frozen = solver.solve(np.array([0.0, 0.1, 0.995]), (0.0, 1e-10), p, current=1e6)
    assert not frozen["success"]
