"""Pallas kernel vs XLA integrator agreement (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spintorque_tpu.physics import IntegratorConfig, LLGSParams, integrate_pulse
from spintorque_tpu.ops.pallas_integrator import (
    integrate_pulse_pallas,
    pallas_supported,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3,
    damping=0.01,
    uniaxial_anisotropy=1.2e6,
    volume=1e-23,
    polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
)


def _setup(B=256, seed=0):
    key = jax.random.PRNGKey(seed)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jax.random.uniform(jax.random.fold_in(key, 1), (B,), jnp.float32,
                               5e-11, 3e-10)
    cur = jax.random.uniform(jax.random.fold_in(key, 2), (B,), jnp.float32,
                             -200.0, 200.0)
    return (m[:, 0], m[:, 1], m[:, 2]), spans, cur


def _assert_close(pallas_out, ref):
    (px, py, pz), n, dt, failed = pallas_out
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref.m[0]), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(py), np.asarray(ref.m[1]), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pz), np.asarray(ref.m[2]), rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref.n_substeps))
    np.testing.assert_array_equal(np.asarray(failed), np.asarray(ref.failed))


def test_pallas_supported_gate():
    cfg = IntegratorConfig(method="rk4")
    assert pallas_supported(PARAMS, cfg, jnp.float32)
    assert not pallas_supported(PARAMS, cfg, jnp.float64)
    # Tilted / per-env axes are covered by the general-RHS kernel.
    tilted = PARAMS.replace(easy_axis=jnp.array([1.0, 0.0, 0.0], jnp.float32))
    assert pallas_supported(tilted, cfg, jnp.float32)
    per_env = PARAMS.replace(
        easy_axis=jnp.tile(jnp.array([[0.6, 0.0, 0.8]], jnp.float32), (16, 1))
    )
    assert pallas_supported(per_env, cfg, jnp.float32)
    # Degenerate axes are not.
    bad = PARAMS.replace(easy_axis=jnp.zeros((3,), jnp.float32))
    assert not pallas_supported(bad, cfg, jnp.float32)
    assert pallas_supported(PARAMS, IntegratorConfig(method="heun"), jnp.float32)
    assert not pallas_supported(
        PARAMS, IntegratorConfig(method="dop853"), jnp.float32
    )


@pytest.mark.parametrize("method", ["euler", "heun", "rk4"])
def test_pallas_matches_xla_deterministic(method):
    m0, spans, cur = _setup()
    cfg = IntegratorConfig(method=method, max_substeps=512)
    ref = integrate_pulse(m0, spans, cur, PARAMS.astype(jnp.float32), cfg)
    with pltpu.force_tpu_interpret_mode():
        out = integrate_pulse_pallas(m0, spans, cur, PARAMS.astype(jnp.float32), cfg)
    _assert_close(out, ref)


@pytest.mark.parametrize("B", [1, 5, 200])
def test_pallas_odd_batch_sizes(B):
    """Batches that are not lane/tile multiples exercise the padding AND the
    scatter-based inverse permutation at degenerate shapes (B=1: the
    permutation is a single element; B=200: 1 lane-row padded to a tile)."""
    m0, spans, cur = _setup(B=B, seed=11)
    cfg = IntegratorConfig(method="rk4", max_substeps=256)
    ref = integrate_pulse(m0, spans, cur, PARAMS.astype(jnp.float32), cfg)
    with pltpu.force_tpu_interpret_mode():
        out = integrate_pulse_pallas(m0, spans, cur, PARAMS.astype(jnp.float32), cfg)
    _assert_close(out, ref)


def test_pallas_matches_xla_tilted_axis():
    """General-RHS kernel: scalar tilted easy axis must match the XLA path."""
    m0, spans, cur = _setup(B=128, seed=7)
    tilted = PARAMS.replace(
        easy_axis=jnp.array([0.6, 0.0, 0.8], jnp.float32)
    ).astype(jnp.float32)
    cfg = IntegratorConfig(method="rk4", max_substeps=256)
    ref = integrate_pulse(m0, spans, cur, tilted, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = integrate_pulse_pallas(m0, spans, cur, tilted, cfg)
    _assert_close(out, ref)


def test_pallas_per_env_params_with_heterogeneous_spans():
    """Pins the sort-alignment contract: per-env (B,) physics params and
    per-env (B, 3) easy axes must ride through the descending-n sort with
    their env. Spans vary (non-identity permutation) and params vary
    per-env, so any missed permute shows up as a large mismatch.
    (Advisor round-1 high-severity findings #1/#2.)"""
    B = 192
    m0, spans, cur = _setup(B=B, seed=11)
    key = jax.random.PRNGKey(99)
    axes = jax.random.normal(key, (B, 3), jnp.float32)
    axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
    params = LLGSParams(
        saturation_magnetization=jax.random.uniform(
            jax.random.fold_in(key, 1), (B,), jnp.float32, 4e5, 1.2e6),
        damping=jax.random.uniform(
            jax.random.fold_in(key, 2), (B,), jnp.float32, 0.005, 0.05),
        uniaxial_anisotropy=jax.random.uniform(
            jax.random.fold_in(key, 3), (B,), jnp.float32, 3e5, 2e6),
        volume=jax.random.uniform(
            jax.random.fold_in(key, 4), (B,), jnp.float32, 5e-24, 5e-23),
        polarization=jax.random.uniform(
            jax.random.fold_in(key, 5), (B,), jnp.float32, 0.3, 0.9),
        easy_axis=axes,
    )
    cfg = IntegratorConfig(method="rk4", max_substeps=512)
    ref = integrate_pulse(m0, spans, cur, params, cfg)
    with pltpu.force_tpu_interpret_mode():
        out = integrate_pulse_pallas(m0, spans, cur, params, cfg)
    _assert_close(out, ref)


# The threefry_bits fixture (raw-bits substitution harness) lives in
# tests/unit/conftest.py so test_rk4_noise_modes.py can share it.


def test_pallas_thermal_sigma_rides_the_sort(threefry_bits):
    """Half the envs run at T=0 (exactly deterministic), half at T=500 K.
    Spans are laid out ASCENDING so the descending-n sort reverses the batch;
    if the temperature/sigma arrays were not permuted with the state, the
    wrong envs would receive noise. The T=0 half must match the
    deterministic XLA result bitwise-ish; the T=500 half must differ."""
    B = 128
    key = jax.random.PRNGKey(5)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    m0 = (m[:, 0], m[:, 1], m[:, 2])
    spans = jnp.linspace(5e-11, 3e-10, B).astype(jnp.float32)  # ascending
    cur = jnp.full((B,), 150.0, jnp.float32)
    temp = jnp.where(jnp.arange(B) % 2 == 0, 0.0, 500.0).astype(jnp.float32)

    det_cfg = IntegratorConfig(method="heun", max_substeps=512)
    ref = integrate_pulse(m0, spans, cur, PARAMS.astype(jnp.float32), det_cfg)

    thermal_cfg = IntegratorConfig(
        method="heun", max_substeps=512, thermal=True, noise_mode="physical"
    )
    with pltpu.force_tpu_interpret_mode():
        (px, py, pz), n, dt, failed = integrate_pulse_pallas(
            m0, spans, cur, PARAMS.astype(jnp.float32), thermal_cfg,
            key=jax.random.PRNGKey(42), temperature=temp,
        )
    cold = np.arange(B) % 2 == 0
    np.testing.assert_allclose(
        np.asarray(px)[cold], np.asarray(ref.m[0])[cold], rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(pz)[cold], np.asarray(ref.m[2])[cold], rtol=2e-6, atol=2e-6)
    hot_diff = np.abs(np.asarray(pz)[~cold] - np.asarray(ref.m[2])[~cold])
    assert hot_diff.max() > 1e-5, "T=500K envs produced no thermal deviation"


def test_pallas_freeze_flag_matches():
    """Large currents must produce the same failed flags as the XLA path."""
    B = 128
    key = jax.random.PRNGKey(3)
    m = jax.random.normal(key, (B, 3), jnp.float32)
    m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
    spans = jnp.full((B,), 1e-10, jnp.float32)
    # half small (fine), half large (blow-up/freeze or fallback)
    cur = jnp.where(jnp.arange(B) % 2 == 0, 50.0, 1e6).astype(jnp.float32)
    cfg = IntegratorConfig(method="rk4", max_substeps=128)
    ref = integrate_pulse((m[:, 0], m[:, 1], m[:, 2]), spans, cur,
                          PARAMS.astype(jnp.float32), cfg)
    with pltpu.force_tpu_interpret_mode():
        (px, py, pz), n, dt, failed = integrate_pulse_pallas(
            (m[:, 0], m[:, 1], m[:, 2]), spans, cur, PARAMS.astype(jnp.float32), cfg
        )
    np.testing.assert_array_equal(np.asarray(failed), np.asarray(ref.failed))
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref.m[0]), rtol=2e-6, atol=2e-6)


def test_pallas_noise_statistics(threefry_bits):
    """CI-runnable statistical validation of the kernel's Box-Muller path
    (VERDICT round-1 weak #3): draws through the same _normal_pair_from_bits
    the thermal kernel uses — signed-int32 bits -> mantissa-bitcast uniform
    -> Box-Muller — in interpret mode, and checks moments + a KS test
    against the standard normal. Fails if the mantissa masking or the
    transform regresses (e.g. the signed-bits NaN bug the docstring warns
    about). The raw hardware bits themselves are validated on-TPU by
    scripts/verify_pallas_thermal.py."""
    from scipy import stats

    from spintorque_tpu.ops import pallas_integrator as pi

    rows, lanes = 64, 128

    def kern(a_ref, b_ref):
        a, b = pi._normal_pair_from_bits((rows, lanes))
        a_ref[:] = a
        b_ref[:] = b

    with pltpu.force_tpu_interpret_mode():
        a, b = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            ],
        )()
    samples = np.concatenate([np.asarray(a).ravel(), np.asarray(b).ravel()])
    n = samples.size  # 16384
    assert np.all(np.isfinite(samples)), "non-finite normals from Box-Muller"
    # Moments: mean ~ N(0, 1/n), std err of std ~ 1/sqrt(2n), |skew| small.
    assert abs(samples.mean()) < 5.0 / math.sqrt(n)
    assert abs(samples.std() - 1.0) < 5.0 / math.sqrt(2 * n)
    assert abs(stats.skew(samples)) < 0.12
    assert abs(stats.kurtosis(samples)) < 0.25
    # Distribution-level check: KS against N(0,1).
    ks = stats.kstest(samples, "norm")
    assert ks.pvalue > 1e-4, f"KS test rejects normality: {ks}"
    # cos/sin halves of the same transform must be uncorrelated.
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1]
    assert abs(corr) < 0.05


def test_bf16_rhs_variant_accuracy_and_gating():
    """IntegratorConfig.bf16_rhs: bf16 stage arithmetic with f32 state
    accumulation. Pins (a) the variant runs and stays on the unit sphere,
    (b) it REALLY computes in bf16 (nonzero deviation from f32 - an earlier
    harness used torque-dominated currents whose dynamics snap both
    variants onto the exact (0,0,1) fixed point, hiding a would-be wiring
    bug), and (c) the deviation stays within the bf16 phase-drift bound
    for a <=300-substep precession pulse. The workload is zero-current
    precession + damping: no attractor snap, so rounding differences
    accumulate and are observable."""
    m0, spans, _ = _setup(B=256, seed=3)
    cur = jnp.zeros_like(spans)
    cfg32 = IntegratorConfig(method="rk4", max_substeps=512)
    cfg16 = cfg32._replace(bf16_rhs=True)
    with pltpu.force_tpu_interpret_mode():
        (ax, ay, az), n32, _, f32_failed = integrate_pulse_pallas(
            m0, spans, cur, PARAMS.astype(jnp.float32), cfg32)
        (bx, by, bz), n16, _, f16_failed = integrate_pulse_pallas(
            m0, spans, cur, PARAMS.astype(jnp.float32), cfg16)
    a = np.stack([np.asarray(ax), np.asarray(ay), np.asarray(az)], -1)
    b = np.stack([np.asarray(bx), np.asarray(by), np.asarray(bz)], -1)
    assert np.all(np.isfinite(b))
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n32), np.asarray(n16))
    assert not np.asarray(f16_failed).any()
    # Engagement: bf16 rounding must actually perturb the trajectories...
    cosang = np.clip(np.sum(a * b, axis=-1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cosang))
    assert ang.max() > 1e-3, "bf16_rhs produced bitwise-f32 results"
    # ...and stay within the phase-drift bound (~0.4% per-substep relative
    # field error accumulating over <=300 substeps of ~0.1 rad precession).
    assert ang.mean() < 6.0, ang.mean()
    assert ang.max() < 25.0, ang.max()


def test_pallas_matches_xla_randomized_configs():
    """Seeded randomized config sweep: for random (method, batch, axis,
    span-range, current-range, per-env-param) combinations, the Pallas
    kernel (interpret) must match the XLA path at the deterministic
    tolerance. Broadens the fixed-config parity tests above after the
    round-4 kernel restructures (chains/segments/delta-form)."""
    rng = np.random.default_rng(1234)
    for trial in range(6):
        B = int(rng.choice([32, 96, 256, 520]))
        method = str(rng.choice(["euler", "heun", "rk4"]))
        key = jax.random.PRNGKey(100 + trial)
        m = jax.random.normal(key, (B, 3), jnp.float32)
        m = m / jnp.linalg.norm(m, axis=-1, keepdims=True)
        m0 = (m[:, 0], m[:, 1], m[:, 2])
        lo = float(rng.uniform(1e-12, 1e-10))
        hi = float(rng.uniform(2e-10, 4e-10))
        spans = jax.random.uniform(jax.random.fold_in(key, 1), (B,),
                                   jnp.float32, lo, hi)
        cur = jax.random.uniform(jax.random.fold_in(key, 2), (B,),
                                 jnp.float32, -300.0, 300.0)
        params = PARAMS.astype(jnp.float32)
        if rng.random() < 0.5:
            axis = rng.normal(size=3)
            axis = axis / np.linalg.norm(axis)
            params = params.replace(
                easy_axis=jnp.asarray(axis, jnp.float32))
        if rng.random() < 0.5:
            params = params.replace(
                damping=jnp.asarray(
                    rng.uniform(0.005, 0.05, B), jnp.float32),
                uniaxial_anisotropy=jnp.asarray(
                    rng.uniform(8e5, 1.6e6, B), jnp.float32),
            )
        cfg = IntegratorConfig(method=method, max_substeps=512)
        ref = integrate_pulse(m0, spans, cur, params, cfg)
        with pltpu.force_tpu_interpret_mode():
            out = integrate_pulse_pallas(m0, spans, cur, params, cfg)
        label = f"trial={trial} method={method} B={B}"
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(out[0][c]), np.asarray(ref.m[c]),
                rtol=2e-6, atol=2e-6, err_msg=label)
        np.testing.assert_array_equal(
            np.asarray(out[1]), np.asarray(ref.n_substeps), err_msg=label)
        np.testing.assert_array_equal(
            np.asarray(out[3]), np.asarray(ref.failed), err_msg=label)


def test_cos_sin_2pi_accuracy():
    """The quadrant-folded Cephes polynomials must match libm cos/sin of
    2*pi*u to ~1 ulp-class absolute error over the whole input domain,
    including the quadrant boundaries (u = k/8) and the wrap at u->1."""
    from spintorque_tpu.ops.pallas_integrator import _cos_sin_2pi

    u = np.concatenate([
        np.linspace(0.0, 1.0, 200_001, dtype=np.float64)[:-1],
        np.asarray([0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875,
                    1.0 - 2**-24]),
    ])
    c, s = _cos_sin_2pi(jnp.asarray(u, jnp.float32))
    theta = 2.0 * np.pi * u.astype(np.float64)
    err_c = np.abs(np.asarray(c, np.float64) - np.cos(theta))
    err_s = np.abs(np.asarray(s, np.float64) - np.sin(theta))
    assert err_c.max() < 4e-7, err_c.max()
    assert err_s.max() < 4e-7, err_s.max()
    # unit norm to float32 rounding
    norm = np.asarray(c, np.float64) ** 2 + np.asarray(s, np.float64) ** 2
    assert np.abs(norm - 1.0).max() < 1e-6
