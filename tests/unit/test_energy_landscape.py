"""Tests for energy landscape analysis and batched vector ops."""

import jax.numpy as jnp
import numpy as np

from spintorque_tpu.physics import (
    EnergyLandscape,
    LLGSParams,
    batch_cross,
    batch_normalize,
    batch_tmr_resistance,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.01, uniaxial_anisotropy=1.2e6,
    volume=1e-23, polarization=0.7, easy_axis=jnp.array([0.0, 0.0, 1.0]),
)


def test_stable_states_are_poles():
    # Without demag, uniaxial z-anisotropy -> minima at +-z.
    el = EnergyLandscape(PARAMS, include_demag=False)
    states = el.find_stable_states()
    assert len(states) == 2
    mz = np.sort(states[:, 2])
    np.testing.assert_allclose(np.abs(mz), 1.0, atol=1e-2)


def test_energy_barrier_equals_KuV():
    # +z -> +x: the normalized linear path is the x-z great circle, whose
    # maximum is the hard-plane saddle at E = 0, so barrier = K_u V.
    # (The antiparallel +z -> -z path degenerates - the normalized linear
    # interpolation stays on the poles - same limitation as the reference's
    # linear-path method, energy_landscape.py:179-221.)
    el = EnergyLandscape(PARAMS, include_demag=False)
    barrier = el.energy_barrier([0, 0, 1.0], [1.0, 0, 0], n_points=720)
    np.testing.assert_allclose(barrier, 1.2e6 * 1e-23, rtol=1e-4)


def test_effective_field_matches_analytic():
    from spintorque_tpu.constants import MU0

    el = EnergyLandscape(PARAMS, include_demag=True)
    m = jnp.asarray([0.0, 0.0, 1.0], jnp.float64)
    h = el.effective_field(m)
    h_k = 2 * 1.2e6 / (MU0 * 800e3)
    np.testing.assert_allclose(float(h[2]), h_k - 800e3, rtol=1e-10)


def test_thermal_stability_factor():
    el = EnergyLandscape(PARAMS)
    delta = el.thermal_stability_factor(300.0)
    np.testing.assert_allclose(delta, 1.2e6 * 1e-23 / (1.380649e-23 * 300), rtol=1e-10)


def test_phase_diagram_bistability_vanishes_at_high_field():
    el = EnergyLandscape(PARAMS, include_demag=False)
    from spintorque_tpu.constants import MU0

    h_k = 2 * 1.2e6 / (MU0 * 800e3)
    d = el.switching_phase_diagram((0.0, 2.0 * h_k), n_fields=20, n_angles=10)
    grid = np.asarray(d["bistable"])
    assert grid[0].all()  # zero field: always bistable
    assert not grid[-1].any()  # 2 H_k: monostable at every angle


def test_batch_ops():
    a = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    b = jnp.asarray([[0, 1.0, 0], [0, 0, 2.0]])
    c = np.asarray(batch_cross(a, b))
    np.testing.assert_allclose(c, [[0, 0, 1], [2, 0, 0]])
    n = np.asarray(batch_normalize(jnp.asarray([[3.0, 0, 4.0]])))
    np.testing.assert_allclose(n, [[0.6, 0, 0.8]])
    r = batch_tmr_resistance(
        jnp.asarray([[0, 0, 1.0], [0, 0, -1.0]]), [0, 0, 1.0], 1e3, 2e3
    )
    np.testing.assert_allclose(np.asarray(r), [1e3, 2e3])
