"""Device-layer tests: factory, resistance models, analytics."""

import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.devices import (
    DeviceFactory,
    create_device,
    default_device_dict,
    device_factory,
    exchange_length,
    make_device_params,
    skyrmion_energy,
    skyrmion_hall_angle,
    skyrmion_resistance,
    skyrmion_stability,
    skyrmion_velocity,
    sot_spin_torques,
    sot_switching_threshold,
    vcma_effective_anisotropy,
    vcma_leakage_current,
    vcma_pulse_energy,
    vcma_switching_probability,
    vcma_switching_time,
)
from spintorque_tpu.constants import MU0


def test_factory_registry_and_defaults():
    f = DeviceFactory()
    assert set(f.get_available_devices()) >= {
        "stt_mram", "sot_mram", "vcma_mram", "skyrmion", "skyrmion_track"
    }
    for t in f.get_available_devices():
        d = f.create_default_device(t)
        assert d.device_type == t
    with pytest.raises(ValueError):
        f.create_device("nonexistent", {})


def test_stt_resistance_model():
    d = create_device("stt_mram")
    r_p = d.compute_resistance(np.array([0.0, 0.0, 1.0]))
    r_ap = d.compute_resistance(np.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(float(r_p), 1e3, rtol=1e-6)
    np.testing.assert_allclose(float(r_ap), 2e3, rtol=1e-6)
    r_mid = d.compute_resistance(np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(r_mid), 1.5e3, rtol=1e-6)
    # batched query
    r_b = d.compute_resistance(np.array([[0, 0, 1.0], [0, 0, -1.0]]))
    assert np.asarray(r_b).shape == (2,)


def test_parameter_validation():
    with pytest.raises(ValueError):
        make_device_params("stt_mram", {"damping": 2.0})
    with pytest.raises(ValueError):
        make_device_params("stt_mram", {"volume": -1.0})
    with pytest.raises(ValueError):
        make_device_params("stt_mram", {"bogus_parameter": 1.0})


def test_sot_analytics():
    p = make_device_params("sot_mram")
    jc = float(sot_switching_threshold(p))
    assert 1e6 < jc < 1e8
    (dlx, dly, dlz), (flx, fly, flz) = sot_spin_torques(
        1e10, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0), p
    )
    # sigma = z x x_hat = +y; DL = tau (sigma x m): y x z = +x
    assert float(dlx) > 0 and abs(float(dlz)) < 1e-6
    assert float(fly) > 0  # FL along sigma = +y


def test_vcma_analytics():
    p = make_device_params("vcma_mram")
    k0 = float(np.asarray(p.uniaxial_anisotropy))
    assert float(vcma_effective_anisotropy(0.0, p)) == k0
    k_at_1v = float(vcma_effective_anisotropy(1.0, p))
    assert k_at_1v < k0
    # clamp at -0.5 K0 for extreme voltage (breakdown clip first)
    k_huge = float(vcma_effective_anisotropy(100.0, p))
    assert k_huge >= -0.5 * k0 - 1e-3
    e = float(vcma_pulse_energy(1.0, 1e-9, p))
    assert e > 0
    prob_low = float(vcma_switching_probability(0.0, 1e-9, p))
    prob_high = float(vcma_switching_probability(2.0, 1e-9, p))
    assert prob_high >= prob_low


def test_vcma_leakage_current_fowler_nordheim():
    p = make_device_params("vcma_mram")
    t_diel = float(np.asarray(p.dielectric_thickness))
    # zero below the 1e-12 V gate
    assert float(vcma_leakage_current(0.0, p)) == 0.0
    # low field (< 1e8 V/m): pure ohmic V / R_leak
    v_low = 0.05 * 1e8 * t_diel
    i_low = float(vcma_leakage_current(v_low, p))
    assert np.isclose(i_low, v_low / float(np.asarray(p.leakage_resistance)))
    # high field (> 1e8 V/m): FN tunneling adds on top of ohmic
    v_high = 10.0 * 1e8 * t_diel
    i_high = float(vcma_leakage_current(v_high, p))
    ohmic_high = v_high / float(np.asarray(p.leakage_resistance))
    field = v_high / t_diel
    fn = 1e-6 * field * np.exp(-3.5e9 / field) * float(np.asarray(p.area))
    assert np.isclose(i_high, ohmic_high + fn, rtol=1e-6)
    assert i_high > ohmic_high
    # finite (no NaN/inf from the masked branch) and batched
    batch = vcma_leakage_current(jnp.asarray([0.0, v_low, v_high]), p)
    assert np.all(np.isfinite(np.asarray(batch)))


def test_vcma_switching_time_monotone():
    p = make_device_params("vcma_mram")
    assert float(vcma_switching_time(0.0, p)) == np.inf
    t_lo = float(vcma_switching_time(0.5, p))
    t_hi = float(vcma_switching_time(2.0, p))
    # higher voltage lowers the barrier => faster switching
    assert t_hi <= t_lo
    # barrier eliminated => picosecond-scale floor
    t_elim = float(vcma_switching_time(100.0, p))
    assert t_elim == pytest.approx(1e-12, rel=1e-5)  # barrier gone => ps floor


def test_skyrmion_analytics():
    p = make_device_params("skyrmion")
    lex = float(exchange_length(p))
    assert 1e-9 < lex < 1e-7
    angle = float(skyrmion_hall_angle(p))
    assert np.radians(5) <= angle <= np.radians(45)
    v = skyrmion_velocity(p, jnp.asarray([1e11, 0.0]))
    assert float(v[0]) > 0  # driven along +x
    assert float(v[1]) != 0  # Magnus deflection
    e = float(skyrmion_energy(p))
    assert np.isfinite(e)
    s_mid = float(skyrmion_stability(p, 100e-9))
    s_edge = float(skyrmion_stability(p, 1e-9))
    assert s_edge <= s_mid
    r = skyrmion_resistance(p, jnp.asarray([0, 1, 2]))
    np.testing.assert_allclose(np.asarray(r), [1e3, 1.1e3, 1.2e3])


def test_device_info_and_parameters():
    d = create_device("stt_mram", {"damping": 0.02})
    assert d.get_parameter("damping") == 0.02
    d.set_parameter("damping", 0.03)
    assert float(np.asarray(d.params.damping)) == pytest.approx(0.03)
    info = d.get_device_info()
    assert info["device_type"] == "stt_mram"
    # module-level factory instance exists (reference device_factory.py:265)
    assert device_factory.get_default_parameters("sot_mram")["spin_hall_angle"] == 0.2


def test_effective_field_device_api():
    d = create_device("stt_mram")
    h = d.compute_effective_field(np.array([0.0, 0.0, 1.0]), np.zeros(3))
    h_k = 2 * 1.2e6 / (MU0 * 800e3)
    # device-level field is anisotropy + thin-film demag along z
    np.testing.assert_allclose(float(np.asarray(h)[2]), h_k - 800e3, rtol=1e-5)
