"""Tests for the material database and thermal fluctuation analytics."""

import numpy as np
import pytest

from spintorque_tpu.physics import MaterialDatabase, ThermalFluctuations
from spintorque_tpu.physics.materials import MaterialProperties


def test_database_contents():
    db = MaterialDatabase()
    mats = db.list_materials()
    assert {"CoFeB", "Fe", "Co", "Ni", "Pt", "Ta", "W"} <= set(mats)
    cofeb = db.get_material("CoFeB")
    assert cofeb.saturation_magnetization == 800e3
    assert cofeb.spin_polarization == 0.7
    with pytest.raises(KeyError):
        db.get_material("Unobtainium")


def test_temperature_adjustment():
    db = MaterialDatabase()
    hot = db.get_temperature_adjusted("CoFeB", 400.0)
    cold = db.get_temperature_adjusted("CoFeB", 300.0)
    assert hot.saturation_magnetization < cold.saturation_magnetization
    assert hot.uniaxial_anisotropy < cold.uniaxial_anisotropy


def test_bilayer_and_json_roundtrip(tmp_path):
    db = MaterialDatabase()
    bi = db.create_bilayer("CoFeB", "Co", 1e-9, 1e-9)
    a, b = db.get_material("CoFeB"), db.get_material("Co")
    np.testing.assert_allclose(
        bi.saturation_magnetization,
        (a.saturation_magnetization + b.saturation_magnetization) / 2,
    )
    path = tmp_path / "mats.json"
    db.export_json(path)
    db2 = MaterialDatabase(custom_materials={})
    db2.import_json(path)
    assert db2.get_material("CoFeB").gilbert_damping == a.gilbert_damping


def test_custom_material_and_recommendations():
    custom = MaterialProperties(
        name="TestAlloy", saturation_magnetization=1e6, exchange_constant=1e-11,
        gilbert_damping=0.02, uniaxial_anisotropy=5e5, g_factor=2.0,
        curie_temperature=700, density=8000, resistivity=1e-7,
        spin_polarization=0.5,
    )
    db = MaterialDatabase(custom_materials={"TestAlloy": custom})
    assert db.get_material("TestAlloy").spin_polarization == 0.5
    rec = db.recommend_materials("sot_mram")
    assert rec.get("heavy_metal") == "Pt"


def test_thermal_noise_strength_scaling():
    t = ThermalFluctuations(temperature=300.0)
    s300 = float(t.compute_noise_strength(0.01, 800e3, 1e-24))
    t.set_temperature(600.0)
    s600 = float(t.compute_noise_strength(0.01, 800e3, 1e-24))
    np.testing.assert_allclose(s600 / s300, np.sqrt(2.0), rtol=1e-6)
    t.set_temperature(0.0)
    assert float(t.compute_noise_strength(0.01, 800e3, 1e-24)) == 0.0


def test_neel_brown_statistics():
    t = ThermalFluctuations(temperature=300.0)
    delta = float(t.compute_thermal_barrier(1.2e6, 1e-23))
    barrier = 1.2e6 * 1e-23
    # High barrier -> negligible switching over 1 ns, long retention.
    p = float(t.compute_switching_probability(barrier, measurement_time=1e-9))
    assert p < 1e-10
    ret = float(t.compute_retention_time(barrier))
    assert ret > 1e6
    report = t.analyze_thermal_stability({"volume": 1e-23,
                                          "uniaxial_anisotropy": 1.2e6})
    assert report["is_thermally_stable"]
    np.testing.assert_allclose(report["thermal_stability_factor"], delta)


def test_temperature_sweep_vectorized():
    t = ThermalFluctuations(temperature=300.0)
    sweep = t.generate_temperature_sweep(
        (100.0, 500.0), {"volume": 1e-24, "uniaxial_anisotropy": 8e5,
                         "damping": 0.01, "saturation_magnetization": 800e3},
        n_points=16,
    )
    assert sweep["temperature"].shape == (16,)
    delta = np.asarray(sweep["thermal_stability_factor"])
    assert (np.diff(delta) < 0).all()  # stability falls with temperature
    noise = np.asarray(sweep["noise_strength"])
    assert (np.diff(noise) > 0).all()  # noise grows with temperature


def test_correlated_noise_generation():
    t = ThermalFluctuations(temperature=300.0, correlation_time=1e-12, seed=3)
    f1 = np.asarray(t.generate_thermal_field(0.01, 800e3, 1e-24, dt=1e-13))
    f2 = np.asarray(t.generate_thermal_field(0.01, 800e3, 1e-24, dt=1e-13))
    assert f1.shape == (3,) and np.isfinite(f1).all()
    assert not np.allclose(f1, f2)
    sample = float(t.sample_switching_time(1.38e-23 * 300 * 5))
    assert sample > 0
