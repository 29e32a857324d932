"""Named device-configuration variants for tests.

Mirrors the reference fixture library (tests/fixtures/device_configs.py:6-345):
named parameter sets spanning the regimes the test suite exercises, plus
accessors. Values are reference-canonical where the reference defines them.
"""

import numpy as np

STT_MRAM_CONFIGS = {
    "standard": {
        "volume": 50e-9 * 100e-9 * 2e-9,
        "area": 50e-9 * 100e-9,
        "thickness": 2e-9,
        "saturation_magnetization": 800e3,
        "damping": 0.01,
        "uniaxial_anisotropy": 1.2e6,
        "polarization": 0.7,
        "resistance_parallel": 1e3,
        "resistance_antiparallel": 2e3,
        "easy_axis": np.array([0.0, 0.0, 1.0]),
    },
    "low_damping": {
        "volume": 50e-9 * 100e-9 * 2e-9,
        "saturation_magnetization": 800e3,
        "damping": 0.002,
        "uniaxial_anisotropy": 1.2e6,
        "polarization": 0.7,
    },
    "high_thermal_stability": {
        "volume": 60e-9 * 120e-9 * 3e-9,
        "saturation_magnetization": 1e6,
        "damping": 0.01,
        "uniaxial_anisotropy": 2.5e6,
        "polarization": 0.7,
    },
    "small_volume": {
        "volume": 20e-9 * 20e-9 * 1e-9,
        "saturation_magnetization": 800e3,
        "damping": 0.01,
        "uniaxial_anisotropy": 1.2e6,
        "polarization": 0.7,
    },
}

SOT_MRAM_CONFIGS = {
    "standard": {
        "volume": 100e-9 * 100e-9 * 1e-9,
        "saturation_magnetization": 800e3,
        "damping": 0.015,
        "uniaxial_anisotropy": 0.8e6,
        "spin_hall_angle": 0.2,
        "easy_axis": np.array([0.0, 0.0, 1.0]),
    },
    "high_sha": {
        "volume": 100e-9 * 100e-9 * 1e-9,
        "saturation_magnetization": 800e3,
        "damping": 0.015,
        "uniaxial_anisotropy": 0.8e6,
        "spin_hall_angle": 0.4,
        "easy_axis": np.array([0.0, 0.0, 1.0]),
    },
}

TEST_SCENARIOS = {
    "easy_switching": {
        "device_type": "stt_mram",
        "device_params": STT_MRAM_CONFIGS["small_volume"],
        "initial_state": np.array([0.05, 0.05, -0.997]),
        "target_state": np.array([0.0, 0.0, -1.0]),
        "max_steps": 10,
    },
    "hard_switching": {
        "device_type": "stt_mram",
        "device_params": STT_MRAM_CONFIGS["high_thermal_stability"],
        "initial_state": np.array([0.05, 0.0, 0.999]),
        "target_state": np.array([0.0, 0.0, -1.0]),
        "max_steps": 100,
    },
}


def get_device_config(device_type: str, variant: str = "standard"):
    table = {"stt_mram": STT_MRAM_CONFIGS, "sot_mram": SOT_MRAM_CONFIGS}[device_type]
    return dict(table[variant])


def get_test_scenario(name: str):
    return dict(TEST_SCENARIOS[name])
