"""Synthetic trajectory / protocol generators for tests.

Mirrors the reference sample-data fixtures (tests/fixtures/sample_data.py:
8-330): switching trajectories, pulse protocols, and training histories.
"""

import numpy as np


def generate_switching_trajectory(n_steps=100, noise=0.0, seed=0):
    """Smooth +z -> -z switching path on the unit sphere."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0.0, np.pi, n_steps)
    phi = np.linspace(0.0, 4 * np.pi, n_steps)
    m = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)],
        axis=-1,
    )
    if noise:
        m = m + noise * rng.normal(size=m.shape)
        m = m / np.linalg.norm(m, axis=-1, keepdims=True)
    return m


def generate_pulse_protocol(n_pulses=5, max_current=2e6, max_duration=2e-9, seed=0):
    """Random (current, duration) pulse sequence."""
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            rng.uniform(-max_current, max_current, n_pulses),
            rng.uniform(1e-10, max_duration, n_pulses),
        ],
        axis=-1,
    )


def generate_training_history(n_updates=50, seed=0):
    """Plausible improving training metrics."""
    rng = np.random.default_rng(seed)
    progress = 1.0 - np.exp(-np.arange(n_updates) / 15.0)
    return {
        "mean_reward": progress * 10 + rng.normal(0, 0.5, n_updates),
        "success_rate": np.clip(progress * 0.8 + rng.normal(0, 0.05, n_updates), 0, 1),
    }
