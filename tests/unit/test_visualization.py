"""Smoke tests for visualization (Agg backend, no display)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from spintorque_tpu.physics import EnergyLandscape, LLGSParams
from spintorque_tpu.visualization import (
    SpintronicVisualizer,
    plot_energy_surface,
    plot_trajectory,
)


def test_plot_trajectory():
    t = np.linspace(0, 4 * np.pi, 50)
    traj = np.stack([np.sin(t) * 0.3, np.cos(t) * 0.3,
                     np.full_like(t, np.sqrt(1 - 0.09))], axis=-1)
    fig = plot_trajectory(traj)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_energy_surface_and_visualizer(tmp_path):
    import jax.numpy as jnp

    params = LLGSParams(800e3, 0.01, 1.2e6, 1e-23, 0.7,
                        jnp.array([0.0, 0.0, 1.0]))
    el = EnergyLandscape(params)
    surface = el.energy_surface(n_theta=24, n_phi=48)
    fig = plot_energy_surface(surface)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)

    viz = SpintronicVisualizer(output_dir=tmp_path)
    p1 = viz.energy_surface(surface)
    assert p1.exists()
    p2 = viz.training_curves({"reward": [0.1, 0.3, 0.5]})
    assert p2.exists()
    diagram = el.switching_phase_diagram((0.0, 5e6), n_fields=8, n_angles=8)
    p3 = viz.switching_phase_diagram(diagram)
    assert p3.exists()


def test_plot_switching_diagram():
    from spintorque_tpu.visualization import plot_switching_diagram

    fig = plot_switching_diagram(
        {
            "currents": np.linspace(-4e6, 0, 8),
            "durations": np.linspace(1e-10, 2e-9, 8),
            "p_switch": np.clip(np.random.rand(8, 8), 0, 1),
        }
    )
    assert fig.get_axes()[0].get_title() == "Switching probability"
