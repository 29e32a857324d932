"""Tests for the research tier: optimizers and benchmarking harness."""

import jax.numpy as jnp
import numpy as np

from spintorque_tpu.physics import LLGSParams
from spintorque_tpu.research import (
    bootstrap_ci,
    compare_policies,
    cross_entropy,
    grid_search,
    optimize_switching_pulse,
    significance_test,
    simulated_annealing,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.01, uniaxial_anisotropy=1.2e6,
    volume=1e-23, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
)


def quadratic(params):
    x, y = params["x"], params["y"]
    return (x - 0.3) ** 2 + (y + 0.7) ** 2


SPACE = {"x": (-2.0, 2.0), "y": (-2.0, 2.0)}


def test_grid_search_finds_minimum():
    res = grid_search(quadratic, SPACE, points_per_dim=41)
    assert abs(res.best_params["x"] - 0.3) < 0.06
    assert abs(res.best_params["y"] + 0.7) < 0.06
    assert res.n_evaluations == 41 * 41


def test_cross_entropy_converges():
    res = cross_entropy(quadratic, SPACE, population=256, elites=32, iterations=15)
    assert res.best_value < 1e-3
    assert res.history[-1] <= res.history[0]


def test_simulated_annealing_converges():
    res = simulated_annealing(quadratic, SPACE, chains=128, iterations=60)
    assert res.best_value < 1e-2


def test_optimize_switching_pulse_runs():
    res = optimize_switching_pulse(
        PARAMS, method="cross_entropy", population=64, elites=8, iterations=3,
        max_duration=2e-10,
    )
    assert np.isfinite(res.best_value)
    assert "current" in res.best_params and "duration" in res.best_params


def test_statistics():
    rng = np.random.default_rng(0)
    a = rng.normal(1.0, 0.1, 50)
    b = rng.normal(0.0, 0.1, 50)
    sig = significance_test(a, b)
    assert sig["p_value"] < 1e-6
    lo, hi = bootstrap_ci(a)
    assert lo < 1.0 < hi


def test_compare_policies():
    from spintorque_tpu.envs import SpinTorqueEnv, SpinTorqueEnvConfig
    from spintorque_tpu.parallel import random_policy

    env = SpinTorqueEnv(
        batch_size=8,
        config=SpinTorqueEnvConfig(include_thermal=False, max_duration=1e-10,
                                   dtype="float32"),
    )
    import jax
    import jax.numpy as jnp2

    def zero_policy(params, obs, key):
        B = obs.shape[0]
        return jnp2.zeros((B, 2), jnp2.float32)

    report = compare_policies(
        env, {"random": random_policy(env), "zero": zero_policy}, horizon=5
    )
    assert set(report["policies"]) == {"random", "zero"}
    assert "random_vs_zero" in report["significance"]
