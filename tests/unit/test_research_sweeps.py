"""Mesh-sharded research sweeps (ROADMAP round-4 item).

Physics sanity on the switching diagram (the sign convention follows the
solver: negative J stabilizes/switches toward +z), per-env parameter
ladders through the integrator's (B,) field support, and shard-equality on
the fake 8-device mesh (threefry is partitionable, so sharded and
unsharded runs produce the SAME stream and bitwise-equal probabilities).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spintorque_tpu.parallel import make_mesh
from spintorque_tpu.physics import LLGSParams
from spintorque_tpu.research.sweeps import (
    parameter_ladder_sweep,
    switching_probability_diagram,
)

PARAMS = LLGSParams(
    saturation_magnetization=800e3, damping=0.05, uniaxial_anisotropy=1.2e6,
    volume=1e-22, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
).astype(jnp.float32)


def test_switching_diagram_physics():
    out = switching_probability_diagram(
        PARAMS, currents=[-2e7, 0.0, 2e7], durations=[2e-10, 1e-9],
        n_ensemble=16, temperature=300.0, max_substeps=1024,
        key=jax.random.PRNGKey(1), use_pallas=False,
    )
    p = np.asarray(out["p_switch"])
    assert p.shape == (3, 2)
    assert np.all((p >= 0) & (p <= 1))
    # Strong negative J switches -z -> +z; zero and anti-switching J do not
    # (Delta ~ 19 at this volume, so spontaneous flips are negligible).
    assert np.all(p[0] > 0.9), p
    assert np.all(p[1] < 0.1), p
    assert np.all(p[2] < 0.1), p
    assert np.all(np.isfinite(np.asarray(out["final_mz"])))


def test_switching_diagram_sharded_matches_unsharded():
    if jax.device_count() < 8:
        pytest.skip("needs 8 fake devices")
    kw = dict(
        currents=[-2e7, 0.0], durations=[2e-10, 5e-10], n_ensemble=16,
        temperature=300.0, max_substeps=1024, key=jax.random.PRNGKey(3),
        use_pallas=False,
    )
    ref = switching_probability_diagram(PARAMS, **kw)
    mesh = make_mesh()
    out = switching_probability_diagram(PARAMS, mesh=mesh, **kw)
    np.testing.assert_array_equal(
        np.asarray(ref["p_switch"]), np.asarray(out["p_switch"])
    )


def test_parameter_ladder_barrier_dependence():
    """Zero-drive thermal retention along a K_u ladder: spontaneous flip
    probability over 4 ns must fall monotonically with the effective
    barrier Delta = (K_u - mu0 Ms^2/2) V / kT - the Neel-Brown physics the
    per-env (B,) parameter support must reproduce (a broadcast bug would
    flatten the ladder; calibration probe: p = [0.42, 0.31, 0.016, 0.0]
    at Delta = [1, 3, 8, 20])."""
    from spintorque_tpu.constants import KB_SOLVER, MU0

    ms, vol, temp = 800e3, 1e-24, 300.0
    kt = KB_SOLVER * temp
    k_demag = 0.5 * MU0 * ms**2
    deltas = np.array([1.0, 3.0, 8.0, 20.0])
    k_ladder = jnp.asarray(k_demag + deltas * kt / vol, jnp.float32)
    base = PARAMS.replace(damping=0.5, volume=vol)
    out = parameter_ladder_sweep(
        base, {"uniaxial_anisotropy": k_ladder},
        current=0.0, duration=4e-9, n_ensemble=64,
        temperature=temp, key=jax.random.PRNGKey(5), method="heun",
    )
    p = np.asarray(out["p_switch"])
    assert p.shape == (4,)
    assert p[0] > 0.25, p          # Delta=1: near-equilibrated 50/50 well
    assert p[1] > p[2] + 0.1, p    # Delta 3 vs 8: order of magnitude apart
    assert p[3] < 0.02, p          # Delta=20: retained
    np.testing.assert_array_equal(
        np.asarray(out["uniaxial_anisotropy"]), np.asarray(k_ladder)
    )


def test_parameter_ladder_validates_lengths():
    with pytest.raises(ValueError, match="ladder"):
        parameter_ladder_sweep(
            PARAMS,
            {"damping": jnp.asarray([0.01, 0.02]),
             "volume": jnp.asarray([1e-22])},
            current=-1e7, duration=2e-10, n_ensemble=4,
        )


def test_sweeps_report_failed_fraction():
    """Failed trajectories are excluded from the switching denominator and
    surfaced via failed_fraction (review finding: counting them as
    'not switched' reports a confident p=0 for a fully-failed point)."""
    out = switching_probability_diagram(
        PARAMS, currents=[-2e7], durations=[2e-10], n_ensemble=8,
        temperature=300.0, max_substeps=512, key=jax.random.PRNGKey(1),
        use_pallas=False,
    )
    assert out["failed_fraction"].shape == (1, 1)
    assert float(out["failed_fraction"][0, 0]) == 0.0
    lad = parameter_ladder_sweep(
        PARAMS, {"damping": jnp.asarray([0.05, 0.1])},
        current=-2e7, duration=2e-10, n_ensemble=8, temperature=300.0,
        key=jax.random.PRNGKey(2),
    )
    assert lad["failed_fraction"].shape == (2,)

    with pytest.raises(ValueError, match="at least"):
        parameter_ladder_sweep(PARAMS, {}, current=-1e7, duration=2e-10)
