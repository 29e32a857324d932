"""Optimize a switching pulse with the cross-entropy method.

Run: python examples/optimize_pulse.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp

from spintorque_tpu.physics import LLGSParams
from spintorque_tpu.research import optimize_switching_pulse

params = LLGSParams(
    saturation_magnetization=800e3, damping=0.01, uniaxial_anisotropy=1.2e6,
    volume=1e-23, polarization=0.7,
    easy_axis=jnp.array([0.0, 0.0, 1.0], jnp.float32),
)
result = optimize_switching_pulse(
    params, method="cross_entropy", population=512, elites=32, iterations=10
)
print(f"best pulse: J={result.best_params['current']:.3e} A/m^2, "
      f"dt={result.best_params['duration']:.3e} s "
      f"(objective {result.best_value:.4f}, {result.n_evaluations} evals)")
