"""Physical constants shared across the framework.

Values match the reference implementation so that fixed-seed parity tests
agree bit-for-bit (reference: spin_torque_gym/physics/simple_solver.py:59-60,
spin_torque_gym/devices/base_device.py:30-33).

Note the reference is internally inconsistent: the solver hot path uses the
truncated Boltzmann constant 1.38e-23 (simple_solver.py:381) while the device
layer uses the CODATA value 1.380649e-23 (base_device.py:31). We preserve both,
named explicitly, and use each in the same places the reference does.
"""

import numpy as np

# Gyromagnetic ratio used by the reference LLGS solvers (m / (A * s)).
GAMMA = 2.21e5

# Permeability of free space (H/m).
MU0 = 4.0 * np.pi * 1e-7

# Boltzmann constant - CODATA value (J/K). Used by device analytics.
KB = 1.380649e-23

# Boltzmann constant - truncated value used inside the reference solver hot
# path (simple_solver.py:381) and several device modules (1.38e-23).
KB_SOLVER = 1.38e-23

# Elementary charge (C).
E_CHARGE = 1.602176634e-19

# Reduced Planck constant (J*s).
HBAR = 1.054571817e-34

# Vacuum permittivity (F/m) - used by the VCMA capacitance model
# (vcma_mram.py:66).
EPSILON0 = 8.854e-12
