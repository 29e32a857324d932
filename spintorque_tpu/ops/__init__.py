"""Hand-written TPU kernels (Pallas) for the hottest paths."""

from .pallas_integrator import integrate_pulse_pallas, pallas_supported

__all__ = ["integrate_pulse_pallas", "pallas_supported"]
