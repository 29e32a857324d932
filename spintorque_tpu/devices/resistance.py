"""Per-device-type resistance, power and switching analytics.

Pure batched jnp functions replacing the reference device-class methods:
  * STT TMR resistance: stt_mram.py:78-94
  * SOT MTJ + heavy-metal series resistance: sot_mram.py:196-228
  * VCMA TMR resistance: vcma_mram.py:232-256
  * pulse energy accounting: spin_torque_env.py:473-480
  * switching thresholds / time estimates: sot_mram.py:263-289,397-435,
    vcma_mram.py:288-320,450-476
All broadcast over (B,)-batched magnetization components and scalar-or-(B,)
parameters. ``device_type`` is a static (trace-time) string.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import KB_SOLVER, MU0, GAMMA
from .params import DeviceParams


def _cos_theta_with_reference(mx, my, mz, params: DeviceParams):
    ref = jnp.asarray(params.reference_magnetization)
    rx, ry, rz = ref[..., 0], ref[..., 1], ref[..., 2]
    norm = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    rx, ry, rz = rx / norm, ry / norm, rz / norm
    return mx * rx + my * ry + mz * rz


def resistance(device_type: str, mx, my, mz, params: DeviceParams):
    """Device resistance (Ohm) from the magnetization state."""
    cos_theta = _cos_theta_with_reference(mx, my, mz, params)
    r_p = params.resistance_parallel
    r_ap = params.resistance_antiparallel
    if device_type == "stt_mram":
        # R = R_p (1 + TMR (1 - cos) / 2), floored at 0.5 R_p (stt_mram.py:78-94).
        tmr = (r_ap - r_p) / r_p
        r = r_p * (1.0 + tmr * (1.0 - cos_theta) / 2.0)
        return jnp.maximum(r, r_p * 0.5)
    if device_type == "sot_mram":
        # MTJ TMR + small series term from the heavy-metal sheet resistance
        # (sot_mram.py:196-228; the 1e-12 area scale is the reference's).
        r_mtj = r_p + (r_ap - r_p) * (1.0 - cos_theta) / 2.0
        r_hm = params.sot_sheet_resistance() / (params.area * 1e-12)
        return jnp.maximum(r_mtj + 0.1 * r_hm, 1.0)
    if device_type == "vcma_mram":
        r = r_p + (r_ap - r_p) * (1.0 - cos_theta) / 2.0
        return jnp.maximum(r, 1.0)
    if device_type in ("skyrmion", "skyrmion_track"):
        # Resistance vs skyrmion count is handled in the skyrmion env
        # (skyrmion_device.py:315-340); for a magnetization query fall back
        # to the TMR form.
        r = r_p + (r_ap - r_p) * (1.0 - cos_theta) / 2.0
        return jnp.maximum(r, 1.0)
    raise ValueError(f"Unknown device type: {device_type}")


def pulse_energy(current_density, duration, r, area):
    """Joule energy of a square pulse at pre-step resistance r.

    E = V^2 / R * dt with V = J R A  =>  E = J^2 A^2 R dt
    (spin_torque_env.py:473-480), gated on |J| > 1e-12. ``r`` must be the
    resistance at the *pre-step* magnetization, as in the reference.
    """
    voltage = current_density * r * area
    e = voltage**2 / r * duration
    return jnp.where(jnp.abs(current_density) > 1e-12, e, 0.0)


def vcma_effective_anisotropy(voltage, params: DeviceParams):
    """K_eff(V) = K0 - xi |V| / t^2, clamped at -0.5 K0 (vcma_mram.py:122-147)."""
    v = jnp.clip(voltage, -params.breakdown_voltage, params.breakdown_voltage)
    delta_k = -params.vcma_coefficient * jnp.abs(v) / (params.dielectric_thickness**2)
    k_eff = params.uniaxial_anisotropy + delta_k
    return jnp.maximum(k_eff, -0.5 * params.uniaxial_anisotropy)


def vcma_pulse_energy(voltage, duration, params: DeviceParams):
    """0.5 C V^2 capacitive + leakage energy (vcma_mram.py:258-286)."""
    cap = params.vcma_capacitance()
    e = 0.5 * cap * voltage**2 + voltage**2 * duration / params.leakage_resistance
    return jnp.where(jnp.abs(voltage) > 1e-12, e, 0.0)


def vcma_leakage_current(voltage, params: DeviceParams):
    """Dielectric leakage current: ohmic plus simplified Fowler-Nordheim
    tunneling above 1e8 V/m (vcma_mram.py:480-504).

    I = V / R_leak + [E > 1e8] * 1e-6 * E * exp(-3.5e9 / E) * A
    with E = |V| / t_dielectric. Branch-free: the tunneling term is masked
    with jnp.where and the exponent argument clamped so the inactive branch
    never produces inf/NaN under jit.
    """
    ohmic = voltage / params.leakage_resistance
    field = jnp.abs(voltage) / params.dielectric_thickness
    safe_field = jnp.maximum(field, 1.0)
    tunneling = 1e-6 * field * jnp.exp(-3.5e9 / safe_field) * params.area
    current = ohmic + jnp.where(field > 1e8, tunneling, 0.0)
    return jnp.where(jnp.abs(voltage) > 1e-12, current, 0.0)


def vcma_switching_time(voltage, params: DeviceParams, temperature=300.0):
    """Arrhenius switching-time estimate at voltage-modified barrier
    (vcma_mram.py:444-478): t = (1/f0) exp(E_b / kT) with f0 = 1 GHz;
    1 ps when the barrier is eliminated, inf below 1 uV drive."""
    k_eff = vcma_effective_anisotropy(voltage, params)
    barrier = k_eff * params.volume
    t = (1.0 / 1e9) * jnp.exp(barrier / (KB_SOLVER * temperature))
    t = jnp.where(barrier <= 0.0, 1e-12, t)
    return jnp.where(jnp.abs(voltage) < 1e-6, jnp.inf, t)


def vcma_switching_probability(voltage, duration, params: DeviceParams, temperature=300.0):
    """Arrhenius switching with voltage-lowered barrier (vcma_mram.py:187-234)."""
    k_eff = vcma_effective_anisotropy(voltage, params)
    barrier = k_eff * params.volume
    thermal = KB_SOLVER * temperature
    rate = 1e9 * jnp.exp(-barrier / thermal)
    prob = 1.0 - jnp.exp(-rate * duration)
    prob = jnp.where(barrier <= 0, 1.0, jnp.minimum(prob, 1.0))
    return jnp.where(thermal <= 0, jnp.where(barrier <= 0, 1.0, 0.0), prob)


def sot_torque_factors(params: DeviceParams):
    """(tau_DL, tau_FL) efficiency factors (sot_mram.py:61-76)."""
    return params.sot_tau_dl_factor(), params.sot_tau_fl_factor()


def sot_spin_torques(current_density, mx, my, mz, params: DeviceParams,
                     current_direction=(1.0, 0.0, 0.0)):
    """SOT damping-like and field-like torques with sigma = z x j
    (sot_mram.py:163-194). Returns ((dlx,dly,dlz), (flx,fly,flz))."""
    jx, jy, jz = current_direction
    norm = jnp.sqrt(jx * jx + jy * jy + jz * jz)
    jx, jy, jz = jx / norm, jy / norm, jz / norm
    # sigma = z_hat x j_hat
    sx, sy, sz = -jy, jx, jnp.zeros_like(jx + mx * 0.0)
    tau_dl = params.sot_tau_dl_factor() * current_density
    tau_fl = params.sot_tau_fl_factor() * current_density
    # DL: tau_dl * (sigma x m)
    dlx = tau_dl * (sy * mz - sz * my)
    dly = tau_dl * (sz * mx - sx * mz)
    dlz = tau_dl * (sx * my - sy * mx)
    return (dlx, dly, dlz), (tau_fl * sx, tau_fl * sy, tau_fl * sz)


def sot_switching_threshold(params: DeviceParams):
    """Critical current density j_c for SOT switching (sot_mram.py:263-289)."""
    h_k = 2.0 * params.uniaxial_anisotropy / (MU0 * params.saturation_magnetization)
    return (
        5e6
        * (1.0 + params.damping)
        * (1.0 + h_k / 1e6)
        / (1.0 + params.sot_tau_dl_factor())
    )


def sot_switching_time(current_density, params: DeviceParams, temperature=300.0):
    """Thermally-activated vs deterministic switching-time estimate
    (sot_mram.py:397-435)."""
    j_c = sot_switching_threshold(params)
    j = jnp.abs(current_density)
    barrier = params.uniaxial_anisotropy * params.volume
    assist = j / j_c
    thermal_time = (1.0 / 1e9) * jnp.exp(
        barrier / (KB_SOLVER * temperature) * (1.0 - assist)
    )
    det_time = (jnp.pi * params.damping) / (
        GAMMA * params.sot_tau_dl_factor() * jnp.maximum(j, 1e-30)
    )
    t = jnp.where(j < j_c, thermal_time, det_time)
    return jnp.where(j < 1e-6, jnp.inf, t)


def energy_barrier(device_type: str, mx, my, mz, params: DeviceParams, voltage=0.0):
    """Uniaxial switching barrier (sot_mram.py:411-430 / vcma_mram.py:418-446)."""
    e = jnp.asarray(params.easy_axis)
    ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
    cos_theta = jnp.abs(mx * ex + my * ey + mz * ez)
    if device_type == "vcma_mram":
        k_eff = vcma_effective_anisotropy(voltage, params)
        return jnp.maximum(jnp.abs(k_eff) * params.volume, 0.0)
    return params.uniaxial_anisotropy * params.volume * (1.0 - cos_theta**2)
