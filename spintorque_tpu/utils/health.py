"""Structured health checks: physics, device, environment, system.

Counterpart of the reference's utils/health.py (517 LoC: HealthCheck ABC +
Physics/Device/Environment/System checks + aggregator + global accessor
:16-517). Checks here exercise the REAL subsystems (a tiny integrator run, a
device construction, a 1-step env rollout, backend/memory probes) and feed
the existing ``utils.monitoring.HealthMonitor`` aggregator, so the reference
API (``get_health_monitor().run()``) works verbatim.
"""

from __future__ import annotations

import threading
import time
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .monitoring import HealthMonitor

__all__ = [
    "HealthCheck",
    "PhysicsHealthCheck",
    "DeviceHealthCheck",
    "EnvironmentHealthCheck",
    "SystemHealthCheck",
    "build_full_health_monitor",
    "get_health_monitor",
]


class HealthCheck(ABC):
    """One named check; __call__ returns (ok, detail) for the aggregator."""

    name = "health_check"

    @abstractmethod
    def check(self) -> Tuple[bool, str]:
        ...

    def __call__(self) -> Tuple[bool, str]:
        t0 = time.perf_counter()
        ok, detail = self.check()
        return ok, f"{detail} ({(time.perf_counter() - t0) * 1e3:.0f} ms)"


class PhysicsHealthCheck(HealthCheck):
    """Tiny integrator run: finite, unit-norm output."""

    name = "physics"

    def check(self) -> Tuple[bool, str]:
        import jax.numpy as jnp

        from ..physics.integrator import IntegratorConfig, integrate_pulse
        from ..physics.solver import params_from_dict

        params = params_from_dict(dict(volume=1e-24))
        res = integrate_pulse(
            (jnp.asarray([0.1]), jnp.asarray([0.0]), jnp.asarray([0.995])),
            jnp.asarray([1e-11]), jnp.asarray([0.0]), params,
            IntegratorConfig(method="rk4", max_substeps=32),
        )
        m = np.asarray(jnp.stack(res.m)).ravel()
        norm = float(np.linalg.norm(m))
        ok = bool(np.isfinite(m).all() and abs(norm - 1.0) < 1e-4)
        return ok, f"|m|={norm:.6f}"


class DeviceHealthCheck(HealthCheck):
    """Device factory + resistance sanity for every registered type."""

    name = "devices"

    def check(self) -> Tuple[bool, str]:
        from ..devices import device_factory

        problems = []
        for dev_type in device_factory.get_available_devices():
            try:
                dev = device_factory.create_default_device(dev_type)
                r = float(
                    np.asarray(dev.compute_resistance(np.array([0.0, 0.0, 1.0])))
                )
                if not (np.isfinite(r) and r > 0):
                    problems.append(f"{dev_type}: R={r}")
            except Exception as exc:  # noqa: BLE001
                problems.append(f"{dev_type}: {exc!r}")
        return (not problems), (", ".join(problems) or "all device types OK")


class EnvironmentHealthCheck(HealthCheck):
    """1-step vectorized env rollout: finite obs/reward."""

    name = "environment"

    def __init__(self, batch_size: int = 4):
        self.batch_size = batch_size

    def check(self) -> Tuple[bool, str]:
        import jax
        import jax.numpy as jnp

        from ..envs import SpinTorqueEnv, SpinTorqueEnvConfig

        env = SpinTorqueEnv(
            batch_size=self.batch_size,
            config=SpinTorqueEnvConfig(max_duration=1e-11, max_substeps=32),
        )
        state, obs = env.reset(jax.random.PRNGKey(0))
        action = jnp.tile(jnp.asarray([1e5, 5e-12]), (self.batch_size, 1))
        state, ts = env.step(state, action)
        obs_ok = bool(np.isfinite(np.asarray(ts.obs)).all())
        rew_ok = bool(np.isfinite(np.asarray(ts.reward)).all())
        return obs_ok and rew_ok, f"obs finite={obs_ok}, reward finite={rew_ok}"


class SystemHealthCheck(HealthCheck):
    """Backend present + host memory headroom."""

    name = "system"

    def __init__(self, min_free_fraction: float = 0.05):
        self.min_free_fraction = min_free_fraction

    def check(self) -> Tuple[bool, str]:
        import jax

        n = jax.device_count()
        backend = jax.default_backend()
        detail = f"{backend} x{n}"
        try:
            info: Dict[str, int] = {}
            with open("/proc/meminfo") as fh:
                for line in fh:
                    name, _, rest = line.partition(":")
                    fields = rest.split()
                    if fields:
                        info[name.strip()] = int(fields[0])
            free = info.get("MemAvailable", 0) / max(info.get("MemTotal", 1), 1)
            detail += f", mem free {free:.0%}"
            mem_ok = free > self.min_free_fraction
        except (OSError, ValueError):
            mem_ok = True  # non-Linux host: skip the memory probe
        return (n > 0 and mem_ok), detail


def build_full_health_monitor() -> HealthMonitor:
    """HealthMonitor preloaded with the physics/device/env/system checks."""
    hm = HealthMonitor()
    for check in (
        PhysicsHealthCheck(),
        DeviceHealthCheck(),
        EnvironmentHealthCheck(),
        SystemHealthCheck(),
    ):
        hm.register(check.name, check)
    return hm


_monitor: Optional[HealthMonitor] = None
_monitor_lock = threading.Lock()


def get_health_monitor() -> HealthMonitor:
    """Process-global full monitor (reference utils/health.py global)."""
    global _monitor
    with _monitor_lock:
        if _monitor is None:
            _monitor = build_full_health_monitor()
        return _monitor
