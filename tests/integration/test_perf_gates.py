"""Throughput gates mirroring the reference's integration performance tests
(tests/integration/test_environment.py:457-524: >10 steps/s single env,
>1 step/s 4x4 array). These run on the CPU test backend, where jit-call
overhead dominates - the gates are deliberately the reference's own numbers,
which we beat by orders of magnitude even on CPU."""

import time

import numpy as np
import pytest

from spintorque_tpu.envs import GymSpinTorqueArrayEnv, GymSpinTorqueEnv


def test_single_env_faster_than_reference_gate():
    env = GymSpinTorqueEnv(include_thermal_fluctuations=False,
                           max_duration=1e-9, dtype="float32")
    env.reset(seed=0)
    action = np.array([1e5, 1e-9], np.float32)
    env.step(action)  # compile
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        obs, r, te, tr, info = env.step(action)
        if te or tr:
            env.reset(seed=0)
    rate = n / (time.perf_counter() - t0)
    assert rate > 10, f"single-env rate {rate:.1f} steps/s under reference gate"


def test_array_env_faster_than_reference_gate():
    env = GymSpinTorqueArrayEnv(array_size=(4, 4), action_mode="global",
                                dtype="float32")
    env.reset(seed=0)
    action = np.array([0.0, 1e5], np.float32)
    env.step(action)  # compile
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        obs, r, te, tr, info = env.step(action)
        if te or tr:
            env.reset(seed=0)
    rate = n / (time.perf_counter() - t0)
    assert rate > 1, f"array-env rate {rate:.1f} steps/s under reference gate"


def test_env_reporting_surfaces():
    env = GymSpinTorqueEnv(include_thermal_fluctuations=False)
    env.reset(seed=0)
    health = env.get_health_report()
    assert health["status"] == "HEALTHY"
    solver = env.get_solver_info()
    assert solver["method"] == "rk4"
    stats = env.get_performance_stats()
    assert stats["devices"] >= 1
