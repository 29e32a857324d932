"""Tests for security utils and env wrappers."""

import numpy as np
import pytest

from spintorque_tpu.utils.security import (
    InputSanitizer,
    RateLimiter,
    SecureHasher,
    SecurityError,
)


def test_sanitize_string():
    assert InputSanitizer.sanitize_string("hello") == "hello"
    assert InputSanitizer.sanitize_string("a\x00b") == "ab"
    with pytest.raises(SecurityError):
        InputSanitizer.sanitize_string("x" * 10000)
    with pytest.raises(SecurityError):
        InputSanitizer.sanitize_string(123)


def test_sanitize_key_and_number():
    assert InputSanitizer.sanitize_key("max_current") == "max_current"
    with pytest.raises(SecurityError):
        InputSanitizer.sanitize_key("rm -rf /")
    assert InputSanitizer.sanitize_number("2e6") == 2e6
    with pytest.raises(SecurityError):
        InputSanitizer.sanitize_number(float("nan"))


def test_sanitize_dict_nested():
    out = InputSanitizer.sanitize_dict({"a": {"b": 1.5}, "c": "ok"})
    assert out == {"a": {"b": 1.5}, "c": "ok"}
    deep = {"k": {}}
    d = deep["k"]
    for _ in range(10):
        d["k"] = {}
        d = d["k"]
    with pytest.raises(SecurityError):
        InputSanitizer.sanitize_dict(deep)


def test_rate_limiter():
    rl = RateLimiter(rate_per_s=1000.0, burst=2)
    assert rl.allow() and rl.allow()
    assert not rl.allow()


def test_secure_hasher_roundtrip():
    h1 = SecureHasher.hash_dict({"a": 1, "b": 2})
    h2 = SecureHasher.hash_dict({"b": 2, "a": 1})
    assert h1 == h2
    sig = SecureHasher.hmac_sign(b"data", b"key")
    assert SecureHasher.verify(b"data", b"key", sig)
    assert not SecureHasher.verify(b"data2", b"key", sig)


def test_robust_wrapper_fallback():
    # Construct our adapter directly: parity tests re-register the reference
    # package's env ids over ours within the same pytest process, so
    # gym.make would return the reference env here.
    from spintorque_tpu.envs import GymSpinTorqueEnv, RobustEnvironmentWrapper

    env = GymSpinTorqueEnv(include_thermal_fluctuations=False,
                           max_duration=1e-10)
    wrapped = RobustEnvironmentWrapper(env)
    obs, info = wrapped.reset(seed=0)
    assert np.isfinite(obs).all()
    obs, r, te, tr, info = wrapped.step(np.array([1e5, 1e-10], np.float32))
    assert np.isfinite(obs).all()
    # A malformed action triggers the fallback path, not an exception.
    obs, r, te, tr, info = wrapped.step("not-an-action")
    assert tr and r == -1.0 and "error" in info
    assert wrapped.get_stats()["fallbacks_used"] == 1


def test_episode_statistics_wrapper():
    from spintorque_tpu.envs import EpisodeStatisticsWrapper, GymSpinTorqueEnv

    env = EpisodeStatisticsWrapper(
        GymSpinTorqueEnv(include_thermal_fluctuations=False,
                         max_steps=3, max_duration=1e-10)
    )
    env.reset(seed=0)
    done = False
    while not done:
        obs, r, te, tr, info = env.step(np.array([0.0, 1e-10], np.float32))
        done = te or tr
    assert "episode" in info and info["episode"]["l"] >= 1
