"""Tests for utils (monitoring/validation/checkpoint) and config/CLI."""

import json
import os

import numpy as np
import pytest

from spintorque_tpu.config import ConfigManager, reset_config
from spintorque_tpu.utils import (
    EnvironmentMonitor,
    PerformanceProfiler,
    SafetyWrapper,
    ValidationError,
    default_health_monitor,
    load_pytree,
    safe_division,
    safe_normalize,
    save_pytree,
    validate_magnetization,
)


def test_safety_wrapper_clamps():
    s = SafetyWrapper()
    a = s.validate_action(np.array([1e9, 2e-6], np.float32))
    assert a[0] == 1e8 and a[1] == 1e-6
    bad = s.validate_action(np.array([np.nan, 1e-9], np.float32))
    np.testing.assert_allclose(bad, [0.0, 1e-12])
    wrong = s.validate_action(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(wrong, [0.0, 1e-12])
    obs = s.validate_observation(np.array([np.inf, 1.0]))
    assert obs[0] == 1e6
    assert s.validate_reward(np.nan) == -1.0


def test_monitor_health_report():
    m = EnvironmentMonitor()
    m.start_episode()
    m.start_step()
    m.end_step(np.array([1.0, 2.0]), {"is_success": np.array([0.0, 1.0])})
    m.end_episode(3.0, True)
    rep = m.get_health_report()
    assert rep["status"] == "HEALTHY"
    for _ in range(12):
        m.log_error(RuntimeError("x"), "test")
    assert m.get_health_report()["status"] == "CRITICAL"


def test_health_monitor_runs():
    rep = default_health_monitor().run()
    assert rep["status"] == "HEALTHY"
    assert rep["checks"]["backend"]["ok"]


def test_validation():
    v = validate_magnetization([3.0, 0.0, 4.0])
    np.testing.assert_allclose(v, [0.6, 0.0, 0.8])
    with pytest.raises(ValidationError):
        validate_magnetization([0.0, 0.0, 0.0])
    with pytest.raises(ValidationError):
        validate_magnetization([np.nan, 0, 1])


def test_safe_math():
    assert safe_division(1.0, 0.0) == 0.0
    np.testing.assert_allclose(safe_normalize([0.0, 0.0, 0.0]), [0, 0, 1])


def test_profiler():
    p = PerformanceProfiler()
    with p.time_operation("op"):
        pass
    p.increment_counter("calls")
    stats = p.get_stats()
    assert stats["timers"]["op"]["count"] == 1
    assert stats["counters"]["calls"] == 1


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(5.0), "b": {"c": np.ones((2, 3))}}
    save_pytree(tmp_path / "ckpt", tree)
    out = load_pytree(tmp_path / "ckpt")
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])


def test_config_precedence(tmp_path, monkeypatch):
    reset_config()
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({"environment": {"max_steps": 55}}))
    monkeypatch.setenv("SPIN_TORQUE_MAX_STEPS", "77")
    monkeypatch.setenv("SPIN_TORQUE_DEVICE_TYPE", "sot_mram")
    m = ConfigManager(str(cfg_file))
    assert m.config.environment.max_steps == 77  # env beats file
    assert m.config.device.device_type == "sot_mram"
    monkeypatch.delenv("SPIN_TORQUE_MAX_STEPS")
    m2 = ConfigManager(str(cfg_file))
    assert m2.config.environment.max_steps == 55  # file beats default


def test_config_validation():
    with pytest.raises(ValueError):
        c = ConfigManager()
        c.config.environment.max_steps = -1
        c.validate()


def test_config_make_env():
    m = ConfigManager()
    m.config.environment.batch_size = 4
    m.config.physics.include_thermal = False
    env = m.make_env()
    assert env.batch_size == 4
    assert env.config.include_thermal is False


def test_cli_info_and_config(capsys):
    from spintorque_tpu.cli import main

    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "SpinTorque-v0" in out and "stt_mram" in out
    assert main(["config", "show"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["environment"]["max_steps"] == 100


def test_cli_eval_random(capsys):
    from spintorque_tpu.cli import main

    os.environ["SPIN_TORQUE_BATCH_SIZE"] = "8"
    os.environ["SPIN_TORQUE_INCLUDE_THERMAL"] = "false"
    os.environ["SPIN_TORQUE_MAX_DURATION"] = "1e-10"
    try:
        assert main(["eval", "--episodes-steps", "4"]) == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["steps"] == 8 * 4
    finally:
        for k in ("SPIN_TORQUE_BATCH_SIZE", "SPIN_TORQUE_INCLUDE_THERMAL",
                  "SPIN_TORQUE_MAX_DURATION"):
            os.environ.pop(k, None)
