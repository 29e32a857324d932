"""Tests for deployment tooling."""

import json

from spintorque_tpu.deployment import (
    ComplianceLog,
    DeploymentManager,
    DeploymentSpec,
    serving_health,
)


def test_deployment_spec_launch_commands():
    spec = DeploymentSpec(name="prod", num_hosts=4, chips_per_host=4,
                          batch_size=4096)
    cmds = spec.launch_commands("10.0.0.1")
    assert len(cmds) == 4
    assert "JAX_PROCESS_ID=0" in cmds[0] and "JAX_PROCESS_ID=3" in cmds[3]
    assert "JAX_NUM_PROCESSES=4" in cmds[0]
    json.loads(spec.to_json())


def test_compliance_log(tmp_path):
    log = ComplianceLog(path=tmp_path / "audit.jsonl")
    log.record("tester", "model_update", "v2")
    log.record("tester", "model_update", "v3")
    log.record("tester", "config_change", "lr")
    rep = log.report()
    assert rep["total"] == 3 and rep["by_action"]["model_update"] == 2
    lines = (tmp_path / "audit.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3 and json.loads(lines[0])["action"] == "model_update"


def test_deployment_manager_validation():
    mgr = DeploymentManager()
    good = DeploymentSpec(name="ok", num_hosts=2, chips_per_host=4,
                          batch_size=4096)
    bad = DeploymentSpec(name="bad", num_hosts=3, chips_per_host=4,
                         batch_size=4096)  # 4096 % 12 != 0
    mgr.register(good)
    assert mgr.validate_environment(good)["ok"]
    assert not mgr.validate_environment(bad)["ok"]
    assert "ok" in mgr.status()["deployments"]


def test_serving_health():
    h = serving_health()
    assert h["status"] == "HEALTHY"
    assert h["devices"] >= 1
