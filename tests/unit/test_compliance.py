"""Tests for the multi-region deployment / compliance framework
(counterpart of reference global_deployment.py:64-801)."""

import pytest

from spintorque_tpu.deployment import (
    ComplianceFramework,
    GlobalDeploymentManager,
    RegionConfig,
    production_readiness,
    validate_region_config,
)


def test_processing_ledger_and_targeted_erasure():
    fw = ComplianceFramework(standards=("gdpr",))
    a = fw.record_processing("alice", ["trajectories"], "training")
    fw.record_processing("alice", ["metrics"], "monitoring")
    b = fw.record_processing("bob", ["trajectories"], "training")
    # erasure hits only the requesting subject's records (fixes the
    # reference's delete-everything bug at global_deployment.py:158-164)
    out = fw.request_erasure("alice", "gdpr")
    assert out["success"] and out["records_erased"] == 2
    assert fw.records[b].erased_at is None
    assert fw.records[a].erased_at is not None
    # idempotent: nothing left to erase
    assert fw.request_erasure("alice", "gdpr")["records_erased"] == 0


def test_erasure_right_gated_by_standard():
    fw = ComplianceFramework(standards=("pdpa",))
    fw.record_processing("carol", ["trajectories"], "training")
    out = fw.request_erasure("carol", "pdpa")
    assert not out["success"]


def test_retention_and_consent_policy_enforced():
    fw = ComplianceFramework(standards=("gdpr", "ccpa"))
    with pytest.raises(ValueError):
        fw.record_processing("d", ["x"], "p", retention_days=3000)
    with pytest.raises(ValueError):  # GDPR requires consent
        fw.record_processing("d", ["x"], "p", consent=False)
    # CCPA alone is opt-out: no consent needed
    fw2 = ComplianceFramework(standards=("ccpa",))
    fw2.record_processing("d", ["x"], "p", consent=False)
    rep = fw2.report()
    assert rep["records"] == 1 and rep["consent_rate"] == 0.0
    assert "improve consent collection" in rep["recommendations"]


def test_region_validation_rules():
    # EU without GDPR/residency fails
    eu_bad = RegionConfig(region="europe-west4", standards=["ccpa"])
    v = validate_region_config(eu_bad)
    assert not v["valid"] and len(v["problems"]) == 2
    # EU properly configured passes
    eu_ok = RegionConfig(region="europe-west4", standards=["gdpr"],
                         data_residency=True)
    assert validate_region_config(eu_ok)["valid"]
    # US without CCPA only warns (opt-out standard)
    us = RegionConfig(region="us-central1", standards=[])
    v = validate_region_config(us)
    assert v["valid"] and v["warnings"]
    assert not validate_region_config(
        RegionConfig(region="nowhere-1"))["valid"]


def test_global_deployment_manager_failover_weights():
    mgr = GlobalDeploymentManager()
    us = RegionConfig(region="us-central1", standards=["ccpa"])
    eu = RegionConfig(region="europe-west4", standards=["gdpr"],
                      data_residency=True)
    assert mgr.deploy(us)["success"]
    assert mgr.deploy(eu)["success"]
    assert mgr.deploy(us, dry_run=True)["dry_run"]
    w = mgr.load_balance_weights()
    assert w == {"us-central1": 0.5, "europe-west4": 0.5}
    # unhealthy region drops to zero weight; traffic fails over
    mgr.set_health("europe-west4", "degraded")
    w = mgr.load_balance_weights()
    assert w["europe-west4"] == 0.0 and w["us-central1"] == 1.0
    st = mgr.status()
    assert st["active"] == 2 and st["healthy"] == 1
    assert mgr.undeploy("europe-west4") and not mgr.undeploy("europe-west4")


def test_deploy_rejects_noncompliant_config():
    mgr = GlobalDeploymentManager()
    out = mgr.deploy(RegionConfig(region="europe-west4", standards=[]))
    assert not out["success"] and out["problems"]
    assert "europe-west4" not in mgr.regions


def test_production_readiness_runs_real_checks():
    rep = production_readiness(run_device_checks=False)
    assert set(rep["checks"]) >= {"package_import", "performance_evidence",
                                  "compliance_validation"}
    assert rep["checks"]["package_import"]["passed"]
    assert rep["checks"]["compliance_validation"]["passed"]
    assert 0.0 <= rep["score"] <= 100.0
