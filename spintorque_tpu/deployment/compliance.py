"""Multi-region deployment and data-compliance framework.

Counterpart of spin_torque_gym/deployment/global_deployment.py:64-801
(ComplianceFramework, GlobalDeploymentManager, ProductionReadinessChecker),
re-designed for the TPU deployment model: a "region" maps to a cloud TPU
region hosting one or more pod slices, a deployment is an SPMD launch spec
(see manager.DeploymentSpec), and readiness checks exercise the REAL
subsystems of this package (integrator, env, bench artifacts) instead of
returning hardcoded scores.

All of this tier is host-side control-plane Python by design — no JAX in
the hot path; the data plane is the jit-compiled SPMD program the specs
launch.
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, Iterable, List, Optional

# ---------------------------------------------------------------------------
# Regions and standards
# ---------------------------------------------------------------------------

#: TPU-bearing cloud regions (global_deployment.py:19-26 uses generic cloud
#: regions; we name the ones that actually host TPU pods).
REGIONS = (
    "us-central1",
    "us-east5",
    "europe-west4",
    "asia-southeast1",
)

#: Supported data-protection standards (global_deployment.py:29-34).
STANDARDS = ("gdpr", "ccpa", "pdpa", "pipeda")

#: Per-standard policy knobs (global_deployment.py:75-96).
STANDARD_POLICY: Dict[str, Dict[str, Any]] = {
    "gdpr": {
        "max_retention_days": 2555,
        "consent_required": True,
        "right_to_erasure": True,
        "breach_notification_hours": 72,
    },
    "ccpa": {
        "max_retention_days": 1825,
        "consent_required": False,  # opt-out model
        "right_to_erasure": True,
        "breach_notification_hours": None,
    },
    "pdpa": {
        "max_retention_days": 3650,
        "consent_required": True,
        "right_to_erasure": False,
        "breach_notification_hours": 72,
    },
    "pipeda": {
        "max_retention_days": 1825,
        "consent_required": True,
        "right_to_erasure": False,
        "breach_notification_hours": None,
    },
}

#: Which standards a region's residents are protected by, and whether data
#: must stay in-region (global_deployment.py:342-375).
REGION_RULES: Dict[str, Dict[str, Any]] = {
    "us-central1": {"required_standards": ("ccpa",), "data_residency": False},
    "us-east5": {"required_standards": ("ccpa",), "data_residency": False},
    "europe-west4": {"required_standards": ("gdpr",), "data_residency": True},
    "asia-southeast1": {"required_standards": ("pdpa",), "data_residency": True},
}


def _hash_subject(subject_id: str) -> str:
    """Privacy-preserving subject handle (global_deployment.py:225-228)."""
    return hashlib.sha256(subject_id.encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# Compliance framework
# ---------------------------------------------------------------------------


@dataclass
class ProcessingRecord:
    """One data-processing event (global_deployment.py:37-47)."""

    record_id: str
    subject_hash: str
    timestamp: float
    data_types: List[str]
    purpose: str
    consent: bool
    retention_days: int
    erased_at: Optional[float] = None


class ComplianceFramework:
    """Data-processing ledger with erasure and reporting.

    Counterpart of global_deployment.py:63-240; the ledger indexes records
    by subject hash so erasure requests actually target the requester's
    records (the reference marks EVERY record deleted on any request —
    global_deployment.py:158-164 — which we deliberately fix).
    """

    def __init__(self, standards: Iterable[str] = ("gdpr", "ccpa")):
        for s in standards:
            if s not in STANDARD_POLICY:
                raise ValueError(f"unknown compliance standard: {s}")
        self.standards = tuple(standards)
        self.records: Dict[str, ProcessingRecord] = {}
        self.by_subject: Dict[str, List[str]] = {}
        self.events: List[Dict[str, Any]] = []

    # -- ledger ------------------------------------------------------------

    def record_processing(
        self,
        subject_id: str,
        data_types: List[str],
        purpose: str,
        consent: bool = True,
        retention_days: int = 365,
    ) -> str:
        limit = min(
            STANDARD_POLICY[s]["max_retention_days"] for s in self.standards
        )
        if retention_days > limit:
            raise ValueError(
                f"retention {retention_days}d exceeds {limit}d allowed by "
                f"{self.standards}"
            )
        if consent is False and any(
            STANDARD_POLICY[s]["consent_required"] for s in self.standards
        ):
            raise ValueError("consent required under " + ", ".join(self.standards))
        rid = str(uuid.uuid4())
        subject = _hash_subject(subject_id)
        self.records[rid] = ProcessingRecord(
            rid, subject, time.time(), list(data_types), purpose, consent,
            retention_days,
        )
        self.by_subject.setdefault(subject, []).append(rid)
        self._event("processing_recorded", record_id=rid, subject=subject)
        return rid

    def request_erasure(self, subject_id: str, standard: str) -> Dict[str, Any]:
        """GDPR Art.17 / CCPA delete (global_deployment.py:139-181)."""
        policy = STANDARD_POLICY.get(standard)
        if policy is None:
            return {"success": False, "message": f"unknown standard {standard}"}
        if not policy["right_to_erasure"]:
            return {
                "success": False,
                "message": f"{standard} grants no erasure right",
            }
        subject = _hash_subject(subject_id)
        now = time.time()
        erased = 0
        for rid in self.by_subject.get(subject, []):
            rec = self.records[rid]
            if rec.erased_at is None:
                rec.erased_at = now
                erased += 1
        self._event("erasure", subject=subject, erased=erased, standard=standard)
        return {"success": True, "records_erased": erased, "standard": standard}

    def sweep_expired(self) -> int:
        """Erase records past their retention window; returns count."""
        now = time.time()
        n = 0
        for rec in self.records.values():
            if rec.erased_at is None and (
                rec.timestamp + rec.retention_days * 86400.0 < now
            ):
                rec.erased_at = now
                n += 1
        if n:
            self._event("retention_sweep", erased=n)
        return n

    # -- reporting ---------------------------------------------------------

    def report(self, period_days: int = 30) -> Dict[str, Any]:
        """Compliance report (global_deployment.py:183-223)."""
        cutoff = time.time() - period_days * 86400.0
        recent = [r for r in self.records.values() if r.timestamp >= cutoff]
        total = len(recent)
        consented = sum(r.consent for r in recent)
        live = [r for r in recent if r.erased_at is None]
        recommendations = []
        if total and consented / total < 0.95:
            recommendations.append("improve consent collection")
        if sum(r.retention_days > 365 for r in live) > 0.1 * max(1, total):
            recommendations.append("shorten retention periods")
        return {
            "period_days": period_days,
            "standards": list(self.standards),
            "records": total,
            "live_records": len(live),
            "consent_rate": consented / total if total else 1.0,
            "events": len([e for e in self.events if e["timestamp"] >= cutoff]),
            "recommendations": recommendations,
        }

    def _event(self, action: str, **detail: Any) -> None:
        self.events.append({"timestamp": time.time(), "action": action, **detail})


# ---------------------------------------------------------------------------
# Multi-region deployment
# ---------------------------------------------------------------------------


@dataclass
class RegionConfig:
    """Per-region deployment policy (global_deployment.py:50-60)."""

    region: str
    standards: List[str] = field(default_factory=list)
    data_residency: bool = False
    encryption_at_rest: bool = True
    encryption_in_transit: bool = True
    audit_logging: bool = True
    max_concurrent_users: int = 1000
    auto_scaling: bool = True


def validate_region_config(cfg: RegionConfig) -> Dict[str, Any]:
    """Regional compliance gate (global_deployment.py:342-375).

    EU regions require GDPR + residency; APAC requires residency; US
    regions warn (not fail) without CCPA.
    """
    if cfg.region not in REGION_RULES:
        return {"valid": False, "problems": [f"unknown region {cfg.region}"],
                "warnings": []}
    rules = REGION_RULES[cfg.region]
    problems: List[str] = []
    warnings: List[str] = []
    for std in rules["required_standards"]:
        if std not in cfg.standards:
            msg = f"{std} coverage required for {cfg.region}"
            (problems if STANDARD_POLICY[std]["consent_required"] else warnings
             ).append(msg)
    if rules["data_residency"] and not cfg.data_residency:
        problems.append(f"data residency required in {cfg.region}")
    if not (cfg.encryption_at_rest and cfg.encryption_in_transit):
        warnings.append("encryption should be enabled end-to-end")
    return {"valid": not problems, "problems": problems, "warnings": warnings}


class GlobalDeploymentManager:
    """Registers per-region deployments and balances traffic across them.

    Counterpart of global_deployment.py:246-560. Each region holds a
    launch-spec (manager.DeploymentSpec) for its pod slice; this class adds
    the compliance gate, health tracking, and geo load-balance weights.
    """

    def __init__(self):
        self.regions: Dict[str, Dict[str, Any]] = {}
        self.compliance = ComplianceFramework()
        self.history: List[Dict[str, Any]] = []

    def deploy(self, cfg: RegionConfig, spec: Optional[Any] = None,
               dry_run: bool = False) -> Dict[str, Any]:
        """Validate and register a regional deployment."""
        verdict = validate_region_config(cfg)
        if dry_run or not verdict["valid"]:
            return {"success": verdict["valid"], "dry_run": dry_run, **verdict}
        deployment_id = str(uuid.uuid4())
        self.regions[cfg.region] = {
            "deployment_id": deployment_id,
            "config": cfg,
            "spec": spec,
            "status": "active",
            "health": "healthy",
            "deployed_at": time.time(),
        }
        self.history.append({
            "timestamp": time.time(), "action": "deploy",
            "region": cfg.region, "deployment_id": deployment_id,
        })
        return {"success": True, "deployment_id": deployment_id,
                "region": cfg.region, "warnings": verdict["warnings"]}

    def undeploy(self, region: str) -> bool:
        dep = self.regions.pop(region, None)
        if dep is None:
            return False
        self.history.append({
            "timestamp": time.time(), "action": "undeploy", "region": region,
            "deployment_id": dep["deployment_id"],
        })
        return True

    def set_health(self, region: str, health: str) -> None:
        if region in self.regions:
            self.regions[region]["health"] = health

    def load_balance_weights(self) -> Dict[str, float]:
        """Traffic weights over HEALTHY regions (global_deployment.py:487-520).

        The reference distributes over all regions uniformly; we zero
        unhealthy regions so failover is actually encoded in the weights.
        """
        healthy = [r for r, d in self.regions.items()
                   if d["status"] == "active" and d["health"] == "healthy"]
        if not healthy:
            return {}
        w = 1.0 / len(healthy)
        return {r: (w if r in healthy else 0.0) for r in self.regions}

    def status(self) -> Dict[str, Any]:
        return {
            "total_regions": len(self.regions),
            "active": sum(d["status"] == "active" for d in self.regions.values()),
            "healthy": sum(d["health"] == "healthy" for d in self.regions.values()),
            "regions": {
                r: {"status": d["status"], "health": d["health"],
                    "uptime_s": time.time() - d["deployed_at"]}
                for r, d in self.regions.items()
            },
            "weights": self.load_balance_weights(),
        }


# ---------------------------------------------------------------------------
# Production readiness
# ---------------------------------------------------------------------------


def production_readiness(run_device_checks: bool = True) -> Dict[str, Any]:
    """Readiness assessment (global_deployment.py:565-700) with REAL checks.

    The reference returns literal hardcoded scores; here each dimension is
    probed live: the health monitor actually integrates and steps an env,
    bench/test artifacts are read from disk, and the package import
    boundary is exercised.
    """
    checks: Dict[str, Dict[str, Any]] = {}

    # package boundary imports cleanly
    try:
        import spintorque_tpu  # noqa: F401
        checks["package_import"] = {"passed": True}
    except Exception as e:  # pragma: no cover
        checks["package_import"] = {"passed": False, "error": str(e)}

    # live subsystem health (integrator run + env rollout)
    if run_device_checks:
        try:
            from ..utils.monitoring import default_health_monitor

            health = default_health_monitor().run()
            checks["subsystem_health"] = {
                "passed": health["status"] == "HEALTHY",
                "detail": health["checks"],
            }
        except Exception as e:  # pragma: no cover
            checks["subsystem_health"] = {"passed": False, "error": str(e)}

    # recorded benchmark evidence
    from pathlib import Path

    bench = None
    for cand in ("docs/BENCH_TPU_v5e.json", "BENCH_r01.json"):
        p = Path(cand)
        if p.exists():
            try:
                bench = json.loads(p.read_text())
                break
            except Exception:
                continue
    checks["performance_evidence"] = {"passed": bench is not None,
                                      "source": str(cand) if bench else None}

    # compliance machinery functional
    try:
        fw = ComplianceFramework(standards=("gdpr",))
        rid = fw.record_processing("probe", ["telemetry"], "readiness-check")
        ok = fw.request_erasure("probe", "gdpr")["records_erased"] == 1
        checks["compliance_validation"] = {"passed": ok, "probe_record": rid}
    except Exception as e:  # pragma: no cover
        checks["compliance_validation"] = {"passed": False, "error": str(e)}

    passed = sum(c["passed"] for c in checks.values())
    report = {
        "production_ready": passed == len(checks),
        "checks": checks,
        "score": round(100.0 * passed / len(checks), 1),
        "blocking": [k for k, c in checks.items() if not c["passed"]],
    }
    return report


__all__ = [
    "REGIONS",
    "STANDARDS",
    "STANDARD_POLICY",
    "REGION_RULES",
    "ProcessingRecord",
    "ComplianceFramework",
    "RegionConfig",
    "validate_region_config",
    "GlobalDeploymentManager",
    "production_readiness",
]
