"""Contract tests for the compose monitoring profile (round-3 verdict #9).

Docker cannot run in this environment, so these tests pin the wiring the
stack depends on instead: the prometheus scrape target matches the serve
service/port in docker-compose.yml, the grafana datasource points at the
prometheus service, every metric the dashboard queries is actually exported
by deployment/server.py's /metrics, and the exposition text parses as the
prometheus text format. Counterpart of the reference's monitoring services
(docker-compose.yml:162-221).
"""

import json
import os
import re

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MON = os.path.join(REPO, "deployment", "monitoring")


def _compose():
    with open(os.path.join(REPO, "docker-compose.yml")) as fh:
        return yaml.safe_load(fh)


def test_monitoring_profile_services_wired():
    compose = _compose()
    services = compose["services"]
    for name in ("serve", "prometheus", "grafana"):
        assert "monitoring" in services[name]["profiles"], name
    # prometheus mounts the scrape config that exists in the repo
    vols = " ".join(services["prometheus"]["volumes"])
    assert "deployment/monitoring/prometheus.yml" in vols
    assert os.path.exists(os.path.join(MON, "prometheus.yml"))
    # grafana mounts the provisioning tree
    gvols = " ".join(services["grafana"]["volumes"])
    assert "deployment/monitoring/grafana/provisioning" in gvols
    # named volumes declared
    assert set(compose["volumes"]) >= {"prometheus-data", "grafana-data"}


def test_prometheus_scrapes_the_serve_service():
    compose = _compose()
    serve = compose["services"]["serve"]
    port = serve["command"][serve["command"].index("--port") + 1]
    with open(os.path.join(MON, "prometheus.yml")) as fh:
        prom = yaml.safe_load(fh)
    targets = [
        t
        for sc in prom["scrape_configs"]
        for st in sc["static_configs"]
        for t in st["targets"]
    ]
    assert f"serve:{port}" in targets, (targets, port)
    assert any(sc["metrics_path"] == "/metrics" for sc in prom["scrape_configs"])


def test_grafana_datasource_points_at_prometheus():
    with open(os.path.join(
        MON, "grafana", "provisioning", "datasources", "datasource.yml"
    )) as fh:
        ds = yaml.safe_load(fh)
    urls = [d["url"] for d in ds["datasources"]]
    assert "http://prometheus:9090" in urls


def test_dashboard_metrics_are_actually_exported():
    """Every gauge the dashboard queries must appear on a live /metrics
    exposition (dashboards that reference nonexistent series render empty
    panels silently - this is the check docker-compose up would not give)."""
    from spintorque_tpu.deployment.server import HealthState

    state = HealthState(run_device_checks=False)
    state.refresh()
    state.record_metric("spintorque_env_steps_per_s", 1.0)
    text = state.metrics_text()
    exported = set(re.findall(r"^([a-zA-Z_:][a-zA-Z0-9_:]*) ", text, re.M))

    with open(os.path.join(
        MON, "grafana", "provisioning", "dashboards", "spintorque.json"
    )) as fh:
        dash = json.load(fh)
    queried = set()
    for panel in dash["panels"]:
        for target in panel.get("targets", []):
            queried |= set(
                re.findall(r"spintorque_[a-zA-Z0-9_]*", target["expr"])
            )
    assert queried, "dashboard queries no spintorque metrics"
    missing = queried - exported
    assert not missing, f"dashboard queries unexported metrics: {missing}"

    # Exposition parses as the prometheus text format: TYPE line per gauge,
    # then "name value" with a float value.
    for line in text.strip().splitlines():
        assert re.match(
            r"^# TYPE [a-zA-Z_:][a-zA-Z0-9_:]* gauge$"
            r"|^[a-zA-Z_:][a-zA-Z0-9_:]* -?[0-9.e+-]+$",
            line,
        ), f"malformed exposition line: {line!r}"
