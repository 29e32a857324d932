"""Serving endpoint tests: live HTTP probes against the real package
surfaces (deployment/server.py)."""

import json
import urllib.request

import pytest

from spintorque_tpu.deployment import ServingEndpoint


@pytest.fixture(scope="module")
def endpoint():
    # port=0 -> OS-assigned; device checks on (CPU backend in tests, so the
    # health monitor's integrator/env probes run for real and fast enough)
    ep = ServingEndpoint(host="127.0.0.1", port=0, refresh_interval=3600.0)
    ep.start()
    yield ep
    ep.stop()


def _get(ep, path):
    url = f"http://127.0.0.1:{ep.port}{path}"
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_healthz(endpoint):
    code, body = _get(endpoint, "/healthz")
    data = json.loads(body)
    assert code == 200 and data["status"] == "HEALTHY"
    assert data["devices"] >= 1


def test_readiness(endpoint):
    code, body = _get(endpoint, "/readiness")
    data = json.loads(body)
    assert code == 200 and data["production_ready"]
    assert data["checks"]["subsystem_health"]["passed"]


def test_metrics_exposition(endpoint):
    endpoint.state.record_metric("spintorque_env_steps_per_s", 12345.0)
    code, body = _get(endpoint, "/metrics")
    text = body.decode()
    assert code == 200
    assert "spintorque_health_ok 1" in text
    assert "spintorque_ready 1" in text
    assert "spintorque_env_steps_per_s 12345" in text
    assert "# TYPE spintorque_health_ok gauge" in text


def test_info_and_404(endpoint):
    code, body = _get(endpoint, "/info")
    data = json.loads(body)
    assert code == 200 and data["devices"] >= 1
    code, _ = _get(endpoint, "/bogus")
    assert code == 404


def test_cli_serve_wiring():
    """The serve subcommand parses and builds the endpoint (no listen)."""
    from spintorque_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["serve", "--port", "0", "--no-device-checks"]
    )
    assert args.func.__name__ == "cmd_serve"
    assert args.no_device_checks
