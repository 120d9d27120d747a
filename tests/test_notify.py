"""Operator notification channel (reference:
src/notifications/telegram.py wired into flow tails): pluggable
delivery shapes, failure containment (a dead channel never fails the
pipeline), and the two event families — phase failures and
report-level warnings."""

import http.server
import json
import os
import threading

import pytest

from horizon_etl_spark.notify import (
    FileNotifier,
    MultiNotifier,
    NullNotifier,
    StdoutNotifier,
    WebhookNotifier,
    build_notifier,
    phase_failed_event,
    report_warning_events,
)


def test_build_notifier_specs(tmp_path):
    assert isinstance(build_notifier(None), NullNotifier)
    assert isinstance(build_notifier([]), NullNotifier)
    assert isinstance(build_notifier(["stdout"]), StdoutNotifier)
    f = build_notifier([f"file:{tmp_path}/alerts.jsonl"])
    assert isinstance(f, FileNotifier)
    w = build_notifier(["webhook:http://localhost:1/hook"])
    assert isinstance(w, WebhookNotifier)
    m = build_notifier(["stdout", f"file:{tmp_path}/a.jsonl"])
    assert isinstance(m, MultiNotifier) and len(m.notifiers) == 2
    with pytest.raises(ValueError, match="notifier spec"):
        build_notifier(["telegram:@chat"])  # unknown scheme is an error


def test_file_notifier_appends_json_lines(tmp_path):
    path = os.path.join(tmp_path, "ops", "alerts.jsonl")
    n = FileNotifier(path)
    assert n.notify({"event": "phase_failed", "phase": "ingest", "exit_code": 1})
    assert n.notify({"event": "report_warning", "code": "quarantine_backlog"})
    lines = [json.loads(l) for l in open(path).read().splitlines()]
    assert [l["event"] for l in lines] == ["phase_failed", "report_warning"]
    assert all("ts" in l for l in lines)
    assert lines[0]["phase"] == "ingest" and lines[0]["exit_code"] == 1


def test_webhook_notifier_posts_event():
    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        n = WebhookNotifier(f"http://127.0.0.1:{srv.server_port}/hook")
        assert n.notify({"event": "phase_failed", "phase": "export", "exit_code": 2})
    finally:
        srv.shutdown()
    assert received and received[0]["phase"] == "export"


def test_delivery_failure_is_contained(tmp_path, capsys):
    """An unreachable channel must report False, print to stderr, and
    never raise — a dead chat bot cannot take down a healthy ingest."""
    n = WebhookNotifier("http://127.0.0.1:1/unreachable", timeout=0.2)
    assert n.notify({"event": "phase_failed"}) is False
    assert "delivery failed" in capsys.readouterr().err
    # multi: one dead channel doesn't stop the live one
    path = os.path.join(tmp_path, "alerts.jsonl")
    m = MultiNotifier([n, FileNotifier(path)])
    assert m.notify({"event": "phase_failed", "phase": "x"}) is False
    assert json.loads(open(path).read())["phase"] == "x"


def test_phase_failed_event_carries_evidence():
    ev = phase_failed_event(
        {"phase": "export", "exit_code": 3, "seconds": 1.5, "stderr_tail": "boom" * 500}
    )
    assert ev["event"] == "phase_failed" and ev["severity"] == "error"
    assert ev["phase"] == "export" and ev["exit_code"] == 3
    assert len(ev["stderr_tail"]) == 500  # bounded for chat-sized sinks


def test_report_warning_events_flatten_by_source():
    report = {
        "run_name": "etl_flow",
        "pipeline_root": "/lake/docs",
        "warnings_by_source": {
            "quarantine": [
                {
                    "severity": "warning",
                    "code": "quarantine_backlog",
                    "count": 7,
                    "message": "7 quarantined row(s) await reprocess_quarantine()",
                }
            ],
            "step_3": [
                {"severity": "warning", "code": "duplicate_count_increased", "count": 2}
            ],
        },
    }
    events = report_warning_events(report)
    assert {e["code"] for e in events} == {
        "quarantine_backlog",
        "duplicate_count_increased",
    }
    for e in events:
        assert e["event"] == "report_warning"
        assert e["run_name"] == "etl_flow" and e["pipeline_root"] == "/lake/docs"
    assert report_warning_events({"warnings_by_source": {}}) == []


def test_orchestrator_routes_report_warnings(tmp_path):
    """The orchestrator's final-phase hook reads the written report
    artifact and fans every warning out to the operator channel —
    covering the wiring without a spark-submit round trip (the
    failure-path wiring is covered end-to-end in test_orchestrate)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.orchestrate import route_report_warnings

    report = {
        "run_name": "etl_flow",
        "pipeline_root": "/lake/docs",
        "warnings_by_source": {
            "quarantine": [
                {"severity": "warning", "code": "quarantine_backlog", "count": 3}
            ]
        },
    }
    report_path = os.path.join(tmp_path, "report.json")
    with open(report_path, "w") as fh:
        json.dump(report, fh)
    alerts = os.path.join(tmp_path, "alerts.jsonl")
    assert route_report_warnings(report_path, FileNotifier(alerts)) == 1
    ev = json.loads(open(alerts).read())
    assert ev["event"] == "report_warning" and ev["code"] == "quarantine_backlog"
    assert ev["run_name"] == "etl_flow" and ev["count"] == 3
    # a missing / never-written report routes nothing and doesn't raise
    assert route_report_warnings(None, FileNotifier(alerts)) == 0
    assert route_report_warnings(os.path.join(tmp_path, "nope.json"), FileNotifier(alerts)) == 0


def test_webhook_retries_transient_then_succeeds():
    """429/5xx retry with backoff (reference retry policy: 3 attempts,
    README.md:333-346); a 4xx misconfiguration fails without retrying."""
    calls = {"n": 0, "mode": "retry"}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            calls["n"] += 1
            if calls["mode"] == "retry" and calls["n"] < 3:
                self.send_response(429 if calls["n"] == 1 else 503)
            elif calls["mode"] == "forbidden":
                self.send_response(403)
            else:
                self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        n = WebhookNotifier(
            f"http://127.0.0.1:{srv.server_port}/hook",
            backoffs=(0.01, 0.01),
        )
        # 429 -> 503 -> 200: two retries, then success
        assert n.notify({"event": "phase_failed"}) is True
        assert calls["n"] == 3
        # 403 is not transient: exactly one attempt, contained failure
        calls["n"], calls["mode"] = 0, "forbidden"
        assert n.notify({"event": "phase_failed"}) is False
        assert calls["n"] == 1
    finally:
        srv.shutdown()


def test_phase_timeout_emits_evidence_and_alert(tmp_path, capsys):
    """A WEDGED phase (the case alerting exists for) must produce a
    phase_failed alert + an evidence line, not an unhandled
    TimeoutExpired traceback with a silent channel."""
    import sys
    import types

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.orchestrate import run_phase

    fake_home = os.path.join(tmp_path, "spark")
    os.makedirs(os.path.join(fake_home, "bin"))
    stub = os.path.join(fake_home, "bin", "spark-submit")
    with open(stub, "w") as fh:
        fh.write("#!/bin/sh\nsleep 30\n")
    os.chmod(stub, 0o755)
    old_home = os.environ.get("SPARK_HOME")
    os.environ["SPARK_HOME"] = fake_home
    try:
        args = types.SimpleNamespace(
            master="local[1]", py_files="engine.zip", conf=[], phase_timeout=1
        )
        alerts = os.path.join(tmp_path, "alerts.jsonl")
        rc, ev = run_phase("ingest", ["job.py"], args, FileNotifier(alerts))
    finally:
        if old_home is None:
            os.environ.pop("SPARK_HOME", None)
        else:
            os.environ["SPARK_HOME"] = old_home
    assert rc == 124 and ev["exit_code"] is None and ev["timeout"] == 1
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["phase"] == "ingest" and line["exit_code"] is None
    alert = json.loads(open(alerts).read())
    assert alert["event"] == "phase_failed" and alert["phase"] == "ingest"
    assert "timed out" in alert["stderr_tail"]
