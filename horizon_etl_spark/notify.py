"""Run-outcome notification channel — the operator-alerting hook the
reference wires into every flow (/root/reference/src/notifications/
telegram.py:1-245: a notifier service posting run summaries / failure
alerts to a chat, invoked from flow tails and failure handlers).

Spark-first differences: the engine's phases run as isolated
spark-submit jobs (tools/orchestrate.py), so alerting lives in the
ORCHESTRATOR process — the one place that sees every phase's exit code
— not inside the Spark jobs.  Delivery is pluggable behind one
``Notifier.notify(event)`` shape:

* ``stdout`` — one ``NOTIFY {json}`` line (container/k8s log collector
  path; also the sandbox-friendly default for tests).
* ``file:<path>`` — JSON-lines append (an ops tail target; O_APPEND
  atomic per line).
* ``webhook:<url>`` — HTTP POST of the event JSON (the Slack/Telegram
  shape; the reference's bot ``sendMessage`` POST is exactly this with
  a templated body).

Events carry the phase evidence verbatim, so an alert is actionable
without opening the JSON artifacts.  Delivery failures NEVER crash the
pipeline — a dead chat bot must not fail a healthy ingest (the
reference swallows notifier errors the same way) — but they are
reported on stderr and counted in the returned status.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.error
import urllib.request
from typing import Any


class Notifier:
    """Base shape: subclasses implement ``_deliver(event_json: str)``."""

    kind = "none"

    def notify(self, event: dict[str, Any]) -> bool:
        """Deliver one event; True on success.  Never raises — an
        unreachable channel must not take the pipeline down with it."""
        payload = dict(event)
        payload.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()))
        try:
            self._deliver(json.dumps(payload, default=str))
            return True
        except Exception as exc:  # noqa: BLE001 - deliberate containment
            print(
                f"notify[{self.kind}] delivery failed: {exc}",
                file=sys.stderr,
                flush=True,
            )
            return False

    def _deliver(self, event_json: str) -> None:  # pragma: no cover - abstract
        raise NotImplementedError


class StdoutNotifier(Notifier):
    kind = "stdout"

    def _deliver(self, event_json: str) -> None:
        print(f"NOTIFY {event_json}", flush=True)


class FileNotifier(Notifier):
    """JSON-lines append.  One ``write`` of one line ≤ PIPE_BUF with
    O_APPEND is atomic on POSIX, so concurrent phases can share a
    notification log without interleaving."""

    kind = "file"

    def __init__(self, path: str):
        self.path = path

    def _deliver(self, event_json: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, (event_json + "\n").encode("utf-8"))
        finally:
            os.close(fd)


class WebhookNotifier(Notifier):
    """POST the event JSON — the reference bot's ``sendMessage`` POST
    (telegram.py) generalized to any webhook receiver.

    Transient failures (connection errors, HTTP 429/5xx) retry with
    backoff — the reference's source-adapter retry policy (3 attempts,
    60 s + 120 s backoff on 429, README.md:333-346 /
    sigpesq/adapter.py:98-136) scaled to alerting-appropriate delays.
    Non-transient HTTP errors (4xx other than 429) fail immediately:
    a misconfigured hook won't fix itself between attempts."""

    kind = "webhook"

    def __init__(
        self,
        url: str,
        timeout: float = 10.0,
        backoffs: tuple[float, ...] = (1.0, 2.0),
    ):
        self.url = url
        self.timeout = timeout
        self.backoffs = backoffs

    def _post_once(self, payload: bytes) -> None:
        req = urllib.request.Request(
            self.url,
            data=payload,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            if resp.status >= 300:
                raise RuntimeError(f"webhook returned {resp.status}")

    def _deliver(self, event_json: str) -> None:
        payload = event_json.encode("utf-8")
        attempts = len(self.backoffs) + 1
        for i in range(attempts):
            try:
                return self._post_once(payload)
            except urllib.error.HTTPError as exc:
                transient = exc.code == 429 or exc.code >= 500
                if not transient or i == attempts - 1:
                    raise
            except (urllib.error.URLError, OSError):
                if i == attempts - 1:
                    raise
            time.sleep(self.backoffs[i])


class MultiNotifier(Notifier):
    kind = "multi"

    def __init__(self, notifiers: list[Notifier]):
        self.notifiers = notifiers

    def notify(self, event: dict[str, Any]) -> bool:
        ok = True
        for n in self.notifiers:
            ok = n.notify(event) and ok
        return ok


class NullNotifier(Notifier):
    def notify(self, event: dict[str, Any]) -> bool:
        return True


def build_notifier(specs: list[str] | None) -> Notifier:
    """Parse CLI specs into one Notifier: ``stdout``, ``file:<path>``,
    ``webhook:<url>``; several specs fan out to all of them."""
    ns: list[Notifier] = []
    for spec in specs or []:
        kind, _, rest = spec.partition(":")
        if kind == "stdout" and not rest:
            ns.append(StdoutNotifier())
        elif kind == "file" and rest:
            ns.append(FileNotifier(rest))
        elif kind == "webhook" and rest:
            ns.append(WebhookNotifier(rest))
        else:
            raise ValueError(
                f"unknown notifier spec {spec!r} "
                f"(expected stdout | file:<path> | webhook:<url>)"
            )
    if not ns:
        return NullNotifier()
    if len(ns) == 1:
        return ns[0]
    return MultiNotifier(ns)


def phase_failed_event(evidence: dict[str, Any]) -> dict[str, Any]:
    """Alert payload for a failed orchestrator phase — the phase
    evidence rides along verbatim so the alert is actionable."""
    return {
        "event": "phase_failed",
        "severity": "error",
        "phase": evidence.get("phase"),
        "exit_code": evidence.get("exit_code"),
        "seconds": evidence.get("seconds"),
        "stderr_tail": (evidence.get("stderr_tail") or "")[-500:],
    }


def report_warning_events(report: dict[str, Any]) -> list[dict[str, Any]]:
    """One alert per report-level warning (``quarantine_backlog``,
    ``duplicate_count_increased``, ...) — the reference notifies its
    chat on report warnings the same way (telegram.py run summaries)."""
    out = []
    for source, warnings in (report.get("warnings_by_source") or {}).items():
        for w in warnings:
            out.append(
                {
                    "event": "report_warning",
                    "severity": w.get("severity", "warning"),
                    "source": source,
                    "code": w.get("code"),
                    "count": w.get("count"),
                    "message": w.get("message"),
                    "run_name": report.get("run_name"),
                    "pipeline_root": report.get("pipeline_root"),
                }
            )
    return out
