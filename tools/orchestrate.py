"""Phase orchestrator: the reference's weekly pipeline as independent
``spark-submit`` jobs sharing one lake.

The reference's weekly orchestrator runs each phase in its own
subprocess and exits non-zero when a critical phase fails
(/root/reference/src/flows/pipelines/weekly_orchestrator.py:1-40,
/root/reference/src/app.py:76-81).  The Spark-native mapping (SURVEY.md
§2 T7) is one spark-submit job per phase — crash containment comes from
process isolation (a dying phase cannot corrupt another phase's JVM)
plus the lake's atomicity (a dying phase cannot leave a torn table:
commits are all-or-nothing, exports publish by symlink swap), and
resumability from the streaming checkpoint (re-running a failed ingest
continues where it stopped).

    python tools/orchestrate.py \
        --pipeline-root /data/lake/docs \
        --feed /data/wal/segments --checkpoint /data/ckpt/docs \
        --export-out /data/exports [--filtered-by source] \
        [--master local[8]] [--conf k=v ...]

Phases run sequentially (export reads what ingest wrote).  Per-phase
evidence is printed as one JSON line each; a failing phase stops the
run and its exit code becomes the orchestrator's.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline-root", required=True)
    ap.add_argument("--feed", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--export-out", default=None, help="omit to skip the export phase")
    ap.add_argument("--filtered-by", default=None)
    ap.add_argument(
        "--export-changes",
        action="store_true",
        help="also publish the incremental change-log outbox delta",
    )
    ap.add_argument(
        "--maintain",
        action="store_true",
        help="run the maintenance phase (advisory rebucket, selective "
        "compaction, vacuum) after export",
    )
    ap.add_argument("--feed-format", default="parquet")
    ap.add_argument("--with-rollup", action="store_true")
    ap.add_argument(
        "--report-out",
        default=None,
        help="emit the flow-report artifact (json+md) here as the final phase",
    )
    ap.add_argument(
        "--executive-sf-dir",
        default=None,
        help="with --report-out: also emit the executive mart report "
        "(report_exec.py) over the relational tables at this directory",
    )
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument(
        "--notify",
        action="append",
        default=[],
        help="operator alert channel(s): stdout | file:<path> | "
        "webhook:<url>; fired on phase failure and on report-level "
        "warnings (reference: src/notifications/telegram.py wired into "
        "flow tails)",
    )
    ap.add_argument(
        "--py-files",
        default=None,
        help="engine zip; built into dist/ if omitted",
    )
    ap.add_argument("--phase-timeout", type=int, default=3600)
    args = ap.parse_args(argv)
    if args.executive_sf_dir and args.report_out is None:
        # fail loudly: the executive report rides the report phase, so
        # requesting one without --report-out would otherwise be a
        # silent no-op for an explicitly asked-for artifact
        ap.error("--executive-sf-dir requires --report-out")
    return args


def _notifier(args):
    # lazy import: the orchestrator runs with the repo on sys.path OR
    # with only the engine zip; either provides the package
    sys.path.insert(0, REPO)
    from horizon_etl_spark.notify import build_notifier

    return build_notifier(args.notify)


def run_phase(name, script_args, args, notifier=None):
    spark_submit = os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    cmd = [spark_submit, "--master", args.master, "--py-files", args.py_files]
    for c in args.conf:
        cmd += ["--conf", c]
    cmd += script_args
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=args.phase_timeout
        )
    except subprocess.TimeoutExpired as exc:
        # a WEDGED phase (executor deadlock, stuck shuffle) is exactly
        # the case alerting exists for — emit evidence + alert instead
        # of dying with a traceback and a silent channel
        stderr = exc.stderr or b""
        if isinstance(stderr, bytes):
            stderr = stderr.decode("utf-8", "replace")
        evidence = {
            "phase": name,
            "exit_code": None,
            "timeout": args.phase_timeout,
            "seconds": round(time.monotonic() - t0, 2),
            "stderr_tail": (stderr[-2000:] or f"phase timed out after {args.phase_timeout}s"),
        }
        if notifier is not None:
            from horizon_etl_spark.notify import phase_failed_event

            notifier.notify(phase_failed_event(evidence))
        print(json.dumps(evidence), flush=True)
        return 124, evidence
    evidence = {
        "phase": name,
        "exit_code": proc.returncode,
        "seconds": round(time.monotonic() - t0, 2),
    }
    if proc.returncode == 0:
        try:
            evidence["result"] = json.loads(proc.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            evidence["result"] = None
    else:
        evidence["stderr_tail"] = proc.stderr[-2000:]
        if notifier is not None:
            from horizon_etl_spark.notify import phase_failed_event

            notifier.notify(phase_failed_event(evidence))
    print(json.dumps(evidence), flush=True)
    return proc.returncode, evidence


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.py_files is None:
        try:
            from make_pyfiles import build_zip  # run as `python tools/orchestrate.py`
        except ImportError:
            from tools.make_pyfiles import build_zip  # imported with repo root on path

        args.py_files = build_zip(REPO, os.path.join(REPO, "dist", "horizon_etl_spark.zip"))

    ingest = [
        os.path.join(REPO, "tools", "job_apply.py"),
        "--pipeline-root", args.pipeline_root,
        "--feed", args.feed,
        "--checkpoint", args.checkpoint,
        "--feed-format", args.feed_format,
    ]
    if args.with_rollup:
        ingest.append("--with-rollup")
    notifier = _notifier(args)
    rc, _ev = run_phase("ingest", ingest, args, notifier)
    if rc != 0:
        return rc

    if args.export_out is not None:
        export = [
            os.path.join(REPO, "tools", "job_export.py"),
            "--pipeline-root", args.pipeline_root,
            "--out", args.export_out,
        ]
        if args.filtered_by:
            export += ["--filtered-by", args.filtered_by]
        rc, _ev = run_phase("export", export, args, notifier)
        if rc != 0:
            return rc

        if args.export_changes:
            rc, _ev = run_phase(
                "export_changes",
                [
                    os.path.join(REPO, "tools", "job_export.py"),
                    "--pipeline-root", args.pipeline_root,
                    "--out", args.export_out,
                    "--changes",
                ],
                args,
                notifier,
            )
            if rc != 0:
                return rc

    if args.maintain:
        rc, _ev = run_phase(
            "maintain",
            [
                os.path.join(REPO, "tools", "job_maintain.py"),
                "--pipeline-root", args.pipeline_root,
            ],
            args,
            notifier,
        )
        if rc != 0:
            return rc

    if args.report_out is not None:
        # the reference's flow always ends by writing its report
        # artifact (etl_flow_reporter.write); same final-phase slot here
        report_args = [
            os.path.join(REPO, "tools", "job_report.py"),
            "--pipeline-root", args.pipeline_root,
            "--out", args.report_out,
        ]
        if args.executive_sf_dir:
            report_args += ["--executive-sf-dir", args.executive_sf_dir]
        rc, report_ev = run_phase("report", report_args, args, notifier)
        if rc != 0:
            return rc
        route_report_warnings(
            ((report_ev.get("result") or {}).get("report")), notifier
        )
    return 0


def route_report_warnings(report_path, notifier) -> int:
    """Route report-level warnings (``quarantine_backlog``,
    ``duplicate_count_*``, ``tracking_runs_not_successful``, step
    diffs) to the operator channel — a weekly pipeline failing SILENTLY
    until someone reads a JSON artifact is the gap this closes
    (reference: telegram.py run summaries fired from flow tails).
    Returns the number of warnings routed."""
    from horizon_etl_spark.notify import report_warning_events

    if not (report_path and os.path.exists(report_path)):
        return 0
    with open(report_path) as fh:
        events = report_warning_events(json.load(fh))
    for event in events:
        notifier.notify(event)
    return len(events)


if __name__ == "__main__":
    sys.exit(main())
