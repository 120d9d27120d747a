"""Flow report — the engine's version of the reference's ETL flow
reporter artifact: one JSON (+ markdown) document per pipeline run with
table counts, latest-run tracking, remaining duplicate groups, and
warnings grouped by source
(/root/reference/src/core/logic/etl_flow_reporter.py:525-556 report
assembly; :228-276 ``duplicate_count_present`` /
``tracking_runs_not_successful`` warning semantics; :62-64 table
snapshots).

Spark-first differences from the reference's sqlite reporter:

* Table counts default to METADATA estimates — the sum of per-file
  footer row counts already in each table's snapshot (O(files)
  driver-side, includes tombstones) — because a weekly report must not
  cost a full scan of a 100 TB lake.  ``exact=True`` runs real counts
  (live rows only) for small deployments.
* Duplicate-group metrics run as bounded aggregations over the TARGET
  (each collapses to O(1) rows); step-over-step diffs come from
  :mod:`horizon_etl_spark.cdc.audit`'s StepAuditor if one was recording.
* The quarantine backlog replaces the reference's crawler-placeholder
  data-quality probe: rows stuck in the dead-letter table are this
  engine's "inspect before trusting" signal, reported per reason.

Artifacts are written atomically (tmp + rename) as both a run-stamped
file and a ``<name>.json`` / ``<name>.md`` latest pointer — the same
dual layout the reference emits.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import SparkSession, functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline
from horizon_etl_spark.cdc.audit import duplicate_summary
from horizon_etl_spark.tables.lake import LakeTable

PIPELINE_TABLES = ("target", "quarantine", "runs", "metrics", "change_log", "rollup")

DEFAULT_DUP_METRICS = {"content_dups": ["tokens"]}


def _meta_rows(table: LakeTable) -> int:
    snap = table.snapshot()
    return sum(f["rows"] for f in snap["files"] if f["rows"] and f["rows"] > 0)


def table_counts(
    spark: SparkSession, pipe: CdcPipeline, exact: bool = False
) -> dict[str, int]:
    out = {}
    for name in PIPELINE_TABLES:
        t: LakeTable = getattr(pipe, name)
        out[name] = int(t.read(spark).count()) if exact else _meta_rows(t)
    return out


def tracking_summary(spark: SparkSession, pipe: CdcPipeline, last: int = 10) -> dict:
    """Totals + the latest runs — the reference's ``_tracking_summary``
    (latest 10 ingestion_runs with status)."""
    rows = (
        pipe.runs.read(spark)
        .orderBy(F.desc("batch_id"), F.desc("finished_at"))
        .limit(last)
        .select("batch_id", "status", "started_at", "finished_at", "input_rows", "applied", "quarantined")
        .collect()
    )
    return {
        "enabled": True,
        "totals": {"runs": _meta_rows(pipe.runs)},
        "latest_runs": [
            {
                "batch_id": r["batch_id"],
                "status": r["status"],
                "started_at": str(r["started_at"]),
                "finished_at": str(r["finished_at"]),
                "input_rows": r["input_rows"],
                "applied": r["applied"],
                "quarantined": r["quarantined"],
            }
            for r in rows
        ],
    }


def duplicate_data_quality_warnings(final_duplicates: dict[str, int]) -> list[dict]:
    """Reference-equal ``duplicate_count_present``
    (etl_flow_reporter.py:228-244)."""
    return [
        {
            "severity": "warning",
            "code": "duplicate_count_present",
            "metric": metric,
            "count": count,
            "message": f"{count} duplicate group(s) remain for {metric}.",
        }
        for metric, count in final_duplicates.items()
        if count > 0
    ]


def tracking_data_quality_warnings(summary: dict) -> list[dict]:
    """Reference-equal ``tracking_runs_not_successful``
    (etl_flow_reporter.py:247-276)."""
    failed = [
        r
        for r in summary.get("latest_runs", [])
        if str(r.get("status", "")).lower() not in {"success", "completed"}
    ]
    if not failed:
        return []
    return [
        {
            "severity": "warning",
            "code": "tracking_runs_not_successful",
            "count": len(failed),
            "examples": [
                {"batch_id": r["batch_id"], "status": r["status"]} for r in failed[:5]
            ],
            "message": "Tracking contains latest runs that did not finish successfully.",
        }
    ]


def quarantine_warnings(spark: SparkSession, pipe: CdcPipeline) -> list[dict]:
    """Dead-letter backlog per reason — the engine's data-quality probe
    (analogue of the reference's placeholder-name inspection warning)."""
    if _meta_rows(pipe.quarantine) == 0:
        return []
    rows = (
        pipe.quarantine.read(spark)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .collect()
    )
    total = sum(r["n"] for r in rows)
    return [
        {
            "severity": "warning",
            "code": "quarantine_backlog",
            "count": int(total),
            "examples": [{"reason": r["reason"], "count": int(r["n"])} for r in rows[:5]],
            "message": (
                f"{total} quarantined row(s) await reprocess_quarantine(); "
                "inspect reasons before trusting downstream exports."
            ),
        }
    ]


def maintenance_advisory_warnings(pipe: CdcPipeline) -> list[dict]:
    """Merge-time layout advisories pending an operator action: the
    target's latest summary may carry ``rebucket_recommended`` (rows
    per bucket over policy) or ``cluster_recommended`` (sparse batches
    churning fat files).  Both are acted on by job_maintain's auto
    modes, but surfacing them here means a pipeline WITHOUT a scheduled
    maintenance sweep still alerts instead of silently degrading.
    O(1): reads the already-loaded snapshot summary, no Spark job."""
    summary = pipe.target.snapshot().get("summary", {})
    out = []
    if summary.get("rebucket_recommended"):
        out.append(
            {
                "severity": "warning",
                "code": "rebucket_recommended",
                "count": int(summary["rebucket_recommended"]),
                "message": (
                    f"Merge advisory: rebucket target to "
                    f"{summary['rebucket_recommended']} buckets "
                    "(run job_maintain, --rebucket auto honors this)."
                ),
            }
        )
    if summary.get("cluster_recommended"):
        out.append(
            {
                "severity": "warning",
                "code": "cluster_recommended",
                "count": 1,
                "message": (
                    "Merge advisory: sparse batches are rewriting files far "
                    "over target_file_rows — schedule a sort-ordered sweep "
                    "(job_maintain --cluster-by-key auto honors this)."
                ),
            }
        )
    return out


def flow_report(
    spark: SparkSession,
    pipe: CdcPipeline,
    run_name: str = "etl_flow",
    dup_metrics: dict[str, list[str]] | None = None,
    exact_counts: bool = False,
    steps: list[dict] | None = None,
) -> dict[str, Any]:
    """Assemble the report document (reference shape,
    etl_flow_reporter.py:525-541): final tables, final duplicates,
    tracking summary, and ``warnings_by_source``.  ``steps`` may carry
    per-step entries (e.g. StepAuditor diffs) whose ``warnings`` are
    folded into the by-source grouping exactly as the reference does."""
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    dup_metrics = dup_metrics or DEFAULT_DUP_METRICS
    final_duplicates = duplicate_summary(pipe.target.read(spark), dup_metrics)
    tracking = tracking_summary(spark, pipe)

    warnings: dict[str, list[dict]] = {}
    for step in steps or []:
        for w in step.get("warnings") or []:
            source = w.get("source") or step.get("origin") or "unknown"
            warnings.setdefault(source, []).append(
                {k: v for k, v in w.items() if k != "source"}
            )
    dup_w = duplicate_data_quality_warnings(final_duplicates)
    if dup_w:
        warnings.setdefault("duplicate_audit", []).extend(dup_w)
    track_w = tracking_data_quality_warnings(tracking)
    if track_w:
        warnings.setdefault("tracking", []).extend(track_w)
    quar_w = quarantine_warnings(spark, pipe)
    if quar_w:
        warnings.setdefault("quarantine", []).extend(quar_w)
    maint_w = maintenance_advisory_warnings(pipe)
    if maint_w:
        warnings.setdefault("maintenance", []).extend(maint_w)

    return {
        "run_name": run_name,
        "generated_at": now.isoformat(),
        "pipeline_root": pipe.root,
        "steps": steps or [],
        "final_tables": table_counts(spark, pipe, exact=exact_counts),
        "final_duplicates": final_duplicates,
        "tracking_summary": tracking,
        "warnings_by_source": {k: v for k, v in sorted(warnings.items()) if v},
    }


def _render_markdown(report: dict[str, Any]) -> str:
    lines = [
        f"# ETL flow report — {report['run_name']}",
        "",
        f"Generated: **{report['generated_at']}**  ",
        f"Pipeline: `{report['pipeline_root']}`",
        "",
        "## Tables",
        "",
        "| table | rows |",
        "|---|---|",
    ]
    for t, n in report["final_tables"].items():
        lines.append(f"| {t} | {n} |")
    lines += ["", "## Remaining duplicate groups", ""]
    if any(v > 0 for v in report["final_duplicates"].values()):
        for m, n in report["final_duplicates"].items():
            lines.append(f"- {m}: **{n}**")
    else:
        lines.append("- none")
    lines += ["", "## Warnings", ""]
    wbs = report["warnings_by_source"]
    if not wbs:
        lines.append("- none")
    for source, ws in wbs.items():
        lines.append(f"### {source}")
        for w in ws:
            lines.append(f"- `{w.get('code')}`: {w.get('message')}")
        lines.append("")
    return "\n".join(lines) + "\n"


def _atomic_write(path: str, text: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(text)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)


def write_report(report: dict[str, Any], out_dir: str) -> dict[str, str]:
    """Run-stamped + latest-pointer artifact pair, each written
    atomically (the reference's dual json/md layout,
    etl_flow_reporter.py:542-556)."""
    return write_document_pair(report, _render_markdown(report), out_dir)


def write_document_pair(
    report: dict[str, Any], md: str, out_dir: str
) -> dict[str, str]:
    """Shared stamped+latest json/md publisher — the flow report and
    the executive mart reports (report_exec.py) use the same layout, so
    every report artifact in a deployment looks alike to operators."""
    os.makedirs(out_dir, exist_ok=True)
    stamp = report["generated_at"].replace(":", "").replace("-", "").split(".")[0]
    name = report["run_name"]
    js = json.dumps(report, indent=2, ensure_ascii=False, default=str)
    paths = {
        "json": os.path.join(out_dir, f"{name}_{stamp}.json"),
        "md": os.path.join(out_dir, f"{name}_{stamp}.md"),
        "latest_json": os.path.join(out_dir, f"{name}.json"),
        "latest_md": os.path.join(out_dir, f"{name}.md"),
    }
    _atomic_write(paths["json"], js)
    _atomic_write(paths["md"], md)
    _atomic_write(paths["latest_json"], js)
    _atomic_write(paths["latest_md"], md)
    return paths
