"""Step-over-step duplicate-audit diffs — the engine's version of the
reference's ETL flow reporter, which snapshots duplicate-group counts
around every pipeline step and warns when a step made duplication WORSE
(/root/reference/src/core/logic/etl_flow_reporter.py:108-134
``_step_warnings`` → ``duplicate_count_increased``;
duplicate metrics from src/core/logic/duplicate_auditor.py:52-87).

Shape here: ``duplicate_summary`` computes named duplicate-group counts
over any DataFrame (one bounded aggregation per metric — audits run on
the control plane, off the ingest hot path, and each count collapses to
O(1) driver rows, never a collect of the groups themselves).
``StepAuditor`` persists one summary row per (step, metric) into its
own tiny lake table via the driver-side ``append_rows`` fast path and
diffs consecutive steps with the reference's exact warning semantics:
a metric whose group count did not increase produces nothing; an
increase produces a ``duplicate_count_increased`` warning carrying
before/after/delta.

At 100 TB the audited frames are aggregates (a groupBy per metric whose
output is one row) — the summary table itself stays O(steps × metrics)
and the diff is a driver-side dict comparison, so the reporter costs
nothing at scale beyond the metric aggregations the operator asked for.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from horizon_etl_spark.tables.lake import LakeTable

AUDIT_SCHEMA = StructType(
    [
        StructField("step_id", LongType(), True),
        StructField("origin", StringType(), True),
        StructField("metric", StringType(), True),
        StructField("dup_groups", LongType(), True),
        StructField("created_at", TimestampType(), True),
        # monotonic recording sequence (the audit table's commit
        # version): a RETRIED step re-records the same (step_id, metric)
        # with corrected counts, and diff() must deterministically see
        # the LATEST recording — wall-clock created_at can tie, the
        # commit version cannot
        StructField("seq", LongType(), True),
    ]
)


def duplicate_summary(df: DataFrame, metrics: dict[str, list[str]]) -> dict[str, int]:
    """{metric: number of duplicate groups} — a group is a distinct
    value combination of the metric's columns occurring more than once
    (the reference counts duplicate GROUPS, not duplicate rows:
    duplicate_auditor.py returns one report entry per group and the
    reporter takes ``len(...)``)."""
    out: dict[str, int] = {}
    for name, cols in metrics.items():
        out[name] = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count()
        )
    return out


def step_warnings(
    origin: str | None,
    before: dict[str, int],
    after: dict[str, int],
) -> list[dict[str, Any]]:
    """Reference-equal diff semantics (etl_flow_reporter.py:108-134):
    one warning per metric whose duplicate-group count INCREASED; a
    metric absent from ``before`` counts as 0 (a brand-new duplicate
    class is itself a regression)."""
    warnings = []
    for metric, after_count in after.items():
        before_count = before.get(metric, 0)
        if after_count <= before_count:
            continue
        warnings.append(
            {
                "source": origin or "unknown",
                "severity": "warning",
                "code": "duplicate_count_increased",
                "metric": metric,
                "before": before_count,
                "after": after_count,
                "count": after_count - before_count,
                "message": (
                    f"Duplicate groups for {metric} increased from "
                    f"{before_count} to {after_count}."
                ),
            }
        )
    return warnings


class StepAuditor:
    """Persistent step-over-step duplicate auditor for one pipeline.

    ``record_step`` snapshots the summary for a step; ``diff`` compares
    any step against the previous recorded step and returns the
    reference-shaped warning list.  Snapshots live in a small audit
    lake table under ``<root>/audits`` (created lazily so existing
    pipelines gain auditing without migration), written with the
    driver-side ``append_rows`` fast path — recording a step costs the
    metric aggregations and nothing else."""

    def __init__(self, root: str):
        import os

        path = os.path.join(root, "audits")
        self.table = (
            LakeTable.load(path)
            if LakeTable.exists(path)
            else LakeTable.create(path, AUDIT_SCHEMA)
        )
        # additive migration for audit tables recorded before the seq
        # column existed (their old rows read back as seq=null → oldest)
        if "seq" not in {f.name for f in self.table.schema().fields}:
            self.table.evolve_schema(AUDIT_SCHEMA, operation="evolve(audit-seq)")

    def record_step(
        self,
        step_id: int,
        origin: str,
        df: DataFrame,
        metrics: dict[str, list[str]],
    ) -> dict[str, int]:
        summary = duplicate_summary(df, metrics)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        seq = int(self.table.snapshot()["version"]) + 1  # version this append creates
        self.table.append_rows(
            [
                {
                    "step_id": step_id,
                    "origin": origin,
                    "metric": m,
                    "dup_groups": n,
                    "created_at": now,
                    "seq": seq,
                }
                for m, n in summary.items()
            ],
            operation=f"audit(step={step_id})",
        )
        return summary

    def _summary_at(self, spark: SparkSession, step_id: int) -> dict[str, int] | None:
        """Latest recording wins per (step, metric): a retried step
        re-records with corrected counts and the stale rows must never
        be picked (they would make diff() nondeterministic)."""
        rows = (
            self.table.read(spark)
            .filter(F.col("step_id") == step_id)
            .select("metric", "dup_groups", "seq", "created_at")
            .collect()
        )
        if not rows:
            return None
        # Tiebreak rank: commit-version seq first; for pre-migration
        # rows (seq=null → -1, which can TIE across a legacy retry)
        # fall back to created_at so legacy reads stay deterministic
        # instead of depending on collect() partition order.
        best: dict[str, tuple[tuple, int]] = {}
        for r in rows:
            seq = -1 if r["seq"] is None else int(r["seq"])
            created = r["created_at"].isoformat() if r["created_at"] else ""
            rank = (seq, created)
            if r["metric"] not in best or rank > best[r["metric"]][0]:
                best[r["metric"]] = (rank, int(r["dup_groups"]))
        return {m: n for m, (_, n) in best.items()}

    def diff(self, spark: SparkSession, step_id: int, origin: str | None = None) -> list[dict[str, Any]]:
        """Warnings for ``step_id`` vs the latest earlier recorded step
        (steps may be sparse — phases can skip auditing).  The first
        recorded step has no baseline and yields no warnings, matching
        the reference (its first snapshot is the pre-pipeline state)."""
        after = self._summary_at(spark, step_id)
        if after is None:
            return []
        prev_ids = [
            r["step_id"]
            for r in self.table.read(spark)
            .filter(F.col("step_id") < step_id)
            .select("step_id")
            .distinct()
            .collect()
        ]
        if not prev_ids:
            return []
        before = self._summary_at(spark, max(prev_ids)) or {}
        origin = origin or f"step_{step_id}"
        return step_warnings(origin, before, after)
