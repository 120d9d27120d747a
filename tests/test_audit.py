"""Step-over-step duplicate-audit diffs: warnings fire exactly when a
step INCREASES a metric's duplicate-group count (reference semantics,
etl_flow_reporter.py:108-134), persist across auditor reloads, and the
first step never warns (no baseline)."""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.audit import (
    StepAuditor,
    duplicate_summary,
    step_warnings,
)

METRICS = {
    "name_dups": ["name"],
    "email_dups": ["email"],
}


def _people(spark, rows):
    return spark.createDataFrame(rows, "name string, email string")


def test_duplicate_summary_counts_groups_not_rows(spark):
    df = _people(
        spark,
        [
            ("ana", "a@x"),
            ("ana", "a2@x"),
            ("ana", "a3@x"),  # one name group (3 rows)
            ("bia", "b@x"),
            ("bia", "b@x"),  # one name group AND one email group
            ("caio", "c@x"),
        ],
    )
    assert duplicate_summary(df, METRICS) == {"name_dups": 2, "email_dups": 1}


def test_step_warnings_reference_semantics():
    before = {"name_dups": 2, "email_dups": 1}
    # decrease + flat → silent; increase → one warning with before/after/delta
    assert step_warnings("load", before, {"name_dups": 1, "email_dups": 1}) == []
    w = step_warnings("load", before, {"name_dups": 4, "email_dups": 1})
    assert len(w) == 1 and w[0]["code"] == "duplicate_count_increased"
    assert (w[0]["metric"], w[0]["before"], w[0]["after"], w[0]["count"]) == (
        "name_dups", 2, 4, 2,
    )
    # a metric first seen with duplicates is a regression from 0
    w2 = step_warnings(None, {}, {"name_dups": 1})
    assert w2[0]["before"] == 0 and w2[0]["source"] == "unknown"


def test_step_auditor_diffs_consecutive_steps(spark, tmp_table_dir):
    root = os.path.join(tmp_table_dir, "pipe")
    aud = StepAuditor(root)

    clean = _people(spark, [("ana", "a@x"), ("bia", "b@x")])
    dup = _people(spark, [("ana", "a@x"), ("ana", "a2@x"), ("bia", "b@x")])

    aud.record_step(0, "extract", clean, METRICS)
    assert aud.diff(spark, 0) == []  # first step: no baseline

    aud.record_step(1, "merge_members", dup, METRICS)
    w = aud.diff(spark, 1, origin="merge_members")
    assert len(w) == 1
    assert w[0]["metric"] == "name_dups" and w[0]["source"] == "merge_members"
    assert w[0]["before"] == 0 and w[0]["after"] == 1

    # a later step that FIXES the dups is silent, even with a gap in ids
    aud.record_step(5, "dedup", clean, METRICS)
    assert aud.diff(spark, 5) == []

    # snapshots persist: a reloaded auditor sees the same history
    aud2 = StepAuditor(root)
    assert aud2.diff(spark, 1, origin="merge_members") == w


def test_retried_step_rerecord_wins_deterministically(spark, tmp_table_dir):
    """A retried step re-records the same step_id with corrected
    counts; diff() must always see the LATEST recording, never a
    partition-order-dependent stale row."""
    aud = StepAuditor(tmp_table_dir)
    aud.record_step(1, "load", _people(spark, [("a", "x"), ("b", "y")]), METRICS)
    # first (failed) attempt at step 2 saw bad data: 1 name-dup group
    aud.record_step(
        2, "enrich",
        _people(spark, [("a", "x"), ("a", "y"), ("b", "z")]), METRICS,
    )
    # retry of step 2 after the fix: no duplicates
    aud.record_step(
        2, "enrich",
        _people(spark, [("a", "x"), ("b", "y"), ("c", "z")]), METRICS,
    )
    assert aud.diff(spark, 2) == []  # latest recording wins → no warning
    assert aud._summary_at(spark, 2) == {"name_dups": 0, "email_dups": 0}
    # and a later step diffs against the RETRIED step-2 counts
    aud.record_step(
        3, "merge",
        _people(spark, [("a", "x"), ("a", "y")]), METRICS,
    )
    warns = aud.diff(spark, 3)
    assert [w["code"] for w in warns] == ["duplicate_count_increased"]
    assert warns[0]["before"] == 0 and warns[0]["after"] == 1


def test_legacy_null_seq_rows_tiebreak_on_created_at(spark, tmp_table_dir):
    """Audit tables recorded before the seq column existed read back
    seq=null for ALL rows — a legacy retried step therefore TIES on
    seq and must fall back to created_at, not collect() partition
    order, to pick the latest recording."""
    from datetime import datetime

    aud = StepAuditor(tmp_table_dir)
    early = datetime(2026, 1, 1, 10, 0, 0)
    late = datetime(2026, 1, 1, 11, 0, 0)
    aud.table.append_rows(
        [
            {"step_id": 2, "origin": "enrich", "metric": "name_dups",
             "dup_groups": 7, "created_at": early, "seq": None},
            {"step_id": 2, "origin": "enrich", "metric": "name_dups",
             "dup_groups": 0, "created_at": late, "seq": None},
        ],
        operation="audit(legacy)",
    )
    for _ in range(3):  # stable across repeated reads
        assert aud._summary_at(spark, 2) == {"name_dups": 0}
