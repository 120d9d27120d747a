"""Pure-DataFrame oracle for final-state equality (FIXTURES.md §5).

``expected_final(feed)`` computes the per-key max-lsn non-delete event
without any streaming/merge machinery; every replay strategy the engine
supports must converge to exactly this table (reference replay
semantics: ``make full-refresh`` reproduces state,
/root/reference/README.md:219-223, and the strict repro scripts
/root/reference/src/scripts/repro_ingest_strict.py:21-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from horizon_etl_spark.cdc.lww import lww_reduce
from horizon_etl_spark.cdc.validate import split_valid


def expected_final(feed: DataFrame, payload_cols: list[str] | None = None) -> DataFrame:
    """Final table state implied by the whole change feed."""
    valid, _ = split_valid(feed)
    winners = lww_reduce(valid.drop("batch") if "batch" in valid.columns else valid)
    payload_cols = payload_cols or [
        c for c in winners.columns if c not in ("op", "ts", "batch", "lsn")
    ]
    return winners.filter(F.col("op") != "delete").select(*payload_cols)


def assert_frames_equal(actual: DataFrame, expected: DataFrame, key: str = "doc_id") -> None:
    """Order-insensitive row equality, order-sensitive inside arrays
    (token-array-equality invariant).  Raises AssertionError with a
    small diff sample on mismatch."""
    a_cols = sorted(actual.columns)
    e_cols = sorted(expected.columns)
    assert a_cols == e_cols, f"column mismatch: {a_cols} != {e_cols}"
    a = actual.select(*a_cols)
    e = expected.select(*e_cols)
    extra = a.exceptAll(e)
    missing = e.exceptAll(a)
    n_extra, n_missing = extra.count(), missing.count()
    if n_extra or n_missing:
        sample_extra = [r.asDict() for r in extra.limit(3).collect()]
        sample_missing = [r.asDict() for r in missing.limit(3).collect()]
        raise AssertionError(
            f"state mismatch: {n_extra} unexpected rows, {n_missing} missing rows; "
            f"extra sample={sample_extra}; missing sample={sample_missing}"
        )
