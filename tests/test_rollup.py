"""Incremental derived-aggregate (rollup) maintenance — the A3
aggregate-then-merge analogue (reference recomputes parent rollups
after each ingest, project_loader.py:135-257) done incrementally from
change images, with exactly-once extending to the derived table."""

from __future__ import annotations

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch, replay
from horizon_etl_spark.cdc.generator import change_feed


def _recomputed(pipe, spark):
    return (
        pipe.target.read(spark)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


def _assert_rollup_consistent(pipe, spark):
    actual = pipe.rollup.read(spark)
    expected = _recomputed(pipe, spark)
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0


def test_rollup_matches_recompute_across_batches(spark, tmp_table_dir):
    feed = change_feed(spark, 4000, 300, seed=7, num_batches=3, max_len=32)
    pipe = CdcPipeline.create(f"{tmp_table_dir}/pipe")
    replay(pipe, feed, with_rollup=True)
    _assert_rollup_consistent(pipe, spark)
    assert pipe.rollup.read(spark).count() > 0


def test_rollup_redelivery_is_noop(spark, tmp_table_dir):
    feed = change_feed(spark, 2000, 150, seed=8, num_batches=2, max_len=32)
    pipe = CdcPipeline.create(f"{tmp_table_dir}/pipe")
    b0 = feed.filter(F.col("batch") == 0)
    b1 = feed.filter(F.col("batch") == 1)
    apply_batch(pipe, b0, batch_id=0, with_rollup=True)
    apply_batch(pipe, b1, batch_id=1, with_rollup=True)
    snap = sorted(tuple(r) for r in pipe.rollup.read(spark).collect())
    # re-deliver batch 0: every change reports skipped_stale → zero delta
    apply_batch(pipe, b0, batch_id=0, with_rollup=True)
    again = sorted(tuple(r) for r in pipe.rollup.read(spark).collect())
    assert snap == again
    _assert_rollup_consistent(pipe, spark)


def test_rollup_recovers_from_crash_between_commits(spark, tmp_table_dir):
    """Crash window: target merge committed but the rollup overwrite
    didn't (the two commits are not atomic).  On redelivery every
    change image reports skipped_stale (zero delta), so incremental
    folding alone would lose the batch forever; the synced-version
    check in the rollup props must detect the lag and rebuild."""
    feed = change_feed(spark, 2000, 150, seed=11, num_batches=2, max_len=32)
    pipe = CdcPipeline.create(f"{tmp_table_dir}/pipe")
    b0 = feed.filter(F.col("batch") == 0)
    b1 = feed.filter(F.col("batch") == 1)
    apply_batch(pipe, b0, batch_id=0, with_rollup=True)
    # simulate the crash: batch 1's merge commits, rollup update is lost
    apply_batch(pipe, b1, batch_id=1, with_rollup=False)
    # foreachBatch redelivers batch 1 after restart
    apply_batch(pipe, b1, batch_id=1, with_rollup=True)
    _assert_rollup_consistent(pipe, spark)


def test_rollup_enabled_late_backfills(spark, tmp_table_dir):
    """Turning with_rollup on mid-stream must not silently produce a
    rollup that reflects only post-enable batches."""
    feed = change_feed(spark, 2000, 150, seed=12, num_batches=2, max_len=32)
    pipe = CdcPipeline.create(f"{tmp_table_dir}/pipe")
    apply_batch(pipe, feed.filter(F.col("batch") == 0), batch_id=0, with_rollup=False)
    apply_batch(pipe, feed.filter(F.col("batch") == 1), batch_id=1, with_rollup=True)
    _assert_rollup_consistent(pipe, spark)


def test_rollup_handles_deletes(spark, tmp_table_dir):
    feed = change_feed(spark, 3000, 100, seed=9, num_batches=1, delete_frac=0.4, max_len=16)
    pipe = CdcPipeline.create(f"{tmp_table_dir}/pipe")
    replay(pipe, feed, with_rollup=True)
    _assert_rollup_consistent(pipe, spark)
