"""Additive schema evolution through the full apply path (FIXTURES.md §3)."""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, replay
from horizon_etl_spark.cdc.generator import evolved_feed
from horizon_etl_spark.cdc.oracle import assert_frames_equal, expected_final


def test_evolved_column_appears_and_backfills_null(spark, tmp_table_dir):
    feed = evolved_feed(spark, 2000, 100, num_batches=2)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    # batch 0 (no lang values), then batch 1 (lang appears) — the column
    # physically exists from the start here since the generator emits it;
    # ALSO test the stricter case: batch 0 without the column at all.
    b0 = feed.filter(F.col("batch") == 0).drop("batch", "lang")
    b1 = feed.filter(F.col("batch") == 1).drop("batch")
    from horizon_etl_spark.cdc.apply import apply_batch

    apply_batch(pipe, b0, 0)
    assert "lang" not in pipe.target.read(spark).columns
    apply_batch(pipe, b1, 1)
    out = pipe.target.read(spark)
    assert "lang" in out.columns
    # final state equals oracle computed over the full feed
    assert_frames_equal(out, expected_final(feed))
    # docs whose last event predates the lang column have null lang
    assert out.filter(F.col("lang").isNull()).count() > 0
    assert out.filter(F.col("lang").isNotNull()).count() > 0


def test_evolution_preserves_old_rows_without_rewrite(spark, tmp_table_dir):
    feed = evolved_feed(spark, 1000, 2000, num_batches=2)  # mostly inserts
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    runs = replay(pipe, feed)
    assert len(runs) == 2
    assert_frames_equal(pipe.target.read(spark), expected_final(feed))
