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


def test_chaos_evolution_restart_out_of_order_stream(spark, tmp_table_dir):
    """Everything at once: streamed file drops arriving OUT OF ORDER
    (newest lsn-range file first), schema evolution mid-stream (the
    lang column appears only in later-lsn events), a checkpoint restart
    between drops, and a duplicate re-drop of an already-processed
    file.  Final state must still equal the whole-feed oracle."""
    from horizon_etl_spark.streaming.runner import run_stream

    feed = evolved_feed(spark, 3000, 150, num_batches=3)
    src = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)

    def drop(df):
        df.coalesce(1).write.mode("append").parquet(src)

    # the evolved (v2) feed schema is registered up front — a live
    # tail cannot discover new columns mid-stream (see run_stream doc)
    v2_schema = feed.drop("batch").schema
    b = {i: feed.filter(F.col("batch") == i).drop("batch") for i in range(3)}
    # newest events first (evolved column present before older events),
    # older pre-evolution events arrive later
    drop(b[2].select(*b[2].columns))
    run_stream(spark, pipe, src, ckpt, max_files_per_trigger=1, feed_schema=v2_schema)
    assert "lang" in pipe.target.read(spark).columns

    # restart with the same checkpoint: drop the OLD events + a
    # duplicate re-drop of the newest file's content
    drop(b[0])
    drop(b[1])
    drop(b[2])
    run_stream(spark, pipe, src, ckpt, max_files_per_trigger=1, feed_schema=v2_schema)

    assert_frames_equal(pipe.target.read(spark), expected_final(feed))
    # counts reconcile across all micro-batches
    runs = pipe.runs.read(spark).collect()
    total_in = sum(r["input_rows"] for r in runs)
    total_accounted = sum(
        r["applied"] + r["deduped"] + r["quarantined"]
        + r["skipped_stale"] + r["delete_noop"]
        for r in runs
    )
    assert total_in == total_accounted


def test_evolved_column_is_forced_nullable(spark, tmp_table_dir):
    """A new column arriving as a non-nullable field (e.g. F.lit)
    must be appended NULLABLE: old files scan it as null, and a
    non-null table schema would let Catalyst fold isNotNull filters
    to true over pre-evolution rows."""
    from pyspark.sql.types import StructField, StructType

    from horizon_etl_spark.tables import lake as L

    feed = evolved_feed(spark, 500, 50, num_batches=2)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    from horizon_etl_spark.cdc.apply import apply_batch

    apply_batch(pipe, feed.filter(F.col("batch") == 0).drop("batch", "lang"), 0)
    snap = pipe.target.snapshot()
    old_schema = StructType.fromJson(snap["schema"])
    evolved = StructType(
        old_schema.fields + [StructField("derived", L.LongType(), False)]
    )
    pipe.target.evolve_schema(evolved)
    new_field = StructType.fromJson(pipe.target.snapshot()["schema"])["derived"]
    assert new_field.nullable is True
    # old rows read the column as null AND the filter sees them as null
    out = pipe.target.read(spark)
    assert out.filter(F.col("derived").isNotNull()).count() == 0
    assert out.filter(F.col("derived").isNull()).count() == out.count()
