"""Outbox replication: a read replica maintained PURELY from exported
change-log deltas must converge to the primary's exact state — across
partial updates, full-row updates, deletes, and out-of-order history —
and re-applying any delta must be a no-op (crash-safe consumer)."""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc import schema as S
from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch
from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.cdc.oracle import assert_frames_equal
from horizon_etl_spark.cdc.replicate import replicate_from_outbox
from horizon_etl_spark.exports import export_changes
from horizon_etl_spark.tables.lake import LakeTable


def _attr_feed(spark, n, keys, seed, batches):
    """Whole-row feed rewritten so ~2/3 of updates assert a column
    subset (same shape as the attr bench workload)."""
    feed = change_feed(spark, n, keys, seed=seed, num_batches=batches, max_len=8)
    m = F.pmod(F.xxhash64("lsn"), F.lit(3))
    fields = (
        F.when(F.col("op") == "delete", F.lit(None).cast("array<string>"))
        .when(m == 0, F.lit(None).cast("array<string>"))
        .when(m == 1, F.array(F.lit("tokens"), F.lit("n_tok")))
        .otherwise(F.array(F.lit("source")))
    )
    return feed.withColumn("fields", fields)


def test_replica_converges_from_outbox_deltas(spark, tmp_table_dir):
    feed = _attr_feed(spark, 4000, 250, seed=61, batches=3)
    pipe = CdcPipeline.create(
        os.path.join(tmp_table_dir, "primary"), bucket_count=8, attr_lww=True
    )
    out = os.path.join(tmp_table_dir, "exports")
    replica = LakeTable.create(
        os.path.join(tmp_table_dir, "replica"),
        S.TARGET_SCHEMA,
        key_col="doc_id",
        bucket_count=8,
        attr_lww=True,
    )

    # batches land on the primary; deltas publish at uneven cadence and
    # the replica catches up after each publish
    apply_batch(pipe, feed.filter(F.col("batch") == 0).drop("batch"), batch_id=0)
    export_changes(spark, pipe.change_log, out, "changes")
    r1 = replicate_from_outbox(spark, out, "changes", replica)
    assert len(r1["applied_deltas"]) == 1 and r1["change_rows"] > 0
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))

    for b in (1, 2):
        apply_batch(pipe, feed.filter(F.col("batch") == b).drop("batch"), batch_id=b)
    export_changes(spark, pipe.change_log, out, "changes")
    r2 = replicate_from_outbox(spark, out, "changes", replica)
    assert len(r2["applied_deltas"]) == 1
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))
    # typed round trip: token arrays survive the string-typed log
    assert dict(replica.read(spark).select("doc_id", "tokens").collect()) == dict(
        pipe.target.read(spark).select("doc_id", "tokens").collect()
    )

    # nothing new → consumer is a pure no-op (no commit at all)
    v = replica.current_version()
    r3 = replicate_from_outbox(spark, out, "changes", replica)
    assert r3["applied_deltas"] == [] and replica.current_version() == v

    # crash-safe: rewind the consumer cursor (as if the cursor commit
    # was lost) and re-apply the last delta — state must not change
    replica.set_props({"outbox_applied_to": r1["cursor"]})
    r4 = replicate_from_outbox(spark, out, "changes", replica)
    assert len(r4["applied_deltas"]) == 1
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))
