"""Outbox replication: a read replica maintained PURELY from exported
change-log deltas must converge to the primary's exact state — across
partial updates, full-row updates, deletes, out-of-order history, AND
primary-side schema evolution — and re-applying any delta must be a
no-op (crash-safe consumer)."""

import os

import pytest
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


def _evolved_feed(spark, n, keys, seed, batches):
    """Attr feed whose update events also assert two post-creation
    container columns: ``langs: array<string>`` (the type whose plain
    string cast does NOT round-trip — the hard case, with commas and
    quotes inside elements) and a nested ``meta struct<a:int,b:string>``
    (the struct round-trip witness)."""
    feed = change_feed(spark, n, keys, seed=seed, num_batches=batches, max_len=8)
    m = F.pmod(F.xxhash64("lsn"), F.lit(3))
    is_del = F.col("op") == "delete"
    fields = (
        F.when(is_del, F.lit(None).cast("array<string>"))
        .when(m == 0, F.lit(None).cast("array<string>"))  # full-row: all cols
        .when(
            m == 1,
            F.array(F.lit("tokens"), F.lit("n_tok"), F.lit("langs"), F.lit("meta")),
        )
        .otherwise(F.array(F.lit("source")))
    )
    langs = F.when(
        ~is_del,
        F.array(F.lit("pt, BR"), F.concat(F.lit('l"x'), F.col("lsn").cast("string"))),
    )
    meta = F.when(
        ~is_del,
        F.struct(
            F.pmod(F.col("lsn"), F.lit(97)).cast("int").alias("a"),
            F.concat(F.lit('q"'), F.col("lsn").cast("string")).alias("b"),
        ),
    )
    return (
        feed.withColumn("fields", fields)
        .withColumn("langs", langs)
        .withColumn("meta", meta)
    )


def test_replica_evolves_with_primary_and_roundtrips_string_arrays(
    spark, tmp_table_dir
):
    """Primary gains an array<string> payload column MID-STREAM (after
    the replica was created): the delta manifest's target_schema must
    carry the new column into the replica via merge_attrs
    auto-evolution, the JSON-encoded log values must round-trip the
    string arrays exactly (including commas and quotes inside
    elements), and a multi-delta backlog must catch up in ONE merge."""
    base = _attr_feed(spark, 2500, 200, seed=73, batches=3)
    evolved = _evolved_feed(spark, 2500, 200, seed=73, batches=3)
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

    # batch 0 on the creation-time schema; replica in sync
    apply_batch(pipe, base.filter(F.col("batch") == 0).drop("batch"), batch_id=0)
    export_changes(spark, pipe.change_log, out, "changes", target=pipe.target)
    replicate_from_outbox(spark, out, "changes", replica)
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))

    # batches 1-2 carry the new column; two deltas pile up unconsumed
    for b in (1, 2):
        apply_batch(
            pipe, evolved.filter(F.col("batch") == b).drop("batch"), batch_id=b
        )
        export_changes(spark, pipe.change_log, out, "changes", target=pipe.target)

    v_before = replica.current_version()
    r = replicate_from_outbox(spark, out, "changes", replica)
    assert len(r["applied_deltas"]) == 2
    # single-merge catch-up: ≤ evolve + merge + cursor commits for the
    # WHOLE backlog, never one merge per delta
    assert replica.current_version() - v_before <= 3
    names = [f.name for f in replica.schema().fields]
    assert "langs" in names and "meta" in names
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))
    assert dict(replica.read(spark).select("doc_id", "langs").collect()) == dict(
        pipe.target.read(spark).select("doc_id", "langs").collect()
    )
    assert dict(replica.read(spark).select("doc_id", "meta").collect()) == dict(
        pipe.target.read(spark).select("doc_id", "meta").collect()
    )

    # idempotent re-apply of the evolved backlog is still a no-op
    replica.set_props({"outbox_applied_to": 0})
    replicate_from_outbox(spark, out, "changes", replica)
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))


def test_replica_unknown_column_hard_fails_without_manifest_schema(
    spark, tmp_table_dir
):
    """Deltas published WITHOUT target= have no schema registry entry;
    assertions for a primary-side new column must raise — never be
    silently dropped with the cursor advancing (that loss would be
    permanent) — and the cursor must stay put so a fixed publisher or a
    resync can still recover."""
    base = _attr_feed(spark, 1500, 120, seed=91, batches=2)
    evolved = _evolved_feed(spark, 1500, 120, seed=91, batches=2)
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

    apply_batch(pipe, base.filter(F.col("batch") == 0).drop("batch"), batch_id=0)
    export_changes(spark, pipe.change_log, out, "changes")  # no target=
    r1 = replicate_from_outbox(spark, out, "changes", replica)
    assert_frames_equal(replica.read(spark), pipe.target.read(spark))

    apply_batch(pipe, evolved.filter(F.col("batch") == 1).drop("batch"), batch_id=1)
    export_changes(spark, pipe.change_log, out, "changes")  # no target=
    with pytest.raises(ValueError, match="unknown"):
        replicate_from_outbox(spark, out, "changes", replica)
    assert int(replica.props["outbox_applied_to"]) == r1["cursor"]
    # a re-publish flow with the manifest schema recovers the SAME deltas
    # is covered by the evolution test; here we just assert no divergence
    assert "langs" not in [f.name for f in replica.schema().fields]

def test_gap_in_delta_chain_hard_fails(spark, tmp_table_dir):
    """A delta artifact missing from the MIDDLE of the pending chain
    (deleted/GC'd exports dir) must raise, not be silently skipped with
    the cursor advancing past it — that would be permanent divergence,
    the same failure class as the unknown-column guard."""
    import shutil

    feed = _attr_feed(spark, 1200, 100, seed=47, batches=3)
    pipe = CdcPipeline.create(
        os.path.join(tmp_table_dir, "primary"), bucket_count=4, attr_lww=True
    )
    out = os.path.join(tmp_table_dir, "exports")
    replica = LakeTable.create(
        os.path.join(tmp_table_dir, "replica"),
        S.TARGET_SCHEMA,
        key_col="doc_id",
        bucket_count=4,
        attr_lww=True,
    )
    deltas = []
    for b in range(3):
        apply_batch(pipe, feed.filter(F.col("batch") == b).drop("batch"), batch_id=b)
        r = export_changes(spark, pipe.change_log, out, "changes")
        deltas.append(r)
    # consume the first delta, then lose the SECOND from the chain
    replica.set_props({"outbox_applied_to": deltas[0]["to_version"]})
    middle = f"changes_{deltas[1]['from_version']:08d}_{deltas[1]['to_version']:08d}"
    os.unlink(os.path.join(out, middle))
    v = replica.current_version()
    with pytest.raises(ValueError, match="gap"):
        replicate_from_outbox(spark, out, "changes", replica)
    # nothing applied, cursor unchanged
    assert replica.current_version() == v
    assert int(replica.props["outbox_applied_to"]) == deltas[0]["to_version"]
