"""Outbox replication consumer: maintain a READ REPLICA of an
attr-LWW pipeline purely from its exported change-log delta artifacts
— the downstream half of the outbox contract (`exports.export_changes`
publishes, this module consumes).

Why it is correct: the attr change log records exactly the APPLIED
per-(key, column) assertion moves ('set' with value+lsn) and delete
retractions ('unset' at the delete watermark) — nothing the primary
rejected is ever logged, and everything it accepted is.  Each delta is
mapped back onto attr change events (one 'update' per (key, lsn)
asserting the logged columns, one 'delete' per retraction watermark)
and folded through the SAME attr-LWW kernel the primary runs
(`attrs.attr_lww_reduce` → `LakeTable.merge_attrs`).  Because that
fold is commutative/associative/idempotent with lsn guards, the
replica converges to the primary's exact state regardless of delta
boundaries, re-delivery, or crash re-runs — replaying a delta twice
is a no-op, the same guarantee the primary's ingest has.

Scale story: replication cost is O(changes), never O(table) — each
delta is a bounded feed through the same single-shuffle merge;
at 100 TB the replica pays exactly what the primary's tail batches
paid, not a nightly full copy.

Typed round trip: logged values ride as strings (heterogeneous
columns share one sink); atomic columns cast back, container columns
parse via ``from_json`` — exact for the engine's payload (numeric
arrays; Spark renders ``array<int>`` as ``[1, 2, 3]``, which IS the
JSON form).  A container of unquoted strings would not round-trip and
is rejected at event-build time rather than corrupted silently.

Reference analogue: the reference has no replica path (each consumer
re-reads the full canonical export,
/root/reference/src/core/logic/canonical_exporter.py:2003-2056); this
is the scale-path replacement, same spirit as Kafka-Connect sinks
applying a Debezium stream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType, StructType

from horizon_etl_spark.cdc.attrs import attr_lww_reduce
from horizon_etl_spark.exports import list_change_exports, read_export
from horizon_etl_spark.tables.lake import (
    ALSN_PREFIX,
    DEL_LSN_COL,
    LSN_COL,
    TOMBSTONE_COL,
    LakeTable,
)

_META = {LSN_COL, TOMBSTONE_COL, DEL_LSN_COL}


def _payload_fields(table: LakeTable) -> list:
    schema = StructType.fromJson(table.snapshot()["schema"])
    return [
        f
        for f in schema.fields
        if f.name not in _META and not f.name.startswith(ALSN_PREFIX)
    ]


def _typed(col: F.Column, dt) -> F.Column:
    if isinstance(dt, (ArrayType, MapType, StructType)):
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StringType):
            raise ValueError(
                "array<string> payload columns do not round-trip through the "
                "string-typed change log (unquoted elements); store them as "
                "JSON strings or atomic columns"
            )
        return F.from_json(col, dt)
    return col.cast(dt)


def delta_to_attr_events(delta: DataFrame, payload_fields: list, key: str = "doc_id") -> DataFrame:
    """Map LONG-format attr change rows back onto attr change events.

    'set' rows group by (key, lsn) into one partial-update event whose
    ``fields`` are exactly the logged columns (value-null vs missing is
    disambiguated by ``fields``, so a logged explicit-null assertion is
    preserved).  'unset' rows collapse to one delete event per
    retraction watermark.  Duplicate (key, column, lsn) set rows cannot
    occur: the log only records assertion lsns that MOVED, and
    redelivered batches append nothing."""
    kv = F.map_from_entries(F.collect_list(F.struct("column", "after_value")))
    sets = (
        delta.filter(F.col("op_applied") == "set")
        .groupBy(key, "lsn")
        .agg(kv.alias("_kv"))
        .select(
            F.lit("update").alias("op"),
            F.col(key),
            F.col("lsn"),
            *[
                _typed(F.col("_kv")[f.name], f.dataType).alias(f.name)
                for f in payload_fields
                if f.name != key
            ],
            F.lit(None).cast("timestamp").alias("ts"),
            F.map_keys(F.col("_kv")).alias("fields"),
        )
    )
    dels = (
        delta.filter(F.col("op_applied") == "unset")
        .select(key, "lsn")
        .distinct()
        .select(
            F.lit("delete").alias("op"),
            F.col(key),
            F.col("lsn"),
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in payload_fields
                if f.name != key
            ],
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("array<string>").alias("fields"),
        )
    )
    return sets.unionByName(dels)


def replicate_from_outbox(
    spark: SparkSession,
    out_dir: str,
    name: str,
    replica: LakeTable,
    fmt: str = "parquet",
) -> dict[str, Any]:
    """Apply every unconsumed outbox delta of ``name`` under
    ``out_dir`` to ``replica`` (an attr-LWW keyed LakeTable with the
    primary target's payload schema), in version order.

    The consumer cursor lives in the REPLICA's table props
    (``outbox_applied_to``) — a crash between a delta's merge commit
    and the cursor commit re-applies that delta on the next run, which
    the lsn-guarded fold makes a no-op.  Returns per-run evidence."""
    cursor = int(replica.props.get("outbox_applied_to", 0))
    payload = _payload_fields(replica)
    applied, events_total = [], 0
    for dname in list_change_exports(out_dir, name):
        from_v, to_v = (int(x) for x in dname.rsplit("_", 2)[-2:])
        if to_v <= cursor:
            continue
        delta = read_export(spark, out_dir, dname, fmt)
        events = delta_to_attr_events(delta, payload)
        replica.merge_attrs(attr_lww_reduce(events))
        replica.set_props({"outbox_applied_to": to_v})
        cursor = to_v
        applied.append(dname)
        events_total += delta.count()
    return {
        "applied_deltas": applied,
        "change_rows": events_total,
        "cursor": cursor,
        "replica_version": replica.current_version(),
    }
