"""Outbox replication consumer: maintain a READ REPLICA of an
attr-LWW pipeline purely from its exported change-log delta artifacts
— the downstream half of the outbox contract (`exports.export_changes`
publishes, this module consumes).

Why it is correct: the attr change log records exactly the APPLIED
per-(key, column) assertion moves ('set' with value+lsn) and delete
retractions ('unset' at the delete watermark) — nothing the primary
rejected is ever logged, and everything it accepted is.  Pending
deltas are mapped back onto attr change events (one 'update' per
(key, lsn) asserting the logged columns, one 'delete' per retraction
watermark) and folded through the SAME attr-LWW kernel the primary
runs (`attrs.attr_lww_reduce` → `LakeTable.merge_attrs`).  Because
that fold is commutative/associative/idempotent with lsn guards, the
replica converges to the primary's exact state regardless of delta
boundaries, re-delivery, or crash re-runs — replaying a delta twice
is a no-op, the same guarantee the primary's ingest has.  The same
property lets a whole BACKLOG of deltas union into ONE merge per
catch-up cycle: the cycle runs O(1) Spark jobs however far behind the
replica is, never one merge commit per delta.

Schema evolution: the primary's merge auto-evolves its target when a
batch carries new payload columns (lake.py merge_attrs), and the delta
manifest carries the primary target's schema at publish time
(`export_changes(..., target=...)` — the outbox's schema registry,
the role a Debezium envelope's schema block plays).  The consumer
builds its event columns from the REPLICA's schema ∪ the manifests'
payload fields, so a column added on the primary mid-stream lands on
the replica through the same `merge_attrs` auto-evolution in the
cycle that first references it.  Assertions for a column known to
NEITHER source are a hard error, never a silent drop — dropping one
while advancing the cursor would be permanent divergence.

Scale story: replication cost is O(changes), never O(table) — the
pending deltas form one bounded feed through one single-shuffle merge;
at 100 TB the replica pays exactly what the primary's tail batches
paid, not a nightly full copy.

Typed round trip: logged values ride as strings (heterogeneous
columns share one sink); atomic columns cast back, container columns
— including ``array<string>`` — are JSON-encoded by ``to_json`` at
log-write time (lake.py merge_attrs) and parse back exactly via
``from_json``.

Reference analogue: the reference has no replica path (each consumer
re-reads the full canonical export,
/root/reference/src/core/logic/canonical_exporter.py:2003-2056) and
applies guarded additive migrations to every consumer schema
(/root/reference/src/db/migrations.py:19-58); this is the scale-path
replacement, same spirit as Kafka-Connect sinks applying a Debezium
stream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructField, StructType

from horizon_etl_spark.cdc.attrs import attr_lww_reduce
from horizon_etl_spark.exports import (
    export_manifest,
    list_change_exports,
    read_export,
)
from horizon_etl_spark.tables.lake import (
    ALSN_PREFIX,
    DEL_LSN_COL,
    LSN_COL,
    TOMBSTONE_COL,
    LakeTable,
)

_META = {LSN_COL, TOMBSTONE_COL, DEL_LSN_COL}


def _is_payload(name: str) -> bool:
    return name not in _META and not name.startswith(ALSN_PREFIX)


def _payload_fields(table: LakeTable) -> list[StructField]:
    schema = StructType.fromJson(table.snapshot()["schema"])
    return [f for f in schema.fields if _is_payload(f.name)]


def _typed(col: F.Column, dt) -> F.Column:
    # containers were JSON-encoded at log-write time (lake.py to_json);
    # from_json is the exact inverse for every container type
    if isinstance(dt, (ArrayType, MapType, StructType)):
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
    ``out_dir`` to ``replica`` (an attr-LWW keyed LakeTable seeded with
    the primary target's payload schema), as ONE catch-up merge.

    The whole pending backlog unions into a single ``merge_attrs`` —
    safe because the attr-LWW fold is commutative/associative/
    idempotent, so delta boundaries cannot change the result — and the
    cycle therefore runs O(1) Spark jobs regardless of backlog depth.

    Event columns come from the replica's schema ∪ each pending
    manifest's ``target_schema`` payload fields, so primary-side column
    adds auto-evolve the replica (via merge_attrs) in the first cycle
    that sees them.  Logged assertions for a column in NEITHER source
    raise instead of silently dropping (a drop + cursor advance would
    be permanent divergence; the fix is to publish deltas with
    ``export_changes(..., target=primary_target)`` or resync).

    The consumer cursor lives in the REPLICA's table props
    (``outbox_applied_to``) — a crash between the catch-up merge
    commit and the cursor commit re-applies those deltas on the next
    run, which the lsn-guarded fold makes a no-op.  Returns per-run
    evidence."""
    cursor = int(replica.props.get("outbox_applied_to", 0))
    pending: list[tuple[str, int, int]] = []
    for dname in list_change_exports(out_dir, name):
        parts = dname.rsplit("_", 2)
        from_v, to_v = int(parts[-2]), int(parts[-1])
        if to_v > cursor:
            pending.append((dname, from_v, to_v))
    pending.sort(key=lambda t: t[2])
    # contiguity guard: the pending deltas must chain gaplessly from the
    # cursor — a delta artifact deleted/GC'd out of the middle would
    # otherwise be SILENTLY skipped while the cursor advances past it,
    # permanent replica divergence (the same failure class the
    # unknown-column guard below hard-fails on).  from_v==1 is the
    # table-create commit, so a fresh replica (cursor 0) starts there.
    expect = max(cursor, 1)
    for dname, from_v, _to_v in pending:
        if from_v > expect:
            raise ValueError(
                f"outbox delta chain has a gap: next pending delta "
                f"{dname!r} starts at version {from_v} but the replica "
                f"has only applied up to {expect}; the covering delta "
                f"artifact is missing (deleted/GC'd?) — resync the "
                f"replica from a full export"
            )
        expect = _to_v
    if not pending:
        return {
            "applied_deltas": [],
            "change_rows": 0,
            "cursor": cursor,
            "replica_version": replica.current_version(),
        }

    key = replica.snapshot()["key_col"]
    fields: dict[str, StructField] = {f.name: f for f in _payload_fields(replica)}
    for dname, _f, _t in pending:
        ts_json = export_manifest(out_dir, dname).get("target_schema")
        if ts_json:
            for f in StructType.fromJson(ts_json).fields:
                if _is_payload(f.name) and f.name not in fields:
                    fields[f.name] = f

    delta: DataFrame | None = None
    for dname, _f, _t in pending:
        d = read_export(spark, out_dir, dname, fmt)
        delta = d if delta is None else delta.unionByName(d, allowMissingColumns=True)

    # one O(distinct columns) agg: backlog size + unknown-column guard
    stats = delta.agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("column").alias("cols")
    ).collect()[0]
    unknown = sorted(set(stats["cols"]) - set(fields))
    if unknown:
        raise ValueError(
            f"outbox deltas assert columns unknown to both the replica and "
            f"the delta manifests: {unknown}; publish deltas with "
            f"export_changes(..., target=<primary target>) so the manifest "
            f"carries the evolved schema, or resync the replica from a full "
            f"export"
        )

    events = delta_to_attr_events(delta, list(fields.values()), key=key)
    replica.merge_attrs(attr_lww_reduce(events, key=key))
    to_v = max(v for _d, _f, v in pending)
    replica.set_props({"outbox_applied_to": to_v})
    return {
        "applied_deltas": [d for d, _f, _t in pending],
        "change_rows": int(stats["n"]),
        "cursor": to_v,
        "replica_version": replica.current_version(),
    }
