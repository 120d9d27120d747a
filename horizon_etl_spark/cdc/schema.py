"""Schemas for the CDC engine (FIXTURES.md §1-§4; BASELINE.json input_hint).

Target payload: pre-tokenized training sequences
  (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)
Change feed: binlog/WAL-style events keyed (doc_id, lsn).

Reference analogues: source_records identity/unique constraint
(/root/reference/src/tracking/entities/source_record.py:8-53) and the
entity change log (/root/reference/src/tracking/entities/entity_change_log.py:8-42).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SOURCE_WHITELIST = ("books", "code", "crawl", "wiki")

PAYLOAD_FIELDS = [
    StructField("doc_id", StringType(), False),
    StructField("tokens", ArrayType(IntegerType()), True),
    StructField("n_tok", IntegerType(), True),
    StructField("source", StringType(), True),
]

TARGET_SCHEMA = StructType(PAYLOAD_FIELDS)

CHANGE_FEED_SCHEMA = StructType(
    [
        StructField("op", StringType(), True),
        StructField("doc_id", StringType(), True),
        StructField("lsn", LongType(), True),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

QUARANTINE_SCHEMA = StructType(
    list(CHANGE_FEED_SCHEMA.fields)
    + [StructField("reason", StringType(), True), StructField("batch_id", LongType(), True)]
)

# Per-attribute (partial-update) feeds carry `fields`: the payload
# columns the event asserts (null = all, [] = none) — the columnar form
# of the reference's attribute_assertion rows
# (/root/reference/src/tracking/entities/attribute_assertion.py:8-44).
ATTR_CHANGE_FEED_SCHEMA = StructType(
    list(CHANGE_FEED_SCHEMA.fields)
    + [StructField("fields", ArrayType(StringType()), True)]
)

ATTR_QUARANTINE_SCHEMA = StructType(
    list(ATTR_CHANGE_FEED_SCHEMA.fields)
    + [StructField("reason", StringType(), True), StructField("batch_id", LongType(), True)]
)

RUNS_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), True),
        StructField("started_at", TimestampType(), True),
        StructField("finished_at", TimestampType(), True),
        StructField("status", StringType(), True),
        StructField("input_rows", LongType(), True),
        StructField("applied", LongType(), True),
        StructField("deduped", LongType(), True),
        StructField("quarantined", LongType(), True),
        StructField("skipped_stale", LongType(), True),
        StructField("delete_noop", LongType(), True),
        StructField("notes", StringType(), True),
        # JSON map of table -> snapshot version at batch completion;
        # the anchor rollback_to_batch() uses for coordinated
        # pipeline point-in-time rollback
        StructField("versions", StringType(), True),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), True),
        StructField("bucket_id", IntegerType(), True),
        StructField("rows_in", LongType(), True),
        StructField("distinct_keys", LongType(), True),
        StructField("max_key_rows", LongType(), True),
        StructField("winner_bytes", LongType(), True),
    ]
)

ROLLUP_SCHEMA = StructType(
    [
        StructField("source", StringType(), True),
        StructField("n_docs", LongType(), True),
        StructField("total_tokens", LongType(), True),
    ]
)

CHANGE_LOG_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("lsn", LongType(), True),
        StructField("op_applied", StringType(), True),
        StructField("before_n_tok", IntegerType(), True),
        StructField("before_source", StringType(), True),
        StructField("after_n_tok", IntegerType(), True),
        StructField("after_source", StringType(), True),
        StructField("batch_id", LongType(), True),
    ]
)

# Attr-mode lineage is LONG format — one row per applied attribute
# assertion / retraction, the columnar twin of the reference's
# attribute_assertion + entity_change_log rows
# (/root/reference/src/tracking/entities/attribute_assertion.py:8-44,
# /root/reference/src/tracking/entities/entity_change_log.py:8-42).
# Values are carried as strings (heterogeneous column types share one
# sink, like the reference's JSON before/after images).
ATTR_CHANGE_LOG_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("column", StringType(), True),
        StructField("lsn", LongType(), True),
        StructField("op_applied", StringType(), True),  # 'set' | 'unset'
        StructField("before_value", StringType(), True),
        StructField("after_value", StringType(), True),
        StructField("batch_id", LongType(), True),
    ]
)
