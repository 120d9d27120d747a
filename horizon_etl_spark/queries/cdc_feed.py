"""CDC semantics over the ``events`` testdata table.

``events`` (event_id, ts, user_id, event_type, value, props) is treated
as a binlog/WAL change feed: ``event_id`` is the monotonic lsn,
``user_id`` the entity key — exactly the reference's source-record →
canonical-entity model (/root/reference/src/tracking/entities/source_record.py:8-53).

``cdc_apply_events`` is the flagship: it derives a typed change feed
from the table, runs the REAL apply kernel (validate → quarantine →
dedup → LWW → MERGE into a lake table) over three micro-batches, and
returns the final table state — which the DuckDB oracle reproduces with
one window query.  This oracle-checks the engine itself, not just an
expression.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.queries.registry import register, table

_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    """Unique per-invocation scratch dir, removed at interpreter exit.
    A fixed path rmtree'd on entry would break the lazily-readable
    DataFrame returned by a previous call, so dirs live for the process
    lifetime and are GC'd atexit (no /tmp accumulation across repeated
    ``queries()`` invocations in one driver process)."""
    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )
    _SCRATCH_DIRS.append(d)
    return d

# event_type → (op, source) mapping used by both Spark and the oracle:
# 'purchase' → delete event; 'error' → non-whitelisted source (rows get
# quarantined, reference placeholder-source rule etl_flow_reporter.py:190-225).
_SRC_CASE = (
    "CASE event_type WHEN 'click' THEN 'crawl' WHEN 'view' THEN 'wiki' "
    "WHEN 'signup' THEN 'books' ELSE 'darkweb' END"
)


def events_as_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the typed change feed (op, doc_id, lsn, tokens, n_tok, source)."""
    e = table(spark, sf_dir, "events")
    is_del = F.col("event_type") == "purchase"
    src = (
        F.when(F.col("event_type") == "click", "crawl")
        .when(F.col("event_type") == "view", "wiki")
        .when(F.col("event_type") == "signup", "books")
        .otherwise("darkweb")
    )
    tokens = F.array(
        F.floor(F.col("value") * 100).cast("int"),
        (F.col("event_id") % 997).cast("int"),
    )
    return e.select(
        F.when(is_del, "delete").otherwise("update").alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_id").alias("lsn"),
        F.when(~is_del, tokens).alias("tokens"),
        F.when(~is_del, F.lit(2)).cast("int").alias("n_tok"),
        src.alias("source"),
        F.col("ts"),
    )


@register(
    "cdc_apply_events",
    oracle=f"""
    WITH feed AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS doc_id,
             event_id AS lsn,
             CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'update' END AS op,
             {_SRC_CASE} AS source,
             value
      FROM events
    ), valid AS (
      SELECT * FROM feed
      WHERE op = 'delete' OR source IN ('books','code','crawl','wiki')
    ), w AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
      FROM valid
    )
    SELECT doc_id,
           array_to_string([CAST(floor(value*100) AS INT), CAST(lsn % 997 AS INT)], ',') AS tokens_csv,
           CAST(2 AS INT) AS n_tok,
           source
    FROM w WHERE rn = 1 AND op <> 'delete'
    """,
)
def cdc_apply_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC apply (§3.1 lifecycle): three micro-batches split
    by lsn range, each validated/quarantined/deduped/LWW-reduced and
    MERGEd; returns the final target state.  The oracle is the pure
    window query — replay through the engine must equal it bit-for-bit
    (token-array-equality invariant).

    The token array is emitted as a canonical CSV string (``tokens_csv``)
    on both sides: the driver's canonicalizer sorts rows via pandas and
    cannot hash raw list cells."""
    from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch

    feed = events_as_feed(spark, sf_dir)
    lo, hi = feed.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    root = _scratch_dir("cdc_apply_events_")
    pipe = CdcPipeline.create(root, bucket_count=8)
    span = max(1, (int(hi) - int(lo) + 3) // 3)  # ceil(n/3)
    for b in range(3):
        batch = feed.filter(
            (F.col("lsn") >= int(lo) + b * span) & (F.col("lsn") < int(lo) + (b + 1) * span)
        )
        apply_batch(pipe, batch, batch_id=b, collect_metrics=False, with_change_log=False)
    return pipe.target.read(spark).select(
        "doc_id",
        F.concat_ws(",", F.col("tokens")).alias("tokens_csv"),
        "n_tok",
        "source",
    )


@register(
    "cdc_attr_lww_state",
    oracle="""
    WITH feed AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS doc_id,
             event_id AS lsn,
             CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'update' END AS op,
             CAST(floor(value * 100) AS BIGINT) AS score_v,
             upper(event_type) AS label_v,
             event_type IN ('click', 'signup') AS has_score,
             event_type IN ('view', 'signup') AS has_label
      FROM events
    ), agg AS (
      SELECT doc_id,
             max(lsn) FILTER (WHERE op = 'delete') AS dl,
             arg_max(score_v, lsn) FILTER (WHERE op <> 'delete' AND has_score) AS score,
             max(lsn) FILTER (WHERE op <> 'delete' AND has_score) AS al_score,
             arg_max(label_v, lsn) FILTER (WHERE op <> 'delete' AND has_label) AS label,
             max(lsn) FILTER (WHERE op <> 'delete' AND has_label) AS al_label
      FROM feed GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN coalesce(al_score, -1) > coalesce(dl, -1) THEN score END AS score,
           CASE WHEN coalesce(al_label, -1) > coalesce(dl, -1) THEN label END AS label
    FROM agg
    WHERE coalesce(al_score, -1) > coalesce(dl, -1)
       OR coalesce(al_label, -1) > coalesce(dl, -1)
    """,
)
def cdc_attr_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-attribute LWW end-to-end (reference field-level conflict
    resolution, canonical_exporter.py:749-753/834-850,
    attribute_assertion.py:8-44): events are treated as PARTIAL updates
    — clicks assert only ``score``, views only ``label``, signups both,
    errors nothing, purchases delete the key — applied through the real
    attr kernel (attr_lww_reduce → LakeTable.merge_attrs) in three
    lsn-range micro-batches.  The DuckDB oracle resolves each
    (key, attribute) independently with arg_max + the delete watermark."""
    t, _ = _run_attr_kernel(spark, sf_dir)
    return t.read(spark).select("doc_id", "score", "label")


def _attr_events_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a PARTIAL-update feed: clicks assert only score, views
    only label, signups both, errors nothing, purchases delete."""
    e = table(spark, sf_dir, "events")
    et = F.col("event_type")
    return e.select(
        F.when(et == "purchase", "delete").otherwise("update").alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_id").alias("lsn"),
        F.floor(F.col("value") * 100).cast("long").alias("score"),
        F.upper(et).alias("label"),
        F.when(et == "click", F.array(F.lit("score")))
        .when(et == "view", F.array(F.lit("label")))
        .when(et == "signup", F.array(F.lit("score"), F.lit("label")))
        .when(et == "purchase", F.lit(None).cast("array<string>"))
        .otherwise(F.array().cast("array<string>"))
        .alias("fields"),
    )


def _run_attr_kernel(spark: SparkSession, sf_dir: str):
    """Run the attr-LWW kernel over three lsn-range micro-batches with a
    field-level change-log sink; returns (target, change_log) tables."""
    from horizon_etl_spark.cdc.attrs import attr_lww_reduce
    from horizon_etl_spark.cdc.schema import ATTR_CHANGE_LOG_SCHEMA
    from horizon_etl_spark.tables.lake import LakeTable
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    feed = _attr_events_feed(spark, sf_dir)
    lo, hi = feed.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    root = _scratch_dir("cdc_attr_lww_")
    t = LakeTable.create(
        f"{root}/target",
        StructType(
            [
                StructField("doc_id", StringType(), False),
                StructField("score", LongType(), True),
                StructField("label", StringType(), True),
            ]
        ),
        key_col="doc_id",
        bucket_count=8,
        attr_lww=True,
    )
    cl = LakeTable.create(f"{root}/change_log", ATTR_CHANGE_LOG_SCHEMA)
    span = max(1, (int(hi) - int(lo) + 3) // 3)
    for b in range(3):
        batch = feed.filter(
            (F.col("lsn") >= int(lo) + b * span) & (F.col("lsn") < int(lo) + (b + 1) * span)
        )
        t.merge_attrs(
            attr_lww_reduce(batch),
            change_log_sink=cl,
            change_log_extra={"batch_id": b},
        )
    return t, cl


@register(
    "cdc_attr_change_log",
    oracle="""
    WITH feed AS (
      SELECT 'u' || CAST(user_id AS VARCHAR) AS doc_id,
             event_id AS lsn,
             CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'update' END AS op,
             CAST(floor(value * 100) AS BIGINT) AS score_v,
             upper(event_type) AS label_v,
             event_type IN ('click', 'signup') AS has_score,
             event_type IN ('view', 'signup') AS has_label
      FROM events
    ), bounds AS (
      SELECT min(lsn) AS lo,
             greatest(1, (max(lsn) - min(lsn) + 3) // 3) AS span
      FROM feed
    ), cuts AS (
      SELECT i, lo + i * span AS cut FROM generate_series(0, 3) AS g(i), bounds
    ), st AS (
      SELECT c.i, f.doc_id,
             max(f.lsn) FILTER (WHERE f.op = 'delete') AS dl,
             max(f.lsn) FILTER (WHERE f.op <> 'delete' AND f.has_score) AS rs,
             arg_max(f.score_v, f.lsn) FILTER (WHERE f.op <> 'delete' AND f.has_score) AS vs,
             max(f.lsn) FILTER (WHERE f.op <> 'delete' AND f.has_label) AS rl,
             arg_max(f.label_v, f.lsn) FILTER (WHERE f.op <> 'delete' AND f.has_label) AS vl
      FROM cuts c JOIN feed f ON f.lsn < c.cut
      GROUP BY c.i, f.doc_id
    ), norm AS (
      SELECT i, doc_id, dl,
             CASE WHEN coalesce(rs, -1) > coalesce(dl, -1) THEN rs END AS al_score,
             CASE WHEN coalesce(rs, -1) > coalesce(dl, -1) THEN vs END AS v_score,
             CASE WHEN coalesce(rl, -1) > coalesce(dl, -1) THEN rl END AS al_label,
             CASE WHEN coalesce(rl, -1) > coalesce(dl, -1) THEN vl END AS v_label
      FROM st
    ), lng AS (
      SELECT i, doc_id, 'score' AS col, al_score AS al,
             CAST(v_score AS VARCHAR) AS val, dl FROM norm
      UNION ALL
      SELECT i, doc_id, 'label', al_label, v_label, dl FROM norm
    )
    SELECT a.doc_id,
           a.col AS "column",
           CAST(coalesce(a.al, a.dl) AS BIGINT) AS lsn,
           CASE WHEN a.al IS NOT NULL THEN 'set' ELSE 'unset' END AS op_applied,
           b.val AS before_value,
           a.val AS after_value,
           CAST(a.i - 1 AS BIGINT) AS batch_id
    FROM lng a LEFT JOIN lng b
      ON b.i = a.i - 1 AND b.doc_id = a.doc_id AND b.col = a.col
    WHERE a.i > 0 AND a.al IS DISTINCT FROM b.al
    """,
)
def cdc_attr_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level CDC lineage end-to-end (reference: every attribute
    assertion is lineage, attribute_assertion.py:8-44, and every change
    an entity_change_log row, entity_change_log.py:8-42): the attr
    kernel's change-log sink after three micro-batches — one 'set' /
    'unset' row per (key, column) whose winning assertion moved, with
    before/after values.  The DuckDB oracle recomputes each batch's
    cumulative per-attribute state at the batch cut points and diffs
    consecutive states — resolution is a pure function of the event
    set, so cumulative-state diffs equal the engine's incremental
    per-batch emissions."""
    _, cl = _run_attr_kernel(spark, sf_dir)
    return cl.read(spark).select(
        "doc_id", "column", "lsn", "op_applied", "before_value", "after_value", "batch_id"
    )


@register(
    "cdc_lww_state",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(last_event_id AS BIGINT) AS last_event_id,
           last_type,
           CAST(CAST(last_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_value
    FROM (
      SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins per key (W1): the core conflict-resolution
    primitive (canonical_exporter.py:733-753 ORDER BY ... DESC, first
    hit wins) as a partial-agg-friendly max_by, not a window."""
    e = table(spark, sf_dir, "events")
    payload = F.struct("event_id", "event_type", "value")
    return (
        e.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(F.max_by(payload, F.col("event_id")).alias("w"))
        .select(
            "user_id",
            F.col("w.event_id").cast("long").alias("last_event_id"),
            F.col("w.event_type").alias("last_type"),
            (F.col("w.value").cast("decimal(18,2)") * 100).cast("long").alias("last_value"),
        )
    )


@register(
    "first_last_event_per_user",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           arg_min(event_type, event_id) AS first_type,
           arg_max(event_type, event_id) AS last_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def first_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last change per entity (W3): created_by = changes[0],
    last_updated_by = changes[-1] (canonical_exporter.py:755-780)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "event_type_metrics",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value
    FROM events GROUP BY event_type
    """,
)
def event_type_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step table metrics (A8): etl_flow_reporter.py:46-63."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long").alias("total_value"),
    )


@register(
    "events_quarantine_counts",
    oracle=f"""
    SELECT CASE WHEN {_SRC_CASE} NOT IN ('books','code','crawl','wiki')
                 AND event_type <> 'purchase' THEN 'bad_source'
                ELSE 'valid' END AS reason,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def events_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine split + reconciliation counts (P2/T9/A8): bad rows are
    counted per reason, never dropped silently (project_loader.py:115-127)."""
    from horizon_etl_spark.cdc.validate import reason_column

    feed = events_as_feed(spark, sf_dir)
    return (
        feed.withColumn("reason", F.coalesce(reason_column(), F.lit("valid")))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "nested_json_explode",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS order_id,
           CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_items,
           CAST(l_linenumber AS BIGINT) AS line,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty,
           CAST(l_partkey AS BIGINT) AS part
    FROM lineitem
    """,
)
def nested_json_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep nested-JSON extraction (S3): one JSON document per order —
    struct { order, summary { n_items }, items: [ { line, qty, part } ] }
    — is built from lineitem, then parsed back with ``from_json`` under
    an explicit nested schema and EXPLODEd into typed child rows plus a
    summary field, mirroring the reference's nested-doc → typed record
    lists parse (/root/reference/src/adapters/sources/lattes_parser.py:41-602).
    The oracle derives the expected child rows directly from the clean
    source columns, so the whole serialize→parse→explode round trip is
    checked against ground truth."""
    l = table(spark, sf_dir, "lineitem")
    item = F.struct(
        F.col("l_linenumber").cast("long").alias("line"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long").alias("qty"),
        F.col("l_partkey").cast("long").alias("part"),
    )
    docs = l.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.to_json(
            F.struct(
                F.col("okey").alias("order"),
                F.struct(F.count(F.lit(1)).alias("n_items")).alias("summary"),
                F.sort_array(F.collect_list(item)).alias("items"),
            )
        ).alias("js")
    )
    schema = (
        "order BIGINT, summary STRUCT<n_items: BIGINT>, "
        "items ARRAY<STRUCT<line: BIGINT, qty: BIGINT, part: BIGINT>>"
    )
    parsed = docs.select(F.from_json(F.col("js"), schema).alias("doc"))
    return parsed.select(
        F.col("doc.order").alias("order_id"),
        F.col("doc.summary.n_items").alias("n_items"),
        F.explode("doc.items").alias("item"),
    ).select("order_id", "n_items", "item.line", "item.qty", "item.part")


@register(
    "props_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS total_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON payload parsing (S3/F14/F17): the reference stores
    open payloads as JSON and navigates them per-row
    (lattes_parser.py:41-602, recorder.py:26-33); here ``from_json``
    with an explicit schema keeps the parse JVM-side and vectorized."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return (
        e.withColumn("k", parsed["k"])
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("total_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
