"""The CDC apply kernel — one micro-batch / epoch end-to-end.

Pipeline per batch (mirrors the reference ingest lifecycle, SURVEY.md §3.1):
  validate → quarantine split   (project_loader.py:524-529 skip-and-log →
                                 dead-letter table)
  dedup (doc_id, lsn)           (source_record unique constraint,
                                 source_record.py:10-17)
  LWW reduce per doc_id         (latest-assertion-wins,
                                 canonical_exporter.py:733-753)
  MERGE into target             (create_or_update handlers,
                                 initiative_handlers.py:54-106; delete
                                 semantics team_synchronizer.py:161-189)
  lineage: runs / metrics /     (ingestion_run.py:8-29;
  change_log rows                etl_flow_reporter.py:16-63)

Exactly-once: the MERGE's per-key ``lsn`` monotonicity guard makes
re-applying any batch (foreachBatch retry after crash) a no-op, and the
LWW reduction makes the result independent of batch boundaries and
intra-feed order — so checkpointed offsets + this kernel give
end-to-end exactly-once without coordination.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.cdc import schema as S
from horizon_etl_spark.cdc.lww import lww_reduce, lww_reduce_salted
from horizon_etl_spark.tables.lake import LakeTable


@dataclass
class CdcPipeline:
    """The five tables of one CDC ingest pipeline (FIXTURES.md §1, §4)."""

    root: str
    target: LakeTable
    quarantine: LakeTable
    runs: LakeTable
    metrics: LakeTable
    change_log: LakeTable
    rollup: LakeTable

    @classmethod
    def create(cls, root: str, bucket_count: int = 16, attr_lww: bool = False) -> "CdcPipeline":
        return cls(
            root=root,
            target=LakeTable.create(
                os.path.join(root, "target"),
                S.TARGET_SCHEMA,
                key_col="doc_id",
                bucket_count=bucket_count,
                attr_lww=attr_lww,
            ),
            quarantine=LakeTable.create(
                os.path.join(root, "quarantine"),
                S.ATTR_QUARANTINE_SCHEMA if attr_lww else S.QUARANTINE_SCHEMA,
            ),
            runs=LakeTable.create(os.path.join(root, "runs"), S.RUNS_SCHEMA),
            metrics=LakeTable.create(os.path.join(root, "metrics"), S.METRICS_SCHEMA),
            change_log=LakeTable.create(
                os.path.join(root, "change_log"),
                S.ATTR_CHANGE_LOG_SCHEMA if attr_lww else S.CHANGE_LOG_SCHEMA,
            ),
            rollup=LakeTable.create(os.path.join(root, "rollup"), S.ROLLUP_SCHEMA),
        )

    @classmethod
    def load(cls, root: str) -> "CdcPipeline":
        rollup_path = os.path.join(root, "rollup")
        return cls(
            root=root,
            target=LakeTable.load(os.path.join(root, "target")),
            quarantine=LakeTable.load(os.path.join(root, "quarantine")),
            runs=LakeTable.load(os.path.join(root, "runs")),
            metrics=LakeTable.load(os.path.join(root, "metrics")),
            change_log=LakeTable.load(os.path.join(root, "change_log")),
            rollup=(
                LakeTable.load(rollup_path)
                if LakeTable.exists(rollup_path)
                else LakeTable.create(rollup_path, S.ROLLUP_SCHEMA)
            ),
        )

    @classmethod
    def create_or_load(cls, root: str, bucket_count: int = 16) -> "CdcPipeline":
        if LakeTable.exists(os.path.join(root, "target")):
            return cls.load(root)
        return cls.create(root, bucket_count=bucket_count)


def _now():
    return datetime.now(timezone.utc).replace(tzinfo=None)


HOT_KEY_SHARE_THRESHOLD = 0.05  # hottest key > 5% of batch events → salt

# Tables covered by coordinated pipeline rollback.  ``runs`` is the
# audit log and is deliberately NOT rolled back (rollbacks must stay
# visible in it, like the reference's ingestion_run history,
# /root/reference/src/tracking/entities/ingestion_run.py:8-29).
ROLLBACK_TABLES = ("target", "quarantine", "metrics", "change_log", "rollup")


def apply_batch(
    pipe: CdcPipeline,
    batch: DataFrame,
    batch_id: int,
    salted_lww: bool | str = False,
    salt_buckets: int = 32,
    collect_metrics: bool = True,
    with_change_log: bool = True,
    with_rollup: bool = False,
    persist_source: bool = False,
    whitelist: tuple[str, ...] | None = None,
    vocab_size: int | None = None,
) -> dict[str, Any]:
    """Apply one micro-batch of change events; returns the run stats row.

    ``salted_lww``: False (plain max_by — partial agg is already the
    skew mitigation), True (explicit two-phase salted reduction), or
    ``"auto"`` — consult the PREVIOUS batch's skew metrics (hottest-key
    event share, which ride the LWW shuffle for free) and salt when it
    exceeded ``HOT_KEY_SHARE_THRESHOLD``; change feeds have temporal
    locality, so last batch's skew is the best available predictor
    (requires ``collect_metrics``; first batch runs plain).

    ``persist_source``: cache the decoded+tagged batch.  Clean feeds
    make exactly one pass either way (the quarantine scan only runs
    when bad rows exist); caching pays off for expensive decodes
    (JSON/Avro WAL tails) on DIRTY feeds, where it saves the second
    decode of the quarantine pass.

    Per-attribute mode is inferred from the target table: an
    ``attr_lww`` target routes the batch through ``attr_lww_reduce`` →
    ``merge_attrs`` (partial-update events with a ``fields`` column;
    validation gates payload rules on asserted columns).  Lineage in
    attr mode is FIELD-level: the change_log sink receives long-format
    per-(key, column) set/unset images (reference: every attribute
    assertion is lineage, attribute_assertion.py:8-44), and rollup
    maintenance folds the row-level images merge_attrs also returns —
    both with the same exactly-once batch-watermark guards as the
    whole-row path."""
    from pyspark.sql import Observation

    started = _now()
    spark = batch.sparkSession
    attr_mode = bool(pipe.target.snapshot().get("attr_lww"))
    if "batch" in batch.columns:
        batch = batch.drop("batch")

    # Bandwidth-lean plan: ONE full pass over the raw batch on the
    # clean-feed fast path (whole-batch caching only when the decode is
    # the dominant cost, see ``persist_source``):
    #   pass 1: LWW reduction (partial+final agg) materialized into the
    #           persisted `winners` (≤1 small row per key); input/valid
    #           counts ride the SAME job via an Observation placed
    #           below the validity filter, and per-key event counts for
    #           the skew metrics ride the same shuffle (`with_counts`)
    #   pass 2: quarantine write — ONLY when the observed counts say
    #           bad rows exist (dirty batches; clean feeds never scan
    #           the raw batch twice)
    # Everything downstream (metrics, MERGE, rollup, stats) reads only
    # `winners` / the target — never the raw feed again.
    obs = Observation(f"apply_batch_{batch_id}")
    reason = _reason(
        "fields" if attr_mode and "fields" in batch.columns else None,
        whitelist,
        vocab_size,
    )
    tagged = batch.withColumn("_reason", reason).observe(
        obs,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum(F.when(F.col("_reason").isNull(), 1).otherwise(0)).alias("valid_rows"),
    )
    if persist_source:
        tagged = tagged.persist()
    winners = None
    stats: dict[str, Any] | None = None
    try:
        # within-batch dedup + LWW collapse in one reduction: duplicate
        # (doc_id, lsn) rows are byte-identical, so max_by keeps exactly
        # one; cross-batch dups are killed by the merge lsn-guard.
        valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
        if salted_lww == "auto":
            # metrics-based predictor (temporal locality: last batch's
            # hot-key share), OR'd with the PLAN-level predictor so the
            # FIRST batch of a key-partitioned feed already salts — the
            # metrics signal needs one degraded batch to exist first
            salted_lww = _last_batch_was_skewed(pipe, spark) or _feed_defeats_partial_agg(
                valid
            )
        if attr_mode:
            from horizon_etl_spark.cdc.attrs import (
                attr_lww_reduce,
                attr_lww_reduce_salted,
            )

            reducer = attr_lww_reduce_salted if salted_lww else attr_lww_reduce
            kwargs = {"salt_buckets": salt_buckets} if salted_lww else {}
            winners = reducer(valid.drop("ts"), with_counts=True, **kwargs).persist()
        else:
            reducer = lww_reduce_salted if salted_lww else lww_reduce
            kwargs = {"salt_buckets": salt_buckets} if salted_lww else {}
            winners = reducer(
                valid.drop("ts"), key="doc_id", order="lsn", with_counts=True, **kwargs
            ).persist()

        # No explicit materialize: the FIRST downstream action over the
        # persisted winners — the metrics aggregation, or the merge's
        # bucket-prune scan — runs the reduction, fills the cache every
        # later step reuses, and fires the Observation.  (A dedicated
        # winners.count() here was one whole extra job per batch for
        # work the next action repeats from cache anyway.)
        if collect_metrics:
            _write_bucket_metrics(pipe, winners, batch_id)

        pre_merge_version = pipe.target.current_version() if with_rollup else None
        # cache the merge join when anything re-reads it: the change-log
        # sink append, or rollup maintenance evaluating the returned
        # change images right after the merge.  Passing True makes US
        # the cache owner — merge returns the handle in
        # stats["persisted_join"] and the finally below releases it
        # after the last consumer (_maintain_rollup) has run
        persist_join = with_change_log or with_rollup
        if attr_mode:
            stats = pipe.target.merge_attrs(
                winners.drop("_key_events"),
                change_log_sink=pipe.change_log if with_change_log else None,
                change_log_extra={"batch_id": batch_id},
                persist_join=persist_join,
            )
        else:
            stats = pipe.target.merge(
                winners.drop("_key_events"),
                op_col="op",
                lsn_col="lsn",
                delete_op="delete",
                change_log_sink=pipe.change_log if with_change_log else None,
                change_log_extra={"batch_id": batch_id},
                persist_join=persist_join,
            )

        # counts rode the winners materialization; fall back to a
        # direct pass for degenerate plans where Catalyst optimized the
        # CollectMetrics node away (e.g. provably-empty local batches)
        try:
            counts = obs.get
            input_rows = int(counts["input_rows"])
            valid_rows = int(counts["valid_rows"] or 0)
        except Exception:
            row = tagged.agg(
                F.count(F.lit(1)).alias("i"),
                F.sum(F.when(F.col("_reason").isNull(), 1).otherwise(0)).alias("v"),
            ).collect()[0]
            input_rows, valid_rows = int(row["i"]), int(row["v"] or 0)
        quarantined_rows = input_rows - valid_rows
        if quarantined_rows > 0:
            _write_quarantine(pipe, tagged, batch_id, attr_mode, input_rows)

        if with_rollup:
            # incremental derived-aggregate maintenance (A3 analogue:
            # the reference recomputes parent MIN/MAX rollups after each
            # ingest, project_loader.py:135-257; here the per-source
            # rollup is maintained from the batch's change images, so a
            # replayed batch — whose changes all report skipped_stale —
            # contributes zero delta: exactly-once extends to the MV).
            # the lazy change-image frame recomputes from the pre-merge
            # snapshot + still-cached winners — O(batch), unlike a scan
            # of the ever-growing change_log table
            _maintain_rollup(
                pipe, stats["change_log"], pre_merge_version, stats["version"]
            )
        lww_rows = (
            stats["inserted"]
            + stats["updated"]
            + stats["deleted"]
            + stats["delete_noop"]
            + stats["skipped_stale"]
        )
        run = {
            "batch_id": batch_id,
            "started_at": started,
            "finished_at": _now(),
            "status": "success",
            "input_rows": input_rows,
            "applied": stats["applied"],
            "deduped": valid_rows - lww_rows,  # includes LWW-collapsed + dup rows + delete_noops
            "quarantined": quarantined_rows,
            "skipped_stale": stats["skipped_stale"],
            "delete_noop": stats["delete_noop"],
            "notes": (
                f"v{stats['version']} ins={stats['inserted']} upd={stats['updated']} "
                f"del={stats['deleted']} rewrote={stats['rewritten_files']} "
                f"carried={stats['carried_files']} salted={bool(salted_lww)}"
            ),
            # per-table snapshot anchor for rollback_to_batch (cheap:
            # driver-side directory listings, no data scan)
            "versions": json.dumps(
                {
                    name: getattr(pipe, name).current_version()
                    for name in ROLLBACK_TABLES
                }
            ),
        }
        pipe.runs.append_rows([run], operation=f"run(batch={batch_id})")
        return run
    except Exception:
        failed = {
            "batch_id": batch_id,
            "started_at": started,
            "finished_at": _now(),
            "status": "failed",
            "input_rows": None,
            "applied": None,
            "deduped": None,
            "quarantined": None,
            "skipped_stale": None,
            "delete_noop": None,
            "notes": "exception during apply",
            "versions": None,
        }
        try:
            pipe.runs.append_rows([failed])
        except Exception:
            pass
        raise
    finally:
        if persist_source:
            tagged.unpersist()
        if winners is not None:
            winners.unpersist()
        # merge kept the join cached because WE asked (persist_join):
        # release it only after every post-merge consumer — rollup
        # maintenance evaluating the change images — has run
        if stats is not None and stats.get("persisted_join") is not None:
            stats["persisted_join"].unpersist()


def _write_quarantine(
    pipe: CdcPipeline,
    tagged: DataFrame,
    batch_id: int,
    attr_mode: bool,
    input_rows: int,
) -> None:
    """Dead-letter write for the batch's invalid rows (runs AFTER the
    target merge commit and only for dirty batches).  Redelivery dedup:
    the quarantine snapshot props remember the last append's batch_id
    plus a CONTENT fingerprint (order-free multiset hash over
    (doc_id, lsn, reason) — count + decimal sum of xxhash64, the
    overflow-safe shape, O(1) result with no collect_list); only an
    exactly-matching redelivery is skipped.  A NEW feed whose batch
    numbering restarts at the same id (and even the same row count)
    carries different rows, hashes differently, and is appended —
    the old (batch_id, input_rows) key silently dropped that case."""
    quarantined = (
        tagged.filter(F.col("_reason").isNotNull())
        .withColumnRenamed("_reason", "reason")
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
        # cached so the fingerprint agg fills it and the append (the
        # common path) reads it back — the dirty batch still pays ONE
        # extra raw scan total, same as the pre-fingerprint code
        .persist()
    )
    cached = quarantined  # unpersist the PERSISTED handle, not a derivation
    try:
        fp_row = quarantined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("doc_id", "lsn", "reason").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        fingerprint = f"{fp_row['n']}:{fp_row['h']}"
        props = pipe.quarantine.props
        if (
            props.get("last_batch_id") == batch_id
            and props.get("last_fingerprint") == fingerprint
        ):
            return
        if attr_mode and "fields" not in quarantined.columns:
            # full-row (fields-less) batches are valid attr-mode input;
            # the attr quarantine schema still expects the column
            quarantined = quarantined.withColumn(
                "fields", F.lit(None).cast("array<string>")
            )
        pipe.quarantine.append(
            quarantined,
            operation=f"quarantine(batch={batch_id})",
            props={
                "last_batch_id": batch_id,
                "last_input_rows": input_rows,
                "last_fingerprint": fingerprint,
            },
        )
    finally:
        cached.unpersist()


def _reason(
    fields_col: str | None = None,
    whitelist: tuple[str, ...] | None = None,
    vocab_size: int | None = None,
):
    from horizon_etl_spark.cdc.validate import SOURCE_WHITELIST_DEFAULT, reason_column

    return reason_column(
        whitelist=whitelist or SOURCE_WHITELIST_DEFAULT,
        fields_col=fields_col,
        vocab_size=vocab_size,
    )


def _feed_defeats_partial_agg(df: DataFrame, key: str = "doc_id") -> bool:
    """PLAN-level skew predictor — covers batch 0, where the metrics
    predictor has no history yet.

    The degradation case (measured 2.7× in BENCH.md's skew table) is a
    feed whose in-session lineage is already hash-partitioned on the
    key (upstream ``repartition(key)``, or a prior groupBy/join on it):
    the LWW aggregation's required distribution is then satisfied, so
    EnsureRequirements inserts no pre-agg Exchange and the partial
    aggregate runs AFTER the existing shuffle — every event of a hot
    key flows through one task with no cross-partition map-side
    combine.  Plain parquet/stream reads report Unknown/range
    partitioning (Spark doesn't trust on-disk layout), so normal feeds
    keep the plain fast path.

    Detection is O(plan), no job: the batch's physical plan must not
    claim ``hashpartitioning(<key>...)`` as its output partitioning.
    """
    def _is_single_key_hash(jpart) -> bool:
        # parse the JVM Partitioning object instead of regexing its
        # string form — a multi-column hashpartitioning does NOT
        # satisfy the agg's single-key distribution (Spark still
        # inserts the Exchange), so it must not trigger the salted
        # path; only HashPartitioning over exactly [key] counts.
        cls = jpart.getClass().getSimpleName()
        if cls == "PartitioningCollection":
            parts = jpart.partitionings()
            return any(
                _is_single_key_hash(parts.apply(i)) for i in range(parts.size())
            )
        if cls != "HashPartitioning":
            return False
        exprs = jpart.expressions()
        if exprs.size() != 1:
            return False
        # AttributeReference renders as <name>#<exprId>[qualifier...]
        return exprs.apply(0).toString().split("#", 1)[0] == key

    try:
        jpart = df._jdf.queryExecution().sparkPlan().outputPartitioning()
        return _is_single_key_hash(jpart)
    except Exception:
        return False


def _last_batch_was_skewed(pipe: CdcPipeline, spark: SparkSession) -> bool:
    """Adaptive-salting predicate: was the hottest key of the most
    recent batch above ``HOT_KEY_SHARE_THRESHOLD`` of its events?
    Reads only the tiny metrics table; no metrics yet → not skewed."""
    try:
        m = pipe.metrics.read(spark)
        last = m.agg(F.max("batch_id").alias("b")).collect()[0]["b"]
        if last is None:
            return False
        row = (
            m.filter(F.col("batch_id") == last)
            .agg(
                F.max("max_key_rows").alias("hot"),
                F.sum("rows_in").alias("total"),
            )
            .collect()[0]
        )
        if not row["total"]:
            return False
        return (row["hot"] or 0) / row["total"] > HOT_KEY_SHARE_THRESHOLD
    except Exception:
        return False


def _rebuild_rollup(
    pipe: CdcPipeline, spark: SparkSession, synced_version: int, operation: str
) -> None:
    """Full rollup rebuild from current target state — the ONE
    definition shared by bootstrap and crash-recovery maintenance, so
    the two paths can never diverge on the aggregate's semantics."""
    rebuilt = pipe.target.read(spark).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).cast("long").alias("total_tokens"),
    )
    pipe.rollup.overwrite(
        rebuilt,
        operation=operation,
        props={"synced_target_version": synced_version},
    )


def _maintain_rollup(
    pipe: CdcPipeline,
    changes: DataFrame,
    pre_merge_version: int | None,
    post_merge_version: int,
) -> None:
    """Fold one batch's change images into the per-source rollup table
    (source → n_docs, total_tokens).

    Each applied change contributes up to two signed deltas — a
    retraction against the before-image's source and an addition for
    the after-image's (sources can differ when a doc moves) — which is
    the standard retract/accumulate shape of incremental view
    maintenance.  ``skipped_stale``/``delete_noop`` changes contribute
    nothing, so re-delivered batches leave the rollup untouched.

    Exactly-once across the two non-atomic commits (target merge, then
    rollup overwrite): the rollup snapshot's props record the target
    version it reflects (``synced_target_version``).  If that doesn't
    equal the pre-merge target version, the rollup missed one or more
    committed merges — a crash landed between the two commits, or the
    rollup was enabled late — and the redelivered batch's change images
    are all ``skipped_stale`` (zero delta), so incremental folding
    would lose the gap forever.  Detection → rebuild the rollup from
    the post-merge target state (O(target), rare) instead of folding.

    The rollup's cardinality is |sources| (tiny), so the update is a
    read + union + overwrite; a high-cardinality derived table would
    use a keyed additive MERGE instead (same delta feed)."""
    spark = changes.sparkSession
    synced = pipe.rollup.props.get("synced_target_version")
    if synced != pre_merge_version:
        _rebuild_rollup(pipe, spark, post_merge_version, "rollup(rebuild)")
        return
    applied = changes.filter(F.col("op_applied").isin("insert", "update", "delete"))
    before = applied.filter(F.col("before_source").isNotNull()).select(
        F.col("before_source").alias("source"),
        F.lit(-1).cast("long").alias("d_docs"),
        (-F.coalesce(F.col("before_n_tok"), F.lit(0))).cast("long").alias("d_tokens"),
    )
    after = applied.filter(F.col("after_source").isNotNull()).select(
        F.col("after_source").alias("source"),
        F.lit(1).cast("long").alias("d_docs"),
        F.coalesce(F.col("after_n_tok"), F.lit(0)).cast("long").alias("d_tokens"),
    )
    deltas = (
        before.unionByName(after)
        .groupBy("source")
        .agg(F.sum("d_docs").alias("n_docs"), F.sum("d_tokens").alias("total_tokens"))
    )
    cur = pipe.rollup.read(spark)
    merged = (
        cur.unionByName(deltas)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_tokens").cast("long").alias("total_tokens"),
        )
        .filter(F.col("n_docs") > 0)
    )
    pipe.rollup.overwrite(
        merged,
        operation="rollup",
        props={"synced_target_version": post_merge_version},
    )


def _write_bucket_metrics(pipe: CdcPipeline, winners: DataFrame, batch_id: int) -> None:
    """Per-partition lineage (north_rule 'per-partition lineage + metrics'):
    per target bucket — events in, distinct keys, hottest-key event
    count (the skew signal that motivates salted LWW), winner payload
    bytes.  Computed entirely from the already-reduced ``winners``
    (whose ``_key_events`` rode the LWW shuffle) — zero extra passes
    over the raw feed."""
    from horizon_etl_spark.tables.lake import bucket_expr

    nb = pipe.target.bucket_count or 16
    m = winners.groupBy(bucket_expr("doc_id", nb).alias("bucket_id")).agg(
        F.sum("_key_events").alias("rows_in"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("_key_events").alias("max_key_rows"),
        F.sum(F.coalesce(F.col("n_tok"), F.lit(0)) * 4 + 64).alias("winner_bytes"),
    )
    # O(buckets) rows: collect + driver-side parquet append (no second
    # Spark job for the write); this collect is also the action that
    # materializes the winners cache and fires the apply Observation
    rows = [{**r.asDict(), "batch_id": batch_id} for r in m.collect()]
    pipe.metrics.append_rows(rows, operation=f"metrics(batch={batch_id})")


def reprocess_quarantine(
    pipe: CdcPipeline,
    spark: SparkSession,
    batch_id: int,
    whitelist: tuple[str, ...] | None = None,
    vocab_size: int | None = None,
) -> dict[str, Any] | None:
    """Repair path: re-run every quarantined row through validation +
    apply after an operator fixed the upstream condition (widened
    source whitelist, corrected producer).  The reference's analogue is
    manual re-ingestion after skip-and-log
    (/root/reference/src/core/logic/project_loader.py:115-127).

    Rows that now validate are applied under ``batch_id``; rows still
    invalid are re-quarantined under the same ``batch_id``; the old
    quarantine rows are then dropped (overwrite keeping only the new
    batch's residue).  Crash between the apply commit and the
    quarantine rewrite is safe: a re-run re-applies the same events,
    which the merge lsn-guard turns into no-ops — idempotent like every
    other repair in this engine.  Returns the run row (None when the
    quarantine is empty).

    ``batch_id`` must be FRESH (greater than every batch_id already in
    the quarantine table) — the residue rewrite distinguishes
    still-invalid rows from consumed ones by it."""
    q = pipe.quarantine.read(spark)
    # crash-residue dedup: a crash between apply_batch's quarantine
    # append (residue under the fresh batch_id) and the overwrite below
    # leaves the table holding the old rows PLUS their residue copies;
    # events are byte-identical per (doc_id, lsn), so one dropDuplicates
    # keeps reprocessing (and the residue it rewrites) duplicate-free
    feed = q.drop("reason", "batch_id").dropDuplicates(["doc_id", "lsn"])
    if feed.limit(1).count() == 0:
        return None
    max_existing = q.agg(F.max("batch_id")).collect()[0][0]
    if max_existing is not None and batch_id <= max_existing:
        raise ValueError(
            f"reprocess batch_id {batch_id} must exceed the quarantine's "
            f"max existing batch_id {max_existing}"
        )
    run = apply_batch(
        pipe,
        feed,
        batch_id=batch_id,
        collect_metrics=False,
        with_change_log=False,
        whitelist=whitelist,
        # a pipeline validating token ranges must keep validating them
        # on the repair path — otherwise token_out_of_vocab quarantine
        # rows would re-apply UNVALIDATED once any other rule is fixed
        vocab_size=vocab_size,
    )
    residue = pipe.quarantine.read(spark).filter(F.col("batch_id") == batch_id)
    pipe.quarantine.overwrite(residue, operation=f"reprocess(batch={batch_id})")
    return run


def replay(
    pipe: CdcPipeline,
    feed: DataFrame,
    salted_lww: bool = False,
    collect_metrics: bool = True,
    with_change_log: bool = True,
    with_rollup: bool = False,
    persist_source: bool = False,
) -> list[dict[str, Any]]:
    """Batch-mode replay of a whole feed, honoring its ``batch`` column
    (feeds without one apply as a single batch 0).  Used by tests and
    bench; the streaming path in ``horizon_etl_spark.streaming.runner``
    uses the same kernel.  (An earlier ``num_batches`` parameter that
    silently DISABLED batch splitting when set was removed — drop the
    ``batch`` column instead to force single-batch apply.)"""
    results = []
    if "batch" in feed.columns:
        batch_ids = sorted(
            r["batch"] for r in feed.select("batch").distinct().collect()
        )
        for b in batch_ids:
            results.append(
                apply_batch(
                    pipe,
                    feed.filter(F.col("batch") == b).drop("batch"),
                    batch_id=int(b),
                    salted_lww=salted_lww,
                    collect_metrics=collect_metrics,
                    with_change_log=with_change_log,
                    with_rollup=with_rollup,
                    persist_source=persist_source,
                )
            )
    else:
        results.append(
            apply_batch(
                pipe,
                feed.drop("batch") if "batch" in feed.columns else feed,
                batch_id=0,
                salted_lww=salted_lww,
                collect_metrics=collect_metrics,
                with_change_log=with_change_log,
                with_rollup=with_rollup,
                persist_source=persist_source,
            )
        )
    return results


# run-row batch_id for the initial snapshot load; real WAL batches are >= 0
BOOTSTRAP_BATCH_ID = -1


def bootstrap(
    pipe: CdcPipeline,
    spark: SparkSession,
    snapshot: DataFrame,
    as_of_lsn: int,
    with_rollup: bool = False,
    whitelist: tuple[str, ...] | None = None,
) -> dict[str, Any]:
    """Initial-snapshot load — the Debezium ``snapshot.mode=initial``
    handoff: bulk-load a consistent source snapshot taken at WAL
    position ``as_of_lsn`` into the EMPTY target, then tail the change
    feed; events at ``lsn <= as_of_lsn`` (already folded into the
    snapshot) are skipped by the merge's lsn guard automatically, and
    events after it apply incrementally.  The reference's analogue is
    the first full ProjectLoader run before weekly incrementals
    (/root/reference/src/core/logic/project_loader.py:79-93).

    Scale story (the reason this is not just ``apply_batch`` with
    insert events): the initial load of a 100 TB table through MERGE
    would pay a full-outer join + change-image machinery against an
    empty side.  This path is one validated pass: filter → bucket
    repartition → partitioned parquet write — no join, no window, the
    same single-shuffle shape as a plain bucketed CTAS.  Row counts
    ride the write via an ``Observation``.

    ``snapshot`` carries the payload columns (doc_id, tokens, n_tok,
    source, …); rows must be key-unique (it is a table snapshot).
    Validation applies the same quarantine rules as the feed path —
    invalid rows land in the quarantine table under
    ``BOOTSTRAP_BATCH_ID`` with ``lsn = as_of_lsn``, reprocessable via
    ``reprocess_quarantine``.  In attr-LWW mode every column's
    assertion lsn starts at ``as_of_lsn`` (the snapshot asserts the
    whole row)."""
    from pyspark.sql import Observation

    from horizon_etl_spark.tables.lake import (
        DEL_LSN_COL,
        LSN_COL,
        TOMBSTONE_COL,
        alsn_col,
    )

    started = _now()
    tsnap = pipe.target.snapshot()
    if tsnap["files"]:
        raise ValueError(
            "bootstrap requires an empty target (it is the initial load); "
            "use apply_batch/run_stream for incremental changes"
        )
    attr_mode = bool(tsnap.get("attr_lww"))

    # the feed validators expect op/lsn; a snapshot row is an insert
    # observed at the snapshot position
    feed_shape = snapshot.withColumn("op", F.lit("insert")).withColumn(
        "lsn", F.lit(as_of_lsn).cast("long")
    )
    if "ts" not in feed_shape.columns:  # quarantine rows carry the feed shape
        feed_shape = feed_shape.withColumn("ts", F.lit(None).cast("timestamp"))
    obs = Observation("bootstrap")
    tagged = feed_shape.withColumn(
        "_reason", _reason(None, whitelist)
    ).observe(
        obs,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum(F.when(F.col("_reason").isNull(), 1).otherwise(0)).alias("valid_rows"),
    )

    payload = [f.name for f in S.TARGET_SCHEMA.fields]
    meta = [
        F.lit(as_of_lsn).cast("long").alias(LSN_COL),
        F.lit(False).alias(TOMBSTONE_COL),
    ]
    if attr_mode:
        meta.append(F.lit(None).cast("long").alias(DEL_LSN_COL))
        meta.extend(
            F.lit(as_of_lsn).cast("long").alias(alsn_col(c))
            for c in payload
            if c != "doc_id"
        )
    valid = tagged.filter(F.col("_reason").isNull()).select(*payload, *meta)

    version = pipe.target.overwrite(
        valid,
        operation="bootstrap",
        props={"bootstrap_lsn": as_of_lsn},
    )
    # same degenerate-plan fallback as apply_batch/merge: if Catalyst
    # elided the CollectMetrics node, recompute directly — this runs
    # AFTER the overwrite commit, so raising here would strand a
    # non-empty target behind bootstrap's empty-target precondition
    try:
        counts = obs.get
        input_rows = int(counts["input_rows"] or 0)
        loaded = int(counts["valid_rows"] or 0)
    except Exception:
        row = tagged.agg(
            F.count(F.lit(1)).alias("i"),
            F.sum(F.when(F.col("_reason").isNull(), 1).otherwise(0)).alias("v"),
        ).collect()[0]
        input_rows, loaded = int(row["i"] or 0), int(row["v"] or 0)
    if input_rows > loaded:
        _write_quarantine(pipe, tagged, BOOTSTRAP_BATCH_ID, attr_mode, input_rows)
    if with_rollup:
        _rebuild_rollup(pipe, spark, version, "rollup(bootstrap)")
    run = {
        "batch_id": BOOTSTRAP_BATCH_ID,
        "started_at": started,
        "finished_at": _now(),
        "status": "bootstrap",
        "input_rows": input_rows,
        "applied": loaded,
        "deduped": 0,
        "quarantined": input_rows - loaded,
        "skipped_stale": 0,
        "delete_noop": 0,
        "notes": f"initial snapshot load at lsn={as_of_lsn}",
        "versions": json.dumps(
            {name: getattr(pipe, name).current_version() for name in ROLLBACK_TABLES}
        ),
    }
    pipe.runs.append_rows([run], operation="run(bootstrap)")
    return {
        "version": version,
        "input_rows": input_rows,
        "loaded": loaded,
        "quarantined": input_rows - loaded,
        "bootstrap_lsn": as_of_lsn,
    }


def rollback_to_batch(
    pipe: CdcPipeline, spark: SparkSession, batch_id: int
) -> dict[str, int]:
    """Coordinated pipeline point-in-time rollback: restore every
    pipeline table (``ROLLBACK_TABLES``) to the snapshot it had right
    after ``batch_id``'s run row was committed — the "bad deploy
    shipped a poisoned batch, rewind and re-apply" operation.

    Mechanics: each success run row carries a ``versions`` JSON anchor
    (per-table snapshot versions at batch completion); we roll each
    table back via ``LakeTable.rollback``, which is a NEW commit, so
    the bad batches stay inspectable until vacuumed.  Because rollback
    also reverts snapshot props, the target's ``last_batch_id`` /
    change-log watermark idempotency guards revert with the data —
    re-applying batches > ``batch_id`` (fixed or not) is NOT
    suppressed, and replay reconverges the pipeline (T3).

    The ``runs`` audit table is never rolled back; a ``rollback``
    status row is appended instead so the operation itself is lineage.
    Returns the restored per-table versions."""
    anchors = [
        r
        for r in pipe.runs.read(spark)
        .filter(
            (F.col("batch_id") == batch_id)
            & (F.col("status") == "success")
            & F.col("versions").isNotNull()
        )
        .collect()
    ]
    if not anchors:
        raise ValueError(
            f"no success run row with a versions anchor for batch {batch_id}"
        )
    # latest run of that batch wins (re-deliveries are no-op merges but
    # still write run rows)
    anchor = max(anchors, key=lambda r: (r["finished_at"], r["versions"]))
    versions: dict[str, int] = json.loads(anchor["versions"])
    restored: dict[str, int] = {}
    for name in ROLLBACK_TABLES:
        table: LakeTable = getattr(pipe, name)
        v = versions.get(name)
        if v is None:
            continue
        if table.current_version() != v:
            table.rollback(v)
        restored[name] = v
    audit = {
        "batch_id": batch_id,
        "started_at": _now(),
        "finished_at": _now(),
        "status": "rollback",
        "input_rows": None,
        "applied": None,
        "deduped": None,
        "quarantined": None,
        "skipped_stale": None,
        "delete_noop": None,
        "notes": f"rolled back to post-batch-{batch_id} snapshots",
        "versions": json.dumps(restored),
    }
    pipe.runs.append_rows([audit], operation=f"rollback(batch={batch_id})")
    return restored
