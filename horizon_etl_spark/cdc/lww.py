"""Last-writer-wins reduction — the core CDC conflict-resolution
primitive (north_star: "last-writer-wins via a window over lsn per key").

Reference semantics being reproduced: attribute assertions are read
back `ORDER BY asserted_at DESC, id DESC` and the first hit per
(entity, attribute) wins (/root/reference/src/core/logic/canonical_exporter.py:733-753,
834-850).  Here the ordering authority is the strictly-per-key-monotonic
``lsn`` (FIXTURES.md §2), so the reduction is a pure function of the
event *set* — replay order, batch boundaries, and duplicate delivery
cannot change the result (SURVEY.md §7.4).

Physical strategy
-----------------
``lww_reduce`` uses ``groupBy(key).agg(max_by(payload, lsn))`` — a
declarative aggregate for which Catalyst generates *partial (map-side)
+ final* hash aggregation, i.e. each upstream task pre-collapses every
key it sees to one row before the shuffle.  A hot key therefore ships
at most one row per upstream partition — partial aggregation is itself
the skew mitigation, equivalent to salting with salt = input partition.

``lww_reduce_salted`` is the explicit two-phase variant
(groupBy(key, salt) → groupBy(key)) kept for (a) demonstrating the
strategy the north_rule names, (b) engines/plans where partial agg is
defeated (e.g. after an exchange already hash-partitioned the feed by
key).  Both are tested equivalent; bench.py measures both.

A window (`row_number() over (partition by key order by lsn desc)`)
would sort every partition and ship *all* rows of a hot key to one
reducer — strictly worse at scale; kept only as an oracle in tests.

Physical note: ``max_by(struct(payload), lsn)`` compiles to partial+
final SortAggregate (struct agg buffers aren't hash-agg eligible).
Measured against the hash-agg alternative — ``groupBy(key).agg(
max(lsn))`` on pruned columns + semi-join back for the payload — the
sort-agg wins (1.7s vs 3.4s on a 2M-event, ~1KB-payload feed,
local[8]): the join-back reads and shuffles the payload twice, which
costs more than the per-partition sort.  Partial aggregation still
collapses every key map-side, so the skew property is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lww_reduce(
    df: DataFrame, key: str = "doc_id", order: str = "lsn", with_counts: bool = False
) -> DataFrame:
    """One surviving event per key: the one with the highest ``order``.

    Output columns == input columns (winner's full row).  With
    ``with_counts`` an extra ``_key_events`` column carries the number
    of collapsed events per key — the hot-key/skew signal, computed for
    free inside the same partial+final aggregation (no extra pass over
    the raw feed)."""
    others = [c for c in df.columns if c != key]
    payload = F.struct(*[F.col(c) for c in others])
    aggs = [F.max_by(payload, F.col(order)).alias("_w")]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("_key_events"))
    out = df.groupBy(key).agg(*aggs)
    cols = [key, "_w.*"] + (["_key_events"] if with_counts else [])
    return out.select(*cols)


def lww_reduce_salted(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    salt_buckets: int = 32,
    with_counts: bool = False,
) -> DataFrame:
    """Explicit two-phase salted LWW (SURVEY.md §4 'salted two-phase LWW').

    Phase 1 reduces (key, salt) groups — hot keys are split across
    ``salt_buckets`` reducers; phase 2 reduces the ≤salt_buckets
    survivors per key.  Salt is derived from the order column (pure
    function of the data → deterministic, resume-safe).
    """
    others = [c for c in df.columns if c != key]
    payload = F.struct(*[F.col(c) for c in others])
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order)), F.lit(salt_buckets))
    )
    aggs = [F.max_by(payload, F.col(order)).alias("_w")]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("_part_events"))
    phase1 = (
        salted.groupBy(key, "_salt")
        .agg(*aggs)
        .select(key, F.col("_w.*"), *(["_part_events"] if with_counts else []))
    )
    if not with_counts:
        return lww_reduce(phase1, key=key, order=order)
    others2 = [c for c in phase1.columns if c not in (key, "_part_events")]
    payload2 = F.struct(*[F.col(c) for c in others2])
    return (
        phase1.groupBy(key)
        .agg(
            F.max_by(payload2, F.col(order)).alias("_w"),
            F.sum("_part_events").alias("_key_events"),
        )
        .select(key, "_w.*", "_key_events")
    )
