"""Entity consolidation — merge duplicate entities: one winner keeps
the identity, losers are tombstoned, references are rewritten to the
winner, and lineage records every merge.

Reference semantics reproduced
(/root/reference/src/core/logic/person_consolidator.py):
  * duplicate groups = entities sharing a canonical (normalized) name,
    ≥ 2 members (:74-85);
  * groups whose members carry CONFLICTING stable identifiers are
    skipped — likely homonyms, manual review (:86-96);
  * winner = highest quality score, then lowest id (:97-102);
  * per loser: dependent tables' foreign keys are rewritten to the
    winner, lineage remapped, then the loser row is deleted (:240-264).

Spark shape: the mapping is one window argmax per canonical name; the
"transaction" is two keyed MERGEs (reference rewrite, then loser
tombstones) driven by the broadcast mapping.  The two commits are not
atomic across tables — crash safety comes from IDEMPOTENCE instead:
the mapping is a pure function of the surviving entities, references
already rewritten re-resolve to the same winner, and re-tombstoning a
loser is a merge no-op, so re-running after any crash converges to the
same final state (same contract as the CDC apply kernel)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from horizon_etl_spark.cdc.match import norm_name
from horizon_etl_spark.tables.lake import LakeTable


def consolidation_mapping(
    entities: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    quality_col: str | None = None,
    conflict_col: str | None = None,
) -> DataFrame:
    """Compute the loser→winner mapping: one row per loser with
    (canonical_name, loser_id, winner_id).

    Winner per duplicate group: highest ``quality_col`` (omitted →
    constant), then lowest id (person_consolidator.py:97-102).  Groups
    with more than one distinct non-null ``conflict_col`` value are
    dropped entirely (homonym guard, :86-96)."""
    quality = F.col(quality_col) if quality_col else F.lit(0)
    e = entities.withColumn("_canon", norm_name(F.col(name_col)))
    # null/blank canonical names are NOT duplicate groups: without this
    # guard every unnamed entity would collapse into one group and be
    # merged into an arbitrary winner (the reference skips them
    # explicitly, person_consolidator.py 'if canonical:')
    e = e.filter(F.col("_canon").isNotNull() & (F.col("_canon") != ""))
    if conflict_col is not None:
        ok = (
            e.groupBy("_canon")
            .agg(F.count_distinct(F.col(conflict_col)).alias("_n_ident"))
            .filter(F.col("_n_ident") <= 1)
            .select("_canon")
        )
        e = e.join(F.broadcast(ok), "_canon")
    w = Window.partitionBy("_canon").orderBy(quality.desc(), F.col(id_col).asc())
    ranked = e.withColumn("_rn", F.row_number().over(w))
    winners = ranked.filter(F.col("_rn") == 1).select(
        "_canon", F.col(id_col).alias("winner_id")
    )
    return (
        ranked.filter(F.col("_rn") > 1)
        .select("_canon", F.col(id_col).alias("loser_id"))
        .join(winners, "_canon")
        .select(
            F.col("_canon").alias("canonical_name"),
            "loser_id",
            "winner_id",
        )
    )


def consolidate(
    entity_table: LakeTable,
    mapping: DataFrame,
    lsn: int,
    refs_table: LakeTable | None = None,
    ref_col: str = "ref_id",
    lineage: LakeTable | None = None,
) -> dict[str, int]:
    """Run the consolidation transaction:

      1. rewrite references (``refs_table[ref_col]`` ∈ losers → winner)
         via a keyed MERGE of only the affected rows;
      2. tombstone the loser entities via delete-op MERGE at ``lsn``;
      3. append one lineage row per merge (winner, loser, lsn) —
         the reference's lineage remap (:263).

    ``lsn`` must exceed every lsn already applied to the touched rows
    (callers use the table's high-watermark + 1); re-running with the
    same mapping+lsn is a no-op (idempotent).

    Ordering: lineage is written FIRST.  The merges tombstone the losers,
    so a crash after them leaves a recomputed mapping EMPTY — lineage
    written last would be lost forever.  Written first it survives any
    crash, and the ``consolidation_lsn_applied`` marker carried in the
    lineage table's props makes the append itself idempotent (same
    contract as the change-log batch watermark), so the documented
    re-run-to-recover move never duplicates lineage rows.  The marker
    is the LAST-WRITTEN lsn, not a high-watermark: the lsn contract is
    per-touched-rows, so a later consolidation over a different row set
    may legitimately carry a LOWER lsn and must still record lineage —
    only an exact replay of the previous call (crash recovery, which by
    construction reuses the same lsn) is skipped."""
    spark = mapping.sparkSession
    mapping = mapping.persist()
    n_losers = mapping.count()  # materialize once; also the lineage row count

    if lineage is not None and n_losers > 0:
        applied = int(lineage.props.get("consolidation_lsn_applied", -1))
        if lsn != applied:
            lineage.append(
                mapping.select(
                    "canonical_name",
                    "winner_id",
                    "loser_id",
                    F.lit(lsn).cast("long").alias("lsn"),
                ),
                operation="consolidation",
                props={"consolidation_lsn_applied": str(lsn)},
            )

    rewritten = 0
    if refs_table is not None:
        refs = refs_table.read(spark)
        key = refs_table.key_col
        m = F.broadcast(mapping.select("loser_id", "winner_id"))
        affected = (
            refs.join(m, refs[ref_col] == m["loser_id"])
            .withColumn(ref_col, F.col("winner_id"))
            .drop("loser_id", "winner_id")
        )
        batch = affected.select(
            F.lit("update").alias("op"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[c for c in refs.columns],
        )
        stats = refs_table.merge(batch)
        rewritten = stats["applied"]

    losers = mapping.select(
        F.lit("delete").alias("op"),
        F.col("loser_id").alias(entity_table.key_col),
        F.lit(lsn).cast("long").alias("lsn"),
    )
    del_stats = entity_table.merge(losers)
    mapping.unpersist()
    return {
        "merges": n_losers,
        "refs_rewritten": rewritten,
        "losers_deleted": del_stats["deleted"],
    }
