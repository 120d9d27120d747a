"""Consolidation transaction: winner keeps identity, losers tombstoned,
references rewritten, lineage recorded; idempotent under re-run and
crash-between-commits."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from horizon_etl_spark.cdc.consolidate import consolidate, consolidation_mapping
from horizon_etl_spark.tables.lake import LakeTable

ENTITIES = [
    # (id, name, quality, ident)  — 'ana maria' dup group, 'joao' homonym conflict
    (1, "Ana Maria", 10, "id-A"),
    (2, "ana  maria", 50, None),      # winner of group (higher quality)
    (3, "ANA MARIA", 50, "id-A"),     # same quality as 2 → higher id loses
    (4, "joao", 10, "cpf-1"),
    (5, "joao", 90, "cpf-2"),         # conflicting idents → group skipped
    (6, "unique person", 1, None),
]

REFS = [(100, 1), (101, 2), (102, 3), (103, 4), (104, 6)]  # (ref_id, entity_id)


def build(spark, tmp_table_dir):
    ent = LakeTable.create(
        os.path.join(tmp_table_dir, "entities"),
        StructType(
            [
                StructField("id", LongType(), False),
                StructField("name", StringType(), True),
                StructField("quality", LongType(), True),
                StructField("ident", StringType(), True),
            ]
        ),
        key_col="id",
        bucket_count=4,
    )
    ent.merge(
        spark.createDataFrame(
            [("insert", i, i, n, q, d) for i, n, q, d in ENTITIES],
            "op string, id long, lsn long, name string, quality long, ident string",
        )
    )
    refs = LakeTable.create(
        os.path.join(tmp_table_dir, "refs"),
        StructType(
            [
                StructField("ref_id", LongType(), False),
                StructField("entity_id", LongType(), True),
            ]
        ),
        key_col="ref_id",
        bucket_count=4,
    )
    refs.merge(
        spark.createDataFrame(
            [("insert", r, r, e) for r, e in REFS],
            "op string, ref_id long, lsn long, entity_id long",
        )
    )
    lineage = LakeTable.create(
        os.path.join(tmp_table_dir, "lineage"),
        StructType(
            [
                StructField("canonical_name", StringType(), True),
                StructField("winner_id", LongType(), True),
                StructField("loser_id", LongType(), True),
                StructField("lsn", LongType(), True),
            ]
        ),
    )
    return ent, refs, lineage


def test_mapping_winner_and_homonym_guard(spark, tmp_table_dir):
    ent, _, _ = build(spark, tmp_table_dir)
    m = {
        r["loser_id"]: r["winner_id"]
        for r in consolidation_mapping(
            ent.read(spark), id_col="id", name_col="name",
            quality_col="quality", conflict_col="ident",
        ).collect()
    }
    # winner = quality 50, lowest id 2; losers 1 and 3; joao group skipped
    assert m == {1: 2, 3: 2}


def test_mapping_skips_null_and_blank_names(spark):
    """Null/blank canonical names are not duplicate groups: unnamed
    entities must never merge into one arbitrary winner (reference
    person_consolidator 'if canonical:' skip)."""
    e = spark.createDataFrame(
        [
            (1, None, 10.0),
            (2, "", 20.0),
            (3, "   ", 30.0),
            (4, "Ana", 5.0),
            (5, "ana ", 1.0),
        ],
        "id long, name string, quality double",
    )
    m = {
        r["loser_id"]: r["winner_id"]
        for r in consolidation_mapping(
            e, id_col="id", name_col="name", quality_col="quality"
        ).collect()
    }
    assert m == {5: 4}, "only the real duplicate group merges"


def test_consolidate_transaction(spark, tmp_table_dir):
    ent, refs, lineage = build(spark, tmp_table_dir)
    mapping = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    )
    stats = consolidate(ent, mapping, lsn=1000, refs_table=refs,
                        ref_col="entity_id", lineage=lineage)
    assert stats == {"merges": 2, "refs_rewritten": 2, "losers_deleted": 2}

    alive = {r["id"] for r in ent.read(spark).collect()}
    assert alive == {2, 4, 5, 6}
    owners = {r["ref_id"]: r["entity_id"] for r in refs.read(spark).collect()}
    assert owners == {100: 2, 101: 2, 102: 2, 103: 4, 104: 6}
    lin = {(r["loser_id"], r["winner_id"]) for r in lineage.read(spark).collect()}
    assert lin == {(1, 2), (3, 2)}

    # idempotent re-run with the same mapping + lsn: no-op
    stats2 = consolidate(ent, mapping, lsn=1000, refs_table=refs, ref_col="entity_id")
    assert stats2["refs_rewritten"] == 0 and stats2["losers_deleted"] == 0


def test_crash_between_rewrite_and_tombstone_converges(spark, tmp_table_dir):
    """Simulated crash: references were rewritten but losers were not
    tombstoned (the non-atomic window).  Re-running the whole
    transaction converges to the same final state because the mapping
    is a pure function of the surviving entities."""
    ent, refs, lineage = build(spark, tmp_table_dir)
    mapping = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    ).persist()
    # phase 1 only: rewrite refs (crash before the tombstone merge)
    rewritten = (
        refs.read(spark)
        .join(F.broadcast(mapping.select("loser_id", "winner_id")),
              F.col("entity_id") == F.col("loser_id"))
        .withColumn("entity_id", F.col("winner_id"))
        .select(F.lit("update").alias("op"), F.lit(999).cast("long").alias("lsn"),
                "ref_id", "entity_id")
    )
    refs.merge(rewritten)
    # full re-run after restart
    mapping2 = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    )
    consolidate(ent, mapping2, lsn=1000, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    alive = {r["id"] for r in ent.read(spark).collect()}
    assert alive == {2, 4, 5, 6}
    owners = {r["ref_id"]: r["entity_id"] for r in refs.read(spark).collect()}
    assert owners == {100: 2, 101: 2, 102: 2, 103: 4, 104: 6}


def test_lineage_idempotent_and_crash_safe(spark, tmp_table_dir):
    """Lineage is written BEFORE the destructive merges and carries an
    lsn high-watermark: the documented re-run-to-recover move must not
    duplicate lineage rows, and a crash AFTER the tombstone merge (when
    a recomputed mapping is empty) must not lose the merge record."""
    ent, refs, lineage = build(spark, tmp_table_dir)
    mapping = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    ).persist()

    consolidate(ent, mapping, lsn=1000, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    # re-run with the SAME mapping+lsn (recovery replay): no duplicates
    consolidate(ent, mapping, lsn=1000, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    rows = lineage.read(spark).collect()
    assert len(rows) == 2
    assert {(r["loser_id"], r["winner_id"]) for r in rows} == {(1, 2), (3, 2)}

    # crash-after-tombstone shape: recomputed mapping is empty, re-run
    # is a total no-op but the lineage above already survived
    mapping2 = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    )
    stats = consolidate(ent, mapping2, lsn=1001, refs_table=refs,
                        ref_col="entity_id", lineage=lineage)
    assert stats == {"merges": 0, "refs_rewritten": 0, "losers_deleted": 0}
    assert lineage.read(spark).count() == 2


def test_lineage_written_for_later_lower_lsn_round(spark, tmp_table_dir):
    """The lsn contract is per-touched-rows, so a later consolidation
    over a DISJOINT row set may legitimately carry a lower lsn than a
    previous round — its lineage must still be recorded (only an exact
    replay of the immediately-previous call is skipped)."""
    ent, refs, lineage = build(spark, tmp_table_dir)
    mapping = consolidation_mapping(
        ent.read(spark), id_col="id", name_col="name",
        quality_col="quality", conflict_col="ident",
    ).persist()
    consolidate(ent, mapping, lsn=1000, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    assert lineage.read(spark).count() == 2

    # disjoint second round at a LOWER lsn (its touched rows never saw
    # lsn 1000) — manual mapping over the conflict-skipped pair
    mapping2 = spark.createDataFrame(
        [("joao", 5, 4)], "canonical_name string, winner_id long, loser_id long"
    )
    consolidate(ent, mapping2, lsn=401, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    rows = lineage.read(spark).collect()
    assert len(rows) == 3
    assert {(r["loser_id"], r["winner_id"], r["lsn"]) for r in rows} == {
        (1, 2, 1000), (3, 2, 1000), (4, 5, 401),
    }
    # exact replay of the lower-lsn round stays idempotent
    consolidate(ent, mapping2, lsn=401, refs_table=refs,
                ref_col="entity_id", lineage=lineage)
    assert lineage.read(spark).count() == 3
