"""Entity matching: ladder semantics, blocked fuzzy scorer (J6), and
the apply-path composition where unresolved keys quarantine."""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.match import (
    fuzzy_resolve_blocked,
    resolve_entities,
    token_sort_ratio,
)

REGISTRY = [
    (1, "maria silva santos"),
    (2, "joao pereira"),
    (3, "ana beatriz costa"),
    (4, "pedro alves"),
]


def reg_df(spark):
    return spark.createDataFrame(REGISTRY, "cid long, name string")


def test_ladder_priorities(spark):
    src = spark.createDataFrame(
        [
            (10, "maria silva santos"),     # exact
            (11, "Maria Silva  Santos"),    # normalized (case+spaces)
            (12, "santos maria silva"),     # token sort
            (13, "carlos nobody"),          # unresolved
        ],
        "src_id long, qname string",
    )
    out = {
        r["src_id"]: (r["canonical_id"], r["match_strategy"], r["match_confidence"])
        for r in resolve_entities(src, reg_df(spark)).collect()
    }
    assert out[10] == (1, "exact_name", 100)
    assert out[11] == (1, "normalized_name", 95)
    assert out[12] == (1, "token_sort", 90)
    assert out[13] == (None, "unresolved", None)


def test_fuzzy_blocked_matches_python_scorer(spark):
    """Typo'd names: the distributed blocked scorer must agree with the
    pure-python token_sort_ratio reference on both membership and
    score."""
    cases = [
        (20, "maria silvaa santos"),   # typo, same first token → scored
        (21, "maria de souza lima"),   # same block, low ratio → dropped
        (22, "pedro alvez"),           # typo
        (23, "zacharias unknown"),     # block miss → dropped
    ]
    src = spark.createDataFrame(cases, "src_id long, qname string")
    out = {
        r["src_id"]: (r["canonical_id"], r["match_confidence"])
        for r in fuzzy_resolve_blocked(src, reg_df(spark)).collect()
    }
    # python reference: best candidate in the same block with ratio>=90
    expected = {}
    for sid, q in cases:
        blk = q.split()[0]
        best = None
        for cid, name in REGISTRY:
            if name.split()[0] != blk:
                continue
            s = token_sort_ratio(q, name)
            if s >= 90 and (best is None or s > best[1] or (s == best[1] and cid < best[0])):
                best = (cid, s)
        if best:
            expected[sid] = best
    assert out == expected
    assert 20 in out and 22 in out and 21 not in out and 23 not in out


def test_fuzzy_duplicate_dirty_names_each_resolve(spark):
    """Two distinct source rows with the SAME dirty name must each keep
    their own output row (window partitions by row id, not name)."""
    src = spark.createDataFrame(
        [(30, "maria silvaa santos"), (31, "maria silvaa santos")],
        "src_id long, qname string",
    )
    out = fuzzy_resolve_blocked(src, reg_df(spark)).collect()
    assert {r["src_id"] for r in out} == {30, 31}
    assert all(r["canonical_id"] == 1 for r in out)


def test_apply_path_unresolved_keys_quarantine(spark, tmp_table_dir):
    """Composition with the CDC kernel: a feed keyed by dirty names is
    resolved first; resolved rows apply under their canonical doc_id,
    unresolved rows land in the quarantine table with a reason, and a
    matches lineage table records strategy+confidence (reference
    entity_matches, entity_match.py:8-33)."""
    from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch
    from horizon_etl_spark.tables.lake import LakeTable
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    feed = spark.createDataFrame(
        [
            ("update", "maria silva santos", 1, [1, 2], 2, "wiki"),
            ("update", "Santos maria silva", 2, [3], 1, "wiki"),
            ("update", "ghost entity", 3, [4], 1, "code"),
        ],
        "op string, qname string, lsn long, tokens array<int>, n_tok int, source string",
    )
    resolved = resolve_entities(feed, reg_df(spark))
    ok = resolved.filter(F.col("match_strategy") != "unresolved")
    bad = resolved.filter(F.col("match_strategy") == "unresolved")

    # lineage: entity_matches rows
    matches = LakeTable.create(
        os.path.join(tmp_table_dir, "matches"),
        StructType(
            [
                StructField("qname", StringType(), True),
                StructField("canonical_id", LongType(), True),
                StructField("match_strategy", StringType(), True),
                StructField("match_confidence", LongType(), True),
            ]
        ),
    )
    matches.append(
        ok.select(
            "qname", "canonical_id", "match_strategy",
            F.col("match_confidence").cast("long").alias("match_confidence"),
        )
    )

    batch = ok.select(
        "op",
        F.concat(F.lit("e"), F.col("canonical_id").cast("string")).alias("doc_id"),
        "lsn", "tokens", "n_tok", "source",
        F.lit(None).cast("timestamp").alias("ts"),
    )
    apply_batch(pipe, batch, batch_id=0, collect_metrics=False, with_change_log=False)
    pipe.quarantine.append(
        bad.select(
            "op",
            F.col("qname").alias("doc_id"),
            "lsn", "tokens", "n_tok", "source",
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit("unresolved_key").alias("reason"),
            F.lit(0).cast("long").alias("batch_id"),
        )
    )

    target = {r["doc_id"]: r for r in pipe.target.read(spark).collect()}
    assert set(target) == {"e1"}  # both resolved rows hit entity 1; lsn 2 wins
    assert target["e1"]["tokens"] == [3]
    q = pipe.quarantine.read(spark).collect()
    assert len(q) == 1 and q[0]["reason"] == "unresolved_key"
    assert q[0]["doc_id"] == "ghost entity"
    m = {r["qname"]: r["match_strategy"] for r in matches.read(spark).collect()}
    assert m == {
        "maria silva santos": "exact_name",
        "Santos maria silva": "token_sort",
    }


def test_fuzzy_blocked_shuffle_join_parity(spark):
    """broadcast_registry=False (registries too large to broadcast):
    the shuffle-join plan must produce identical resolutions, and the
    plan must actually shuffle on the block key instead of broadcasting."""
    src = spark.createDataFrame(
        [(20, "maria silvaa santos"), (22, "pedro alvez")],
        "src_id long, qname string",
    )
    bcast = fuzzy_resolve_blocked(src, reg_df(spark))
    # with auto-broadcast off, only a hardcoded F.broadcast hint could
    # still produce a BroadcastHashJoin — proving the opt-out is real
    # (with defaults AQE may still CHOOSE broadcast for a small side,
    # which is exactly the adaptive behavior the opt-out enables)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuf = fuzzy_resolve_blocked(src, reg_df(spark), broadcast_registry=False)
        rows = sorted(map(tuple, shuf.collect()))
        plan = shuf._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted(map(tuple, bcast.collect())) == rows
    assert "BroadcastHashJoin" not in plan, plan[:1500]
