"""Entity-matching queries: the key-resolution ladder as an
oracle-checked query over synthesized dirty source names.

The registry is the ``part`` table (multi-word names); incoming source
records are deterministic corruptions of those names — exact copies,
case-mangled, token-reordered, and unknown — so every ladder stage
(and the unresolved branch) is exercised and exactly reproducible in
DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.queries.registry import register, table

_NORM = "lower(trim(regexp_replace({c}, ' +', ' ', 'g')))"
_TOK = (
    "list_aggregate(list_sort(string_split("
    + _NORM
    + ", ' ')), 'string_agg', ' ')"
)


@register(
    "entity_resolution",
    oracle=f"""
    WITH reg AS (SELECT p_partkey AS cid, p_name AS name FROM part),
    re AS (SELECT name AS k, min(cid) AS cid FROM reg GROUP BY 1),
    rn AS (SELECT {_NORM.format(c="name")} AS k, min(cid) AS cid FROM reg GROUP BY 1),
    rt AS (SELECT {_TOK.format(c="name")} AS k, min(cid) AS cid FROM reg GROUP BY 1),
    src AS (
      SELECT p_partkey AS src_id,
             CASE CAST(p_partkey % 4 AS INT)
               WHEN 0 THEN p_name
               WHEN 1 THEN upper(p_name)
               WHEN 2 THEN list_aggregate(list_reverse(string_split(p_name, ' ')),
                                          'string_agg', ' ')
               ELSE 'zz unknown entity ' || CAST(p_partkey AS VARCHAR)
             END AS qname
      FROM part
    )
    SELECT CAST(src_id AS BIGINT) AS src_id,
           CAST(coalesce(e.cid, n.cid, t.cid) AS BIGINT) AS canonical_id,
           CASE WHEN e.cid IS NOT NULL THEN 'exact_name'
                WHEN n.cid IS NOT NULL THEN 'normalized_name'
                WHEN t.cid IS NOT NULL THEN 'token_sort'
                ELSE 'unresolved' END AS match_strategy,
           CAST(CASE WHEN e.cid IS NOT NULL THEN 100
                     WHEN n.cid IS NOT NULL THEN 95
                     WHEN t.cid IS NOT NULL THEN 90 END AS BIGINT) AS match_confidence
    FROM src
    LEFT JOIN re e ON src.qname = e.k
    LEFT JOIN rn n ON {_NORM.format(c="src.qname")} = n.k
    LEFT JOIN rt t ON {_TOK.format(c="src.qname")} = t.k
    """,
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-laddered key resolution (reference entity_match +
    researcher_resolution ladder, /root/reference/src/tracking/entities/
    entity_match.py:8-33, /root/reference/src/core/logic/
    researcher_resolution.py:119-165): exact name → normalized name →
    sorted-token name, each a broadcast join against a key-deduplicated
    registry; unresolved rows keep strategy='unresolved' (the caller's
    quarantine feed)."""
    from horizon_etl_spark.cdc.match import resolve_entities

    p = table(spark, sf_dir, "part")
    registry = p.select(F.col("p_partkey").alias("cid"), F.col("p_name").alias("name"))
    m = (F.col("p_partkey") % 4).cast("int")
    qname = (
        F.when(m == 0, F.col("p_name"))
        .when(m == 1, F.upper("p_name"))
        .when(m == 2, F.array_join(F.reverse(F.split(F.col("p_name"), " ")), " "))
        .otherwise(
            F.concat(F.lit("zz unknown entity "), F.col("p_partkey").cast("string"))
        )
    )
    src = p.select(F.col("p_partkey").cast("long").alias("src_id"), qname.alias("qname"))
    out = resolve_entities(src, registry, src_name="qname", reg_name="name", reg_id="cid")
    return out.select(
        "src_id",
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "match_strategy",
        "match_confidence",
    ).drop("qname")


_MAPPING_CTE = """
    e AS (SELECT p_partkey AS id,
                 lower(trim(regexp_replace(p_name, ' +', ' ', 'g'))) AS canon,
                 CAST(p_retailprice AS DECIMAL(18,2)) AS q
          FROM part),
    r AS (SELECT *, row_number() OVER (PARTITION BY canon
                                       ORDER BY q DESC, id ASC) AS rn FROM e),
    mapping AS (
      SELECT l.canon AS canonical_name,
             l.id AS loser_id, w.id AS winner_id
      FROM r l JOIN r w ON l.canon = w.canon AND w.rn = 1
      WHERE l.rn > 1)
"""


def _part_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast("decimal(18,2)").alias("q"),
    )


def entity_consolidation_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-entity consolidation mapping (W2 winner selection,
    /root/reference/src/core/logic/person_consolidator.py:74-102):
    groups = parts sharing a canonical name, winner = highest retail
    price then lowest id, one output row per loser.  Unregistered —
    the mapping is driver-witnessed through ``entity_consolidation_refs``
    (which computes it internally and joins it against lineitem);
    kept callable for tests."""
    from horizon_etl_spark.cdc.consolidate import consolidation_mapping

    m = consolidation_mapping(
        _part_entities(spark, sf_dir), id_col="id", name_col="name", quality_col="q"
    )
    return m.select(
        "canonical_name",
        F.col("loser_id").cast("long").alias("loser_id"),
        F.col("winner_id").cast("long").alias("winner_id"),
    )


@register(
    "entity_consolidation_refs",
    oracle=f"""
    WITH {_MAPPING_CTE}
    SELECT CAST(coalesce(m.winner_id, l.l_partkey) AS BIGINT) AS owner_id,
           CAST(COUNT(*) AS BIGINT) AS n_refs
    FROM lineitem l LEFT JOIN mapping m ON l.l_partkey = m.loser_id
    GROUP BY 1
    """,
)
def entity_consolidation_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-consolidation reference ownership: every lineitem reference
    to a loser is rewritten to its winner
    (person_consolidator.py:240-264 FK rewrite), then references are
    counted per surviving owner."""
    from horizon_etl_spark.cdc.consolidate import consolidation_mapping

    m = consolidation_mapping(
        _part_entities(spark, sf_dir), id_col="id", name_col="name", quality_col="q"
    ).select("loser_id", "winner_id")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(m), l.l_partkey == m.loser_id, "left")
        .select(
            F.coalesce(F.col("winner_id"), F.col("l_partkey"))
            .cast("long")
            .alias("owner_id")
        )
        .groupBy("owner_id")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
