"""Multi-relationship graph (SURVEY §2 A9/J8 breadth): several edge
FAMILIES from different evidence tables merged into one weighted
multigraph with per-edge per-type counts — the reference builds its
people graph exactly this way, folding three relationship types
(initiative co-membership, research-group co-membership, advisorship
pairs) into one NetworkX graph whose edges carry a ``<type>_count``
per family, a total ``weight``, and a ``relation_types`` list, and
whose nodes carry ``degree`` / ``weighted_degree`` rollups
(/root/reference/src/core/logic/people_relationship_graph_generator.py:
366-434 `_add_*_relationships`, 436-452 `_finalize_graph`).

Spark-first shape (NOT a row-at-a-time ``itertools.combinations``
port): every family is a BLOCKED self- or equi-join —

* ``cosupply``  (S–S): suppliers co-occurring in an order; pair
  generation blocked per ``l_orderkey`` over the distinct
  (order, supplier) set, weight = co-supplied orders.
* ``copart``    (S–S): suppliers supplying the same part; blocked per
  ``l_partkey``, weight = co-supplied parts.
* ``trade``     (C–S): customer→supplier evidence pairs from
  ``orders ⋈ lineitem`` (the advisorship slot: a directed pair read
  straight off a fact table), weight = lineitems.

Blocking keys (order, part) have bounded fan-out, so pair counts are
Σ C(block,2) — never an unblocked cross join; the merge and the degree
rollup are plain groupBys on (src, dst) / node.  At 100 TB each family
is a shuffle equi-join on its blocking key and the merged graph is one
more hash aggregation — the same plan family as the CDC merges.

Node ids are namespaced ('S'+suppkey, 'C'+custkey) exactly as the
reference normalizes person ids before merging families
(people_relationship_graph_generator.py:478-487).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.queries.registry import register, table

RELATION_TYPES = ("cosupply", "copart", "trade")


def _pair_family(df: DataFrame, block: str, member: str, rel_type: str) -> DataFrame:
    """Within-block unordered pair generation + weight rollup: distinct
    (block, member) → pairs (a < b) per block → weight = #blocks the
    pair co-occurs in.  The reference's ``combinations(sorted(...), 2)``
    per initiative/group (people_relationship_graph_generator.py:383,
    403-404) as one blocked self-join."""
    m = df.select(block, member).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block}") == F.col(f"b.{block}"))
            & (F.col(f"a.{member}") < F.col(f"b.{member}")),
        )
        .groupBy(
            F.concat(F.lit("S"), F.col(f"a.{member}").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col(f"b.{member}").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select(F.lit(rel_type).alias("rel_type"), "src", "dst", "w")
    )


def relationship_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-family weighted edge lists, one frame:
    (rel_type, src, dst, w)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cosupply = _pair_family(l, "l_orderkey", "l_suppkey", "cosupply")
    copart = _pair_family(l, "l_partkey", "l_suppkey", "copart")
    trade = (
        l.select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select(F.lit("trade").alias("rel_type"), "src", "dst", "w")
    )
    return cosupply.unionByName(copart).unionByName(trade)


def relationship_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merged multigraph edge table: one row per (src, dst) with
    per-type counts, total weight, and the ``relation_types`` list —
    the reference's edge payload (`_increment_edge` counters +
    `_finalize_graph` relation_types, people_relationship_graph_
    generator.py:436-452)."""
    fam = relationship_families(spark, sf_dir)
    per_type = [
        F.coalesce(
            F.sum(F.when(F.col("rel_type") == t, F.col("w"))), F.lit(0)
        )
        .cast("long")
        .alias(f"{t}_count")
        for t in RELATION_TYPES
    ]
    e = fam.groupBy("src", "dst").agg(
        *per_type,
        F.sum("w").cast("long").alias("weight"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    types_arr = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(F.col(f"{t}_count") > 0, F.lit(t))
                    for t in RELATION_TYPES
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return e.withColumn("relation_types", types_arr)


def relationship_degrees(
    spark: SparkSession, sf_dir: str, edges: DataFrame | None = None
) -> DataFrame:
    """Node rollup over the merged graph: (node, kind, degree,
    weighted_degree) — `_finalize_graph`'s degree / weighted-degree
    node attributes.  Pass precomputed (persisted) ``edges`` to share
    one family scan with an edge consumer."""
    e = edges if edges is not None else relationship_edges(spark, sf_dir)
    ends = e.select(F.col("src").alias("node"), "weight").unionByName(
        e.select(F.col("dst").alias("node"), "weight")
    )
    return ends.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("weight").cast("long").alias("weighted_degree"),
    ).withColumn(
        "kind",
        F.when(F.col("node").startswith("S"), F.lit("supplier")).otherwise(
            F.lit("customer")
        ),
    )


def _degree_md5(edges: DataFrame) -> DataFrame:
    """Per-group degree-multiset witness: groupBy rel_type → for each
    node (degree, weighted_degree), folded into one md5 over the
    sorted ``node:degree:wdeg`` strings.  A TEST/driver witness (the
    collect_list is per rel_type over the sf0.01 node set); the
    production surface at scale is the ``relationship_degrees``
    DataFrame itself."""
    ends = edges.select("rel_type", F.col("src").alias("node"), "w").unionByName(
        edges.select("rel_type", F.col("dst").alias("node"), "w")
    )
    deg = ends.groupBy("rel_type", "node").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("w").cast("long").alias("wdeg"),
    )
    s = F.concat_ws(":", "node", "degree", "wdeg")
    return deg.groupBy("rel_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list(s)))).alias(
            "degree_md5"
        ),
    )


@register(
    "relationship_graph_summary",
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    fam AS (
      SELECT 'cosupply' AS rel_type,
             'S' || a.l_suppkey AS src, 'S' || b.l_suppkey AS dst,
             COUNT(*) AS w
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 2, 3
      UNION ALL
      SELECT 'copart', 'S' || a.l_suppkey, 'S' || b.l_suppkey, COUNT(*)
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 2, 3
      UNION ALL
      SELECT 'trade', 'C' || o.o_custkey, 'S' || l.l_suppkey, COUNT(*)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 2, 3
    ),
    merged AS (
      SELECT 'all' AS rel_type, src, dst, SUM(w) AS w,
             COUNT(DISTINCT rel_type) AS n_types
      FROM fam GROUP BY src, dst
    ),
    edgesets AS (
      SELECT rel_type, src, dst, w FROM fam
      UNION ALL
      SELECT rel_type, src, dst, w FROM merged
    ),
    sums AS (
      SELECT rel_type, CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(SUM(w) AS BIGINT) AS total_weight
      FROM edgesets GROUP BY rel_type
    ),
    deg AS (
      SELECT rel_type, node, CAST(COUNT(*) AS BIGINT) AS degree,
             CAST(SUM(w) AS BIGINT) AS wdeg
      FROM (
        SELECT rel_type, src AS node, w FROM edgesets
        UNION ALL
        SELECT rel_type, dst AS node, w FROM edgesets
      ) GROUP BY rel_type, node
    ),
    hashes AS (
      SELECT rel_type, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             md5(string_agg(node || ':' || degree || ':' || wdeg, '|'
                 ORDER BY node || ':' || degree || ':' || wdeg))
               AS degree_md5
      FROM deg GROUP BY rel_type
    )
    SELECT s.rel_type, s.n_edges, s.total_weight, h.n_nodes,
           CASE WHEN s.rel_type = 'all'
                THEN (SELECT CAST(COUNT(*) AS BIGINT) FROM merged
                      WHERE n_types >= 2)
                ELSE CAST(0 AS BIGINT) END AS multi_type_edges,
           h.degree_md5
    FROM sums s JOIN hashes h ON s.rel_type = h.rel_type
    """,
)
def relationship_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable witness for the multi-relationship graph: one
    row per edge family + one for the merged multigraph ('all'), each
    carrying edge count, total weight, node count, multi-type edge
    count, and an md5 over the full (node, degree, weighted_degree)
    multiset — so the driver hash proves every family's pair
    generation, the cross-family merge, AND the degree rollup
    (supersedes the single-family ``cosupply_weighted_degree`` row:
    its A9 weighted-degree check is the 'cosupply' family hash here).
    Reference semantics: people_relationship_graph_generator.py:
    366-452 (three `_add_*_relationships` + `_finalize_graph`)."""
    fam = relationship_families(spark, sf_dir)
    merged = (
        fam.groupBy("src", "dst")
        .agg(
            F.sum("w").alias("w"),
            F.countDistinct("rel_type").alias("n_types"),
        )
        .select(F.lit("all").alias("rel_type"), "src", "dst", "w", "n_types")
    )
    edgesets = fam.withColumn("n_types", F.lit(1)).unionByName(merged)
    sums = edgesets.groupBy("rel_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("w").cast("long").alias("total_weight"),
        F.sum(F.when(F.col("n_types") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("multi_raw"),
    )
    hashes = _degree_md5(edgesets.select("rel_type", "src", "dst", "w"))
    return (
        sums.join(hashes, "rel_type")
        .select(
            "rel_type",
            "n_edges",
            "total_weight",
            "n_nodes",
            F.when(F.col("rel_type") == "all", F.col("multi_raw"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("multi_type_edges"),
            "degree_md5",
        )
    )


def export_relationship_graph(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    name: str = "relationship_graph",
    source_version: int | None = None,
) -> dict:
    """Publish the multigraph as the atomic nodes/edges Parquet pair
    (exports.export_graph) — edges carry ``relation_types`` plus
    per-family counts, nodes carry degree rollups, matching the
    reference's serialized graph payload (people_relationship_graph_
    generator.py:436-452 + export_parquet.py:31-80).  The family scan
    is computed once and shared by both tables via persist."""
    from horizon_etl_spark.exports import export_graph

    edges = relationship_edges(spark, sf_dir).persist()
    try:
        nodes = relationship_degrees(spark, sf_dir, edges=edges)
        return export_graph(
            spark,
            nodes,
            edges.drop("n_types"),
            out_dir,
            name,
            source_version=source_version,
        )
    finally:
        edges.unpersist()
