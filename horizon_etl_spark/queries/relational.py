"""Relational read-path operators over the TPC-H-ish testdata tables.

Each query re-expresses one operator family from the reference's export
path (SURVEY.md §2.2-§2.7); docstrings cite the reference behavior
being reproduced.  All are scale-safe plans: filters first (pushed to
the parquet scan), broadcast for dimension joins, partial+final hash
aggregation for group-bys, window functions only partitioned by
high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from horizon_etl_spark.queries.registry import register, table


def _dec(c: str, t: str = "decimal(18,2)") -> F.Column:
    return F.col(c).cast(t)


def _cents(col: F.Column, scale: int = 2) -> F.Column:
    """Exact decimal aggregate → BIGINT in 10^-scale units.

    Money/quantity outputs are emitted as integer cents (scale=2) or
    ten-thousandths (scale=4), never as DECIMAL: arithmetic stays exact
    decimal internally, but the *output representation* is a plain
    BIGINT that hashes identically across engines (Spark Decimal and
    DuckDB DECIMAL stringify differently in the driver's canonicalizer).
    """
    return (col * F.lit(10**scale)).cast("long")


# ---------------------------------------------------------------- A4/P1
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_quantity < 30
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter/sum rollup marts (A4): canonical_exporter.py:2232-2345."""
    l = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_quantity") < 30)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _cents(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _cents(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _cents(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))), 4)
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------------------ J1
@register(
    "region_revenue",
    oracle="""
    SELECT r.r_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join chain (J1): canonical_exporter.py:232-315.
    nation/region/customer are broadcast — no shuffle of the fact."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            _cents(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))), 4)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------- J1+A5+O3
@register(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, year(o.o_orderdate)
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N ranking (A5): canonical_exporter.py:2348-2361, with the
    J1 join chain; deterministic tiebreak on the key."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            _cents(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))), 4)
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------------ J2
@register(
    "first_part_per_order",
    oracle="""
    SELECT f.l_orderkey AS orderkey, f.first_partkey, p.p_name
    FROM (SELECT l_orderkey, CAST(MIN(l_partkey) AS BIGINT) AS first_partkey
          FROM lineitem GROUP BY l_orderkey) f
    JOIN part p ON f.first_partkey = p.p_partkey
    """,
)
def first_part_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregated-subquery join (J2): canonical_exporter.py:181-192 —
    MIN(member) per parent then join back for attributes."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    firsts = l.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.min("l_partkey").cast("long").alias("first_partkey")
    )
    return firsts.join(F.broadcast(p), firsts.first_partkey == p.p_partkey).select(
        "orderkey", "first_partkey", "p_name"
    )


# ------------------------------------------------------------------ J3
@register(
    "orders_without_lineitems",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J3): canonical_exporter.py:415-422 NOT IN subquery."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return o.join(l, o.o_orderkey == l.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


# ------------------------------------------------------------------ J4
@register(
    "ordered_parts_per_brand",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    GROUP BY p_brand
    """,
)
def ordered_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join existence check (J4): initiative_linker.py:287-291."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ------------------------------------------------------------------ J5
@register(
    "brand_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS gross,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast lookup join (J5): the reference preloads dimension
    dicts into driver memory (project_loader.py:101-110); here the dim
    is broadcast to every executor — same build-side idea, distributed."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            _cents(F.sum(_dec("l_extendedprice"))).alias("gross"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ------------------------------------------------------------------ J7
@register(
    "ship_within_30d",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_shipped
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def ship_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval membership join (J7): mart_generator.py:326-331
    (start <= Y <= end) — equi-key join + range residual predicate."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return l.join(o, cond).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_shipped"))


# ------------------------------------------------------------------ J8
@register(
    "supplier_pairs_same_nation",
    oracle="""
    SELECT n.n_name, a.s_suppkey AS supp_a, b.s_suppkey AS supp_b
    FROM supplier a
    JOIN supplier b ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    JOIN nation n ON a.s_nationkey = n.n_nationkey
    """,
)
def supplier_pairs_same_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join pair generation (J8): collaboration-graph edges from
    itertools.combinations (people_collaboration_graph_generator.py:83-88)."""
    s = table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    n = table(spark, sf_dir, "nation")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .join(F.broadcast(n), F.col("a.s_nationkey") == n.n_nationkey)
        .select(
            "n_name",
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
        )
    )


# ------------------------------------------------------------------ A1
@register(
    "segment_dup_audit",
    oracle="""
    SELECT lower(c_mktsegment) AS segment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY lower(c_mktsegment) HAVING COUNT(*) > 1
    """,
)
def segment_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-count with HAVING (A1): duplicate_auditor.py:23-48."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.lower("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# ------------------------------------------------------------------ A3
@register(
    "customer_order_span",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(MIN(year(o_orderdate)) AS BIGINT) AS first_year,
           CAST(MAX(year(o_orderdate)) AS BIGINT) AS last_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def customer_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX rollup to parent (A3): project_loader.py:149-257."""
    o = table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").cast("long")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(y).alias("first_year"),
        F.max(y).alias("last_year"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ------------------------------------------------------------------ A6
@register(
    "orders_per_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY year(o_orderdate)
    """,
)
def orders_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year evolution with distinct entities (A6):
    mart_generator.py:199-376."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------- A7/W2
@register(
    "top_customer_per_nation",
    oracle="""
    SELECT n_name, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal
    FROM (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_nationkey
                                ORDER BY c.c_acctbal DESC, c.c_name ASC, c.c_custkey ASC) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn = 1
    """,
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-mode / argmax per key with name-then-id tiebreak (A7):
    export_campus_resolver.py:211-228; ranking winner (W2)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_name"), F.asc("c_custkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "c_name", _cents(_dec("c_acctbal")).alias("acctbal"))
    )


# --------------------------------------------------------------- U2/A10
@register(
    "nation_member_counts",
    oracle="""
    SELECT n.n_name, CAST(SUM(u.cnt) AS BIGINT) AS n_members
    FROM (
      SELECT c_nationkey AS nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey
      UNION ALL
      SELECT s_nationkey AS nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey
    ) u
    JOIN nation n ON u.nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def nation_member_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL evidence fold + re-aggregate (U2/A10):
    canonical_exporter.py:562-595."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    u = (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .unionByName(
            s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
                F.count(F.lit(1)).alias("cnt")
            )
        )
    )
    return (
        u.join(F.broadcast(n), u.nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("cnt").cast("long").alias("n_members"))
    )


# ------------------------------------------------------------------ U1/U3
@register(
    "nations_without_rich_suppliers",
    oracle="""
    SELECT DISTINCT n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_nationkey = c.c_nationkey AND s.s_acctbal > 8000)
    """,
)
def nations_without_rich_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference membership sync (U3): team_synchronizer.py:161-189 —
    members present in one set and absent from the other (the filtered
    build side keeps the result non-trivial at every sf)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 8000)
    n = table(spark, sf_dir, "nation")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name")
        .distinct()
    )


# ------------------------------------------------------------------ A5
def top_parts_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N (A5): canonical_exporter.py:2348-2361 most_common(10).
    Unregistered — A5/O3 is driver-witnessed by ``top_revenue_orders``
    (same orderBy+limit shape); kept callable for tests/bench."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(_cents(F.sum(_dec("l_quantity"))).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(10)
    )


# ------------------------------------------------------------------ F13
@register(
    "order_status_derivation",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN 'Concluded'
                WHEN o_orderstatus = 'O' THEN 'Active'
                ELSE 'Pending' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
    """,
)
def order_status_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status derivation when/otherwise chain (F13):
    strategies/sigpesq_projects.py:32-43."""
    o = table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "Concluded")
        .when(F.col("o_orderstatus") == "O", "Active")
        .otherwise("Pending")
    )
    return o.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------------------------------ P8/F6
@register(
    "pii_scrub_customers",
    oracle="""
    SELECT c_custkey,
           'LGPD-' || substring(sha256(c_name || '|pepper'), 1, 16) AS scrubbed_name,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal
    FROM customer
    """,
)
def pii_scrub_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-SHA256 PII scrub projection (P8/F6):
    pii_anonymizer.py:24-49 — deterministic, idempotent hashing applied
    as an always-on projection before any sink (pii_session_hook.py:21-44)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.lit("LGPD-"),
            F.substring(F.sha2(F.concat(F.col("c_name"), F.lit("|pepper")), 256), 1, 16),
        ).alias("scrubbed_name"),
        _cents(_dec("c_acctbal")).alias("acctbal"),
    )


# ------------------------------------------------------------------ F8
@register(
    "multi_format_date_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(coalesce(try_strptime(ds, '%Y/%m/%d'), try_strptime(ds, '%d-%m-%Y')) AS DATE) AS parsed
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y/%m/%d')
                  ELSE strftime(o_orderdate, '%d-%m-%Y') END AS ds
      FROM orders
    )
    """,
)
def multi_format_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parsing via coalesce of to_date (F8):
    strategies/base.py:85-106 (5-format fallback chain)."""
    o = table(spark, sf_dir, "orders")
    ds = F.when(
        F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "yyyy/MM/dd")
    ).otherwise(F.date_format("o_orderdate", "dd-MM-yyyy"))
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("ds"), F.lit("yyyy/MM/dd")).cast("date"),
        F.try_to_timestamp(F.col("ds"), F.lit("dd-MM-yyyy")).cast("date"),
    )
    return o.select("o_orderkey", ds.alias("ds")).select(
        "o_orderkey", parsed.alias("parsed")
    )


def supplier_pair_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph degree from generated edges (A9/J8): node degree over the
    co-membership pair list (people_collaboration_graph_generator.py:90-94).
    Unregistered — A9/J8 is driver-witnessed by the weighted variant
    ``cosupply_weighted_degree``; kept callable for tests."""
    s = table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(F.col("a.s_suppkey").alias("supp_a"), F.col("b.s_suppkey").alias("supp_b"))
    ends = pairs.select(F.col("supp_a").alias("supp")).unionByName(
        pairs.select(F.col("supp_b").alias("supp"))
    )
    return ends.groupBy("supp").agg(F.count(F.lit(1)).alias("degree"))


def cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted co-supply edge list (sa, sb, w): suppliers co-occurring
    in an order, weight = number of co-supplied orders — the graph the
    reference exports as a nodes/edges Parquet pair
    (export_parquet.py:31-80; see exports.export_graph)."""
    l = table(spark, sf_dir, "lineitem")
    os_ = l.select("l_orderkey", "l_suppkey").distinct()
    a = os_.alias("a")
    b = os_.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("sa"), F.col("b.l_suppkey").alias("sb")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


# NOTE: no longer @register-ed — its registry slot (the driver caps the
# correctness gate at 50 rows) went to the strictly-stronger
# ``relationship_graph_summary`` (queries/graph.py), whose 'cosupply'
# family degree_md5 hash-covers this exact result.  Kept callable for
# tests and bench.
def cosupply_weighted_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaboration graph with edge weights (J8 + A9 weighted degree):
    suppliers co-occurring in the same order form an edge whose weight
    is the number of co-supplied orders — the reference's per-initiative
    co-membership pair generation + degree/weighted-degree rollup
    (people_collaboration_graph_generator.py:83-94).  Pair generation is
    blocked per order (bounded fan-out: per-order supplier sets are
    small), never an unblocked self-join."""
    edges = cosupply_edges(spark, sf_dir)
    ends = edges.select(F.col("sa").alias("supp"), "w").unionByName(
        edges.select(F.col("sb").alias("supp"), "w")
    )
    return ends.groupBy("supp").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").cast("long").alias("weighted_degree"),
    )


# ------------------------------------------------------------------ A2/F1/F2
@register(
    "normalized_name_groups",
    oracle="""
    SELECT trim(regexp_replace(lower(strip_accents(c_name)), '[^a-z0-9]+', ' ', 'g')) AS norm_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_custkey) AS BIGINT) AS canonical_id
    FROM customer GROUP BY 1
    """,
)
def normalized_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-name grouping (A2) with exact-parity unicode
    normalization (F1/F2: NFD → strip combining marks → lower →
    non-alnum collapse, initiative_identity.py:6-13,
    person_matcher.py:74-116) as a VECTORIZED pandas UDF — the
    sanctioned Python path (Arrow-batched, never per-row)."""
    import pandas as pd
    import unicodedata
    import re

    from pyspark.sql.functions import pandas_udf

    # note: no type annotations — `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve the local alias
    @pandas_udf("string")
    def normalize(s):
        def norm(x):
            if x is None:
                return None
            x = unicodedata.normalize("NFD", x)
            x = "".join(ch for ch in x if not unicodedata.combining(ch))
            return re.sub(r"[^a-z0-9]+", " ", x.lower()).strip()

        return s.map(norm)

    c = table(spark, sf_dir, "customer")
    return (
        c.withColumn("norm_name", normalize(F.col("c_name")))
        .groupBy("norm_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_custkey").cast("long").alias("canonical_id"),
        )
    )


# ------------------------------------------------------------------ J9
@register(
    "dominant_nation_per_part",
    oracle="""
    SELECT p_partkey, n_name AS dominant_nation, CAST(weight AS BIGINT) AS weight
    FROM (
      SELECT l.l_partkey AS p_partkey, n.n_name, COUNT(*) AS weight,
             row_number() OVER (PARTITION BY l.l_partkey
                                ORDER BY COUNT(*) DESC, n.n_name ASC, n.n_nationkey ASC) AS rn
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY l.l_partkey, n.n_name, n.n_nationkey
    ) WHERE rn = 1
    """,
)
def dominant_nation_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop weighted join + per-key weighted mode (J9/A7):
    export_campus_resolver.py:52-158, 211-228 — propagate COUNT weights
    across a join chain, then argmax with name-then-id tiebreak."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    weighted = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"), "n_name", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("weight"), F.asc("n_name"), F.asc("n_nationkey")
    )
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            F.col("n_name").alias("dominant_nation"),
            F.col("weight").cast("long").alias("weight"),
        )
    )
