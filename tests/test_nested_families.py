"""Multi-family nested-document parsing (S3 breadth): one nested JSON
profile document per customer must yield SIX typed record families —
document-level scalars, array-of-struct, array-of-scalar, and a
two-level nested array — each bit-equal to ground truth derived
directly from the clean source tables (the same oracle strategy as the
registry's nested_json_explode row), and each family's independent
parse must be subtree-PRUNED by Catalyst.

Reference parallel: the Lattes parser's seven record families from one
CV document (lattes_parser.py:41-602)."""

from __future__ import annotations

from pyspark.sql import functions as F

from horizon_etl_spark.sources.nested import Family, family_frame, family_frames
from tests.conftest import SF_DIR

DOC_SCHEMA = (
    "cust_id BIGINT, name STRING, nation BIGINT, segment STRING, "
    "contacts ARRAY<STRUCT<kind: STRING, value: STRING>>, "
    "years ARRAY<BIGINT>, "
    "summary STRUCT<n_orders: BIGINT, total_cents: BIGINT>, "
    "orders ARRAY<STRUCT<order_id: BIGINT, status: STRING, total_cents: BIGINT, "
    "year: BIGINT, items: ARRAY<STRUCT<line: BIGINT, part: BIGINT, qty_cents: BIGINT>>>>"
)

FAMILIES = {
    "personal": Family(
        select={
            "cust_id": "doc.cust_id",
            "name": "doc.name",
            "nation": "doc.nation",
            "segment": "doc.segment",
        }
    ),
    "summary": Family(
        select={
            "cust_id": "doc.cust_id",
            "n_orders": "doc.summary.n_orders",
            "total_cents": "doc.summary.total_cents",
        }
    ),
    "contacts": Family(
        explode=("contacts",),
        select={"cust_id": "doc.cust_id", "kind": "l0.kind", "value": "l0.value"},
    ),
    "active_years": Family(
        explode=("years",),
        select={"cust_id": "doc.cust_id", "year": "l0"},
    ),
    "orders": Family(
        explode=("orders",),
        select={
            "cust_id": "doc.cust_id",
            "order_id": "l0.order_id",
            "status": "l0.status",
            "total_cents": "l0.total_cents",
            "year": "l0.year",
        },
    ),
    "order_items": Family(
        explode=("orders", "items"),
        select={
            "cust_id": "doc.cust_id",
            "order_id": "l0.order_id",
            "line": "l1.line",
            "part": "l1.part",
            "qty_cents": "l1.qty_cents",
        },
    ),
}


def _base(spark):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = o.select(
        F.col("o_custkey").cast("long").alias("cust_id"),
        F.col("o_orderkey").cast("long").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("total_cents"),
        F.year("o_orderdate").cast("long").alias("year"),
    )
    items = l.select(
        F.col("l_orderkey").cast("long").alias("order_id"),
        F.col("l_linenumber").cast("long").alias("line"),
        F.col("l_partkey").cast("long").alias("part"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long").alias("qty_cents"),
    )
    cust = c.select(
        F.col("c_custkey").cast("long").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        # the synthetic customer table carries no phone column;
        # deterministic stand-in keeps the contacts family honest
        F.concat(F.lit("+55-"), F.col("c_custkey").cast("string")).alias("phone"),
    )
    return cust, orders, items


def _docs(spark):
    """One JSON profile document per customer WITH at least one order,
    assembled from the clean tables (serialize side of the round trip)."""
    cust, orders, items = _base(spark)
    item_s = F.struct("line", "part", "qty_cents")
    order_items = items.groupBy("order_id").agg(
        F.sort_array(F.collect_list(item_s)).alias("items")
    )
    order_s = F.struct("order_id", "status", "total_cents", "year", "items")
    per_cust = (
        orders.join(order_items, "order_id", "left")
        .withColumn("items", F.coalesce(F.col("items"), F.array()))
        .groupBy("cust_id")
        .agg(
            F.sort_array(F.collect_list(order_s)).alias("orders"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
            F.sort_array(F.collect_set("year")).alias("years"),
        )
    )
    joined = cust.join(per_cust, "cust_id")
    contacts = F.array(
        F.struct(F.lit("phone").alias("kind"), F.col("phone").alias("value")),
        F.struct(
            F.lit("email").alias("kind"),
            F.concat(F.lit("c"), F.col("cust_id"), F.lit("@example.test")).alias("value"),
        ),
    )
    doc = F.struct(
        "cust_id",
        "name",
        "nation",
        "segment",
        contacts.alias("contacts"),
        "years",
        F.struct("n_orders", "total_cents").alias("summary"),
        "orders",
    )
    return joined.select(F.to_json(doc).alias("js"))


def _assert_equal(got, want, name):
    extra = got.exceptAll(want).count()
    missing = want.exceptAll(got).count()
    assert extra == 0 and missing == 0, f"{name}: extra={extra} missing={missing}"


def test_six_families_round_trip_against_source_truth(spark):
    docs = _docs(spark).persist()
    fams = family_frames(docs, "js", DOC_SCHEMA, FAMILIES)
    cust, orders, items = _base(spark)
    with_orders = orders.select("cust_id").distinct()

    _assert_equal(
        fams["personal"],
        cust.join(with_orders, "cust_id").select("cust_id", "name", "nation", "segment"),
        "personal",
    )
    _assert_equal(
        fams["summary"],
        orders.groupBy("cust_id").agg(
            F.count(F.lit(1)).alias("n_orders"), F.sum("total_cents").alias("total_cents")
        ),
        "summary",
    )
    _assert_equal(
        fams["contacts"],
        cust.join(with_orders, "cust_id")
        .select(
            "cust_id",
            F.explode(
                F.array(
                    F.struct(F.lit("phone").alias("kind"), F.col("phone").alias("value")),
                    F.struct(
                        F.lit("email").alias("kind"),
                        F.concat(F.lit("c"), F.col("cust_id"), F.lit("@example.test")).alias(
                            "value"
                        ),
                    ),
                )
            ).alias("ct"),
        )
        .select("cust_id", "ct.kind", "ct.value"),
        "contacts",
    )
    _assert_equal(
        fams["active_years"],
        orders.select("cust_id", "year").distinct(),
        "active_years",
    )
    _assert_equal(
        fams["orders"],
        orders.select("cust_id", "order_id", "status", "total_cents", "year"),
        "orders",
    )
    _assert_equal(
        fams["order_items"],
        orders.select("cust_id", "order_id").join(items, "order_id").select(
            "cust_id", "order_id", "line", "part", "qty_cents"
        ),
        "order_items",
    )
    docs.unpersist()


def test_family_parse_is_subtree_pruned(spark):
    """Each family's independent job must NOT decode the whole document:
    Catalyst's JSON pruning rewrites from_json to the family's subtree.
    The personal family never touches the orders array — the heaviest
    subtree — so 'orders' must be absent from its from_json schema."""
    docs = _docs(spark)
    personal = family_frame(docs, "js", DOC_SCHEMA, FAMILIES["personal"])
    plan = personal._jdf.queryExecution().optimizedPlan().toString()
    import re

    m = re.search(r"from_json\(([^)]*)\)", plan)
    assert m, plan[:2000]
    assert "orders" not in m.group(1), m.group(1)
    assert "cust_id" in m.group(1)


def test_shared_parse_mode_equals_independent(spark):
    docs = _docs(spark).limit(50).persist()
    independent = family_frames(docs, "js", DOC_SCHEMA, FAMILIES)
    shared = family_frames(docs, "js", DOC_SCHEMA, FAMILIES, shared_parse=True)
    for name in FAMILIES:
        _assert_equal(shared[name], independent[name], name)
    # the shared-parse cache has a public release handle (a persisted
    # full-corpus parse must not pin executor storage past the backfill)
    assert shared.parsed is not None and shared.parsed.is_cached
    shared.unpersist()
    assert not shared.parsed.is_cached
    assert independent.parsed is None
    independent.unpersist()  # no-op in independent mode
    docs.unpersist()
