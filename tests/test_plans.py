"""Physical-plan audits: the registered read-path queries must keep the
plan shapes the 100 TB design depends on — no accidental cartesian /
nested-loop joins, parquet column pruning, predicate pushdown, and
whole-stage codegen on the hot aggregates.  These are the properties a
reviewer checks with .explain(); encoding them as tests stops a future
refactor from silently regressing one."""

from __future__ import annotations

from tests.conftest import SF_DIR

# Kernel-driving queries EXECUTE merges when called (their plan is the
# final read, not the interesting part) — audited by their own e2e
# tests instead.
KERNEL = {"cdc_apply_events", "cdc_attr_lww_state", "cdc_attr_change_log"}

# knn_bruteforce is the documented brute-force baseline: its qid != nid
# theta-join IS a nested-loop by construction (bounded to 100 queries).
# The two recall witnesses embed that same bounded baseline as their
# ground truth (their ANN half stays equi-join-only — asserted directly
# in tests/test_ann_quality.py).
THETA_BASELINE = {"knn_bruteforce", "knn_lsh_recall", "ivf_probe_recall"}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_accidental_cartesian_or_nested_loop_joins(spark):
    from horizon_etl_spark.queries import QUERIES

    offenders = []
    for name, fn in QUERIES.items():
        if name in KERNEL or name in THETA_BASELINE:
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert offenders == [], f"non-equi join shapes crept into: {offenders}"


def test_pricing_summary_prunes_columns_and_codegens(spark):
    from horizon_etl_spark.queries import QUERIES

    df = QUERIES["pricing_summary"](spark, SF_DIR)
    # column pruning: the scan must not read columns the aggregate
    # never touches (at 100 TB this is the difference between reading
    # 5 columns and the whole table)
    plan = _plan(df)
    assert "ReadSchema" in plan
    assert "l_partkey" not in plan and "l_suppkey" not in plan
    # map-side partial aggregation before the exchange (the built-in
    # skew collapse the CDC kernel also relies on)
    assert "partial_sum" in plan
    # codegen stages only materialize in the AQE FINAL plan — execute,
    # then re-read: the hot aggregate must run inside WholeStageCodegen
    df.collect()
    final = _plan(df)
    assert "isFinalPlan=true" in final
    # '*(n)' operator prefixes are the whole-stage-codegen stage
    # markers in the plan string; the aggregate must carry one
    assert "*(" in final and "HashAggregate" in final


def test_filters_push_down_to_parquet_scan(spark):
    import re

    from horizon_etl_spark.queries import QUERIES

    # the equality filter (P6) must reach the parquet reader as a
    # non-empty PushedFilters list — Catalyst pushdown, not a
    # post-scan Filter over the full table
    plan = _plan(QUERIES["top_revenue_orders"](spark, SF_DIR))
    assert re.search(r"PushedFilters: \[[^\]]+\]", plan), plan[:2000]


def test_broadcast_for_small_dimensions(spark):
    from horizon_etl_spark.queries import QUERIES

    # region/nation are tiny dims: the multi-way join must broadcast
    # them, never shuffle the fact table onto a 5-row side
    plan = _plan(QUERIES["region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
