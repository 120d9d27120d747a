"""Executive mart report — a ``generate_*``-style template rendered
from the report artifact layer.

The reference ships ~20k LoC of one-off executive/report scripts
(/root/reference/src/scripts/generate_docentes_executive.py,
generate_formandos_report.py, …): each loads the curated data, computes
a fixed set of indicator aggregates (per-year evolution, per-category
rollups, top-N rankings), and renders one versioned artifact.  This
module is that surface re-expressed Spark-first: the indicators are the
ALREADY driver-checked mart queries (SURVEY §2 A4–A7 + J1 — the exact
aggregate family those scripts recompute by hand), composed into one
document and published through the same stamped+latest atomic json/md
pair as the flow report (report.write_document_pair).

Scale posture: every section is a bounded aggregate (per-year rows,
per-flag rollups, top-N rankings, per-nation argmax) — the collects are
O(groups), never O(table), so the report stays cheap on a 100 TB mart.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from horizon_etl_spark.report import write_document_pair

# section name -> (registry query, caption).  Every entry is a
# driver-checked registry row, so the report's numbers are exactly the
# numbers the correctness gate hash-verifies against DuckDB.
EXEC_SECTIONS: tuple[tuple[str, str], ...] = (
    ("pricing_summary", "Pricing summary by return flag / line status (A4)"),
    ("orders_per_year", "Order volume evolution per year (A6)"),
    ("top_revenue_orders", "Top revenue orders — BUILDING segment (A5)"),
    ("top_customer_per_nation", "Top customer per nation (A7)"),
    ("region_revenue", "Revenue by region (J1)"),
)


def _section(df: DataFrame, limit: int) -> tuple[dict[str, Any], list[list[Any]]]:
    """Materialize one section.  Every section is a groups-bounded
    aggregate, so the FULL result is collected once (O(groups)); only
    the stored artifact rows are capped at ``limit`` — highlights must
    be computed from the returned full rows, never the truncated ones
    (a >limit section would otherwise silently under-report totals)."""
    full = [[r[c] for c in df.columns] for r in df.collect()]
    return {
        "columns": df.columns,
        "rows": full[:limit],
        "n_rows": min(len(full), limit),
        "total_rows": len(full),
        # no silent caps: a section that didn't fit says so
        "truncated": len(full) > limit,
    }, full


def executive_report(
    spark: SparkSession,
    sf_dir: str,
    run_name: str = "executive",
    max_rows_per_section: int = 50,
) -> dict[str, Any]:
    """Assemble the executive document: one section per mart indicator,
    each materialized from the registry query (deterministic order for
    reproducible artifacts) plus cross-section highlights."""
    from horizon_etl_spark.queries import QUERIES

    now = datetime.now(timezone.utc).replace(tzinfo=None)
    sections: dict[str, Any] = {}
    full_rows: dict[str, list[list[Any]]] = {}
    for name, caption in EXEC_SECTIONS:
        df = QUERIES[name](spark, sf_dir)
        order = [c for c in df.columns if not c.startswith("_")]
        sec, full = _section(df.orderBy(*order), max_rows_per_section)
        sections[name] = {"caption": caption, **sec}
        full_rows[name] = full

    # highlights aggregate over the FULL section results, so a section
    # that overflowed the stored-row cap still yields exact headlines
    years = full_rows["orders_per_year"]
    yc = sections["orders_per_year"]["columns"]
    y_year, y_orders = yc.index("order_year"), yc.index("n_orders")
    top = full_rows["top_revenue_orders"]
    tc = sections["top_revenue_orders"]["columns"]
    highlights = {
        "years_covered": len(years),
        "peak_year": (
            max(years, key=lambda r: (r[y_orders], r[y_year]))[y_year]
            if years
            else None
        ),
        "total_orders": sum(r[y_orders] for r in years),
        # sections are re-sorted for artifact determinism, so take the
        # max, not row 0
        "top_order_revenue": (
            max(r[tc.index("revenue")] for r in top) if top else None
        ),
    }
    return {
        "run_name": run_name,
        "generated_at": now.isoformat(),
        "source": sf_dir,
        "sections": sections,
        "highlights": highlights,
    }


def _render_markdown(report: dict[str, Any]) -> str:
    lines = [
        f"# Executive mart report — {report['run_name']}",
        "",
        f"Generated: **{report['generated_at']}**  ",
        f"Source: `{report['source']}`",
        "",
        "## Highlights",
        "",
    ]
    for k, v in report["highlights"].items():
        lines.append(f"- {k.replace('_', ' ')}: **{v}**")
    for name, sec in report["sections"].items():
        lines += ["", f"## {sec['caption']}", ""]
        lines.append("| " + " | ".join(sec["columns"]) + " |")
        lines.append("|" + "---|" * len(sec["columns"]))
        for row in sec["rows"]:
            lines.append("| " + " | ".join(str(v) for v in row) + " |")
        if sec["truncated"]:
            lines.append("")
            lines.append(
                f"_(showing {sec['n_rows']} of {sec['total_rows']} rows)_"
            )
    return "\n".join(lines) + "\n"


def write_executive_report(report: dict[str, Any], out_dir: str) -> dict[str, str]:
    """Publish through the shared stamped+latest atomic pair."""
    return write_document_pair(report, _render_markdown(report), out_dir)
