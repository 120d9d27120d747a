"""Executive mart report (reference: src/scripts/generate_*_executive
/ *_report templates): the report layer composed over the
driver-checked mart queries, published as the same stamped+latest
atomic json/md pair as the flow report."""

import json
import os

from horizon_etl_spark.report_exec import (
    EXEC_SECTIONS,
    executive_report,
    write_executive_report,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sections_match_driver_checked_marts(spark):
    """Every section's numbers must be EXACTLY the registry query's
    result — the template renders the gate-verified aggregates, it
    never recomputes its own."""
    from horizon_etl_spark.queries import QUERIES

    doc = executive_report(spark, SF_DIR)
    assert [s for s, _ in EXEC_SECTIONS] == list(doc["sections"])
    for name, _caption in EXEC_SECTIONS:
        sec = doc["sections"][name]
        df = QUERIES[name](spark, SF_DIR)
        assert sec["columns"] == df.columns
        expect = sorted(
            map(tuple, ([r[c] for c in df.columns] for r in df.collect()))
        )[: len(sec["rows"])]
        assert sorted(map(tuple, sec["rows"])) == expect
        assert not sec["truncated"] or sec["n_rows"] == 50


def test_highlights_reconcile_with_sections(spark):
    doc = executive_report(spark, SF_DIR)
    years = doc["sections"]["orders_per_year"]
    yi = years["columns"].index("n_orders")
    assert doc["highlights"]["total_orders"] == sum(r[yi] for r in years["rows"])
    assert doc["highlights"]["years_covered"] == years["n_rows"]
    top = doc["sections"]["top_revenue_orders"]
    ri = top["columns"].index("revenue")
    assert doc["highlights"]["top_order_revenue"] == max(r[ri] for r in top["rows"])


def test_highlights_exact_under_truncation(spark):
    """A section overflowing the stored-row cap must NOT distort the
    headline numbers: highlights aggregate the full result, the cap
    only bounds the artifact rows (the 'no silent caps' rule applied
    to the derived headlines, not just the section flag)."""
    full = executive_report(spark, SF_DIR)
    doc = executive_report(spark, SF_DIR, max_rows_per_section=2)
    sec = doc["sections"]["orders_per_year"]
    assert sec["truncated"] and sec["n_rows"] == 2 and sec["total_rows"] > 2
    assert len(sec["rows"]) == 2
    assert doc["highlights"] == full["highlights"]


def test_write_and_job_entrypoint(spark, tmp_path, capsys):
    """Atomic stamped+latest pair; job_report --executive-sf-dir emits
    it alongside the flow report with the path in the evidence line."""
    doc = executive_report(spark, SF_DIR, run_name="quarterly_executive")
    out = os.path.join(tmp_path, "reports")
    paths = write_executive_report(doc, out)
    with open(paths["latest_json"]) as fh:
        loaded = json.load(fh)
    assert loaded["highlights"] == doc["highlights"]
    md = open(paths["latest_md"]).read()
    assert "# Executive mart report — quarterly_executive" in md
    assert "Top revenue orders" in md and "| order_year |" in md

    # the orchestrated entrypoint (in-process, shares the session)
    import sys

    from pyspark.sql import functions as F

    from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch
    from horizon_etl_spark.cdc.generator import change_feed

    pipe = CdcPipeline.create(os.path.join(tmp_path, "pipe"), bucket_count=4)
    feed = change_feed(spark, 500, 50, seed=5, num_batches=1, max_len=8).drop("batch")
    apply_batch(pipe, feed, batch_id=0)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import job_report

    rc = job_report.main(
        ["--pipeline-root", pipe.root, "--out", out,
         "--name", "weekly", "--executive-sf-dir", SF_DIR]
    )
    assert rc == 0
    evidence = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(evidence["report"])
    with open(evidence["executive"]) as fh:
        emitted = json.load(fh)
    assert emitted["run_name"] == "weekly_executive"
    assert emitted["sections"]["pricing_summary"]["rows"]
