"""Flow-report artifact: reference-shaped document (final tables,
remaining duplicate groups, latest-run tracking, warnings_by_source
with duplicate_count_present / tracking_runs_not_successful /
quarantine_backlog), written atomically as run-stamped + latest
json+md pairs, and surfaced through the job entrypoint."""

import json
import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch
from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.report import flow_report, write_report


def _pipe_with_history(spark, root):
    pipe = CdcPipeline.create(root, bucket_count=4)
    feed = change_feed(spark, 2000, 150, seed=21, num_batches=1, max_len=8).drop("batch")
    apply_batch(pipe, feed, batch_id=0)
    # a dirty batch: bad source → quarantined rows + still a success run
    dirty = feed.withColumn("lsn", F.col("lsn") + 10_000).withColumn(
        "source", F.lit("not-whitelisted")
    )
    apply_batch(pipe, dirty.limit(50), batch_id=1)
    return pipe


def test_flow_report_shape_and_warnings(spark, tmp_table_dir):
    pipe = _pipe_with_history(spark, os.path.join(tmp_table_dir, "pipe"))
    rep = flow_report(spark, pipe, run_name="weekly")

    # metadata-estimate counts: present for every pipeline table and
    # nonzero where data landed
    assert set(rep["final_tables"]) == {
        "target", "quarantine", "runs", "metrics", "change_log", "rollup"
    }
    assert rep["final_tables"]["target"] > 0
    # 43 of the 50 dirty rows fail the whitelist (deletes carry no source)
    assert rep["final_tables"]["quarantine"] == 43

    # a keyed LWW target has no content duplicates by construction only
    # if token arrays are distinct; the metric just has to be present
    assert "content_dups" in rep["final_duplicates"]

    # latest runs include both batches, newest first, all successful
    runs = rep["tracking_summary"]["latest_runs"]
    assert [r["batch_id"] for r in runs[:2]] == [1, 0]
    assert all(r["status"] == "success" for r in runs)

    # quarantine backlog warning fires with per-reason examples
    q = rep["warnings_by_source"]["quarantine"][0]
    assert q["code"] == "quarantine_backlog" and q["count"] == 43
    assert q["examples"][0]["count"] == 43
    # no failed runs → no tracking warning
    assert "tracking" not in rep["warnings_by_source"]

    # exact counts agree with metadata estimates for append-only tables
    exact = flow_report(spark, pipe, exact_counts=True)["final_tables"]
    assert exact["quarantine"] == 43 and exact["runs"] == rep["final_tables"]["runs"]

    # no pending layout advisory → no maintenance warnings
    assert "maintenance" not in rep["warnings_by_source"]


def test_flow_report_surfaces_maintenance_advisories(spark, tmp_table_dir):
    """A pending cluster_recommended advisory on the target's latest
    merge summary must surface as a maintenance warning, so pipelines
    without a scheduled job_maintain sweep alert instead of silently
    paying the write amplification."""
    pipe = _pipe_with_history(spark, os.path.join(tmp_table_dir, "pipe"))
    pipe.target.set_props({"target_file_rows": 15})
    trickle = (
        change_feed(spark, 40, 1, seed=22, num_batches=1, max_len=8)
        .drop("batch")
        .withColumn("lsn", F.col("lsn") + 1_000_000_000)
    )
    apply_batch(pipe, trickle, batch_id=2)
    assert pipe.target.snapshot()["summary"].get("cluster_recommended") is True

    rep = flow_report(spark, pipe, run_name="weekly")
    maint = rep["warnings_by_source"]["maintenance"]
    assert [w["code"] for w in maint] == ["cluster_recommended"]
    assert "cluster-by-key" in maint[0]["message"]


def test_write_report_artifacts(spark, tmp_table_dir):
    pipe = _pipe_with_history(spark, os.path.join(tmp_table_dir, "pipe"))
    rep = flow_report(spark, pipe, run_name="weekly")
    out = os.path.join(tmp_table_dir, "reports")
    paths = write_report(rep, out)
    # stamped + latest pairs, json parses back to the same document
    assert os.path.exists(paths["json"]) and os.path.exists(paths["md"])
    with open(paths["latest_json"]) as fh:
        loaded = json.load(fh)
    assert loaded["final_tables"] == rep["final_tables"]
    md = open(paths["latest_md"]).read()
    assert "quarantine_backlog" in md and "| target |" in md
    # second run replaces the latest pointer atomically
    paths2 = write_report(flow_report(spark, pipe, run_name="weekly"), out)
    assert os.path.exists(paths2["latest_json"])


def test_job_report_entrypoint(spark, tmp_table_dir, capsys):
    pipe = _pipe_with_history(spark, os.path.join(tmp_table_dir, "pipe"))
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import job_report

    out = os.path.join(tmp_table_dir, "reports")
    rc = job_report.main(
        ["--pipeline-root", pipe.root, "--out", out, "--name", "weekly"]
    )
    assert rc == 0
    evidence = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert evidence["warnings"]["quarantine"] == 1
    assert os.path.exists(evidence["report"])
