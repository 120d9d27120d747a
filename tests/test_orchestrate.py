"""Weekly-orchestrator shape: ingest + export as independent
spark-submit phases over one lake (reference weekly_orchestrator
subprocess-per-phase model; SURVEY.md §2 T7).  Asserts phase evidence,
cross-process artifact/table equality, critical-phase failure →
non-zero exit, and that a failed downstream phase leaves the lake
untouched (crash containment)."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline
from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.cdc.oracle import assert_frames_equal, expected_final
from horizon_etl_spark.exports import read_export

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def _orchestrate(argv, cwd):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "orchestrate.py"), *argv],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    phases = [json.loads(l) for l in proc.stdout.strip().splitlines() if l]
    return proc.returncode, phases


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_orchestrated_phases_and_crash_containment(spark, tmp_path):
    from tools.make_pyfiles import build_zip

    scratch = str(tmp_path)
    zip_path = build_zip(REPO, os.path.join(scratch, "engine.zip"))
    feed = change_feed(spark, 5000, 250, seed=31, num_batches=2)
    feed_dir = os.path.join(scratch, "feed")
    for b in (0, 1):
        feed.filter(F.col("batch") == b).drop("batch").coalesce(1).write.mode(
            "append"
        ).parquet(feed_dir)

    root = os.path.join(scratch, "pipe")
    common = [
        "--pipeline-root", root,
        "--feed", feed_dir,
        "--checkpoint", os.path.join(scratch, "ckpt"),
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
    ]
    rc, phases = _orchestrate(
        [*common, "--export-out", os.path.join(scratch, "exports"),
         "--filtered-by", "source", "--export-changes", "--maintain",
         "--report-out", os.path.join(scratch, "reports")],
        cwd=scratch,
    )
    assert rc == 0, phases
    by_name = {p["phase"]: p for p in phases}
    assert [p["phase"] for p in phases] == [
        "ingest", "export", "export_changes", "maintain", "report"
    ]
    assert all(p["exit_code"] == 0 for p in phases)

    # the flow ends with the report artifact (reference: the reporter
    # always writes at flow end); clean pipeline → no warnings
    rep = by_name["report"]["result"]
    assert os.path.exists(rep["report"])
    import json as _json

    with open(rep["report"]) as fh:
        doc = _json.load(fh)
    assert doc["final_tables"]["target"] > 0
    assert "quarantine" not in doc["warnings_by_source"]

    # cross-process equality: artifact == lake state == oracle
    pipe = CdcPipeline.load(root)
    oracle = expected_final(feed)
    assert_frames_equal(pipe.target.read(spark), oracle)
    art = read_export(spark, os.path.join(scratch, "exports"), "target")
    assert_frames_equal(
        art.select("doc_id", "tokens", "n_tok", "source"), oracle
    )
    # filtered views partition the same snapshot
    views = by_name["export"]["result"]["filtered_views"]
    assert sum(views.values()) == by_name["export"]["result"]["rows"]

    # outbox delta: first run exports the whole change log
    delta = by_name["export_changes"]["result"]
    assert delta["rows"] == pipe.change_log.read(spark).count()
    art = read_export(
        spark,
        os.path.join(scratch, "exports"),
        f"target_changes_{delta['from_version']:08d}_{delta['to_version']:08d}",
    )
    assert art.count() == delta["rows"]

    # maintenance ran all three steps and left state intact
    maint = by_name["maintain"]["result"]
    assert {"rebucket", "compact", "vacuum"} <= set(maint)
    assert_frames_equal(CdcPipeline.load(root).target.read(spark), oracle)

    # critical-phase failure: export out dir unereachable (parent is a
    # regular file) → non-zero exit, evidence recorded, lake untouched
    blocker = os.path.join(scratch, "blocker")
    with open(blocker, "w") as fh:
        fh.write("x")
    version_before = pipe.target.current_version()
    alerts_path = os.path.join(scratch, "alerts.jsonl")
    rc2, phases2 = _orchestrate(
        [*common, "--export-out", os.path.join(blocker, "exports"),
         "--notify", f"file:{alerts_path}"],
        cwd=scratch,
    )
    assert rc2 != 0
    by_name2 = {p["phase"]: p for p in phases2}
    # ingest re-ran over the same checkpoint: no new files → no-op
    assert by_name2["ingest"]["exit_code"] == 0
    assert by_name2["ingest"]["result"]["target_version"] == version_before
    assert by_name2["export"]["exit_code"] != 0
    assert "stderr_tail" in by_name2["export"]
    # containment: the failed export corrupted nothing
    assert CdcPipeline.load(root).target.current_version() == version_before
    assert_frames_equal(CdcPipeline.load(root).target.read(spark), oracle)
    # the operator was alerted with the phase evidence attached
    alerts = [json.loads(l) for l in open(alerts_path).read().splitlines()]
    assert len(alerts) == 1
    assert alerts[0]["event"] == "phase_failed"
    assert alerts[0]["phase"] == "export" and alerts[0]["exit_code"] != 0
    assert alerts[0]["stderr_tail"]
