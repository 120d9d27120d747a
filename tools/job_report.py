"""spark-submit entry job: flow report — the final orchestrated phase
(ingest → export → maintain → report), mirroring the reference's ETL
flow reporter artifact (etl_flow_reporter.py:525-556: json + markdown,
run-stamped + latest pointer).

    spark-submit --master <cluster> \
        --py-files dist/horizon_etl_spark.zip \
        tools/job_report.py --pipeline-root /data/lake/docs \
        --out /data/reports [--name etl_flow] [--exact-counts] \
        [--dup-metric content_dups=tokens] [--last-runs 10]

Emits: final table counts (metadata estimates by default — a report
must not scan a 100 TB lake; ``--exact-counts`` for small
deployments), remaining duplicate groups per metric, the latest runs
with status, and warnings_by_source (``duplicate_count_present``,
``tracking_runs_not_successful``, ``quarantine_backlog``).  If the
pipeline carries a StepAuditor history (``<root>/audits``), per-step
``duplicate_count_increased`` diffs for the latest step are folded in.

Prints exactly one JSON line of evidence on success.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="etl_flow")
    ap.add_argument("--exact-counts", action="store_true")
    ap.add_argument(
        "--dup-metric",
        action="append",
        default=[],
        help="name=col1[,col2...]; default content_dups=tokens",
    )
    ap.add_argument("--last-runs", type=int, default=10)
    ap.add_argument(
        "--executive-sf-dir",
        default=None,
        help="also emit the executive mart report (report_exec.py, the "
        "reference's generate_*-style template) over the relational "
        "tables at this directory",
    )
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from horizon_etl_spark.cdc.apply import CdcPipeline
    from horizon_etl_spark.report import flow_report, write_report

    spark = SparkSession.builder.appName("horizon_etl_spark.job_report").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pipe = CdcPipeline.load(args.pipeline_root)
    dup_metrics = None
    if args.dup_metric:
        dup_metrics = {}
        for spec in args.dup_metric:
            name, _, cols = spec.partition("=")
            dup_metrics[name] = cols.split(",")

    steps = []
    import os

    from horizon_etl_spark.cdc.audit import StepAuditor
    from horizon_etl_spark.tables.lake import LakeTable

    if LakeTable.exists(os.path.join(args.pipeline_root, "audits")):
        aud = StepAuditor(args.pipeline_root)
        ids = [
            r["step_id"]
            for r in aud.table.read(spark).select("step_id").distinct().collect()
        ]
        if ids:
            latest = max(ids)
            steps.append(
                {
                    "step_name": f"step_{latest}",
                    "origin": f"step_{latest}",
                    "warnings": aud.diff(spark, latest),
                }
            )

    report = flow_report(
        spark,
        pipe,
        run_name=args.name,
        dup_metrics=dup_metrics,
        exact_counts=args.exact_counts,
        steps=steps,
    )
    paths = write_report(report, args.out)
    evidence = {
        "pipeline_root": args.pipeline_root,
        "report": paths["latest_json"],
        "tables": report["final_tables"],
        "warnings": {k: len(v) for k, v in report["warnings_by_source"].items()},
    }
    if args.executive_sf_dir:
        from horizon_etl_spark.report_exec import (
            executive_report,
            write_executive_report,
        )

        exec_doc = executive_report(
            spark, args.executive_sf_dir, run_name=f"{args.name}_executive"
        )
        exec_paths = write_executive_report(exec_doc, args.out)
        evidence["executive"] = exec_paths["latest_json"]
    print(json.dumps(evidence))
    return 0


if __name__ == "__main__":
    sys.exit(main())
