"""spark-submit entry job: export pipeline artifacts — the second
phase of the cluster deployment (ingest writes the lake, export
publishes consumer artifacts from it).

    spark-submit --master <cluster> \
        --py-files dist/horizon_etl_spark.zip \
        tools/job_export.py \
        --pipeline-root /data/lake/docs --out /data/exports \
        [--filtered-by source] [--deep-scrub-cols props,contact]

Exports the target table (JSONL + zstd parquet + column sidecar +
manifest, atomic symlink publish) pinned to ONE snapshot version, and
optionally one filtered view per distinct value of a classification
column — all views pin the SAME snapshot, so the view set is a
consistent partition of it even while the ingest job merges
concurrently.  Mirrors the reference's export phase of the weekly
orchestrator (/root/reference/src/flows/pipelines/weekly_orchestrator.py:1-40,
/root/reference/src/scripts/export_parquet.py:31-80) as an independent
spark-submit job sharing the lake with the ingest job (SURVEY.md §2 T7).

Prints exactly one JSON line of export evidence on success.
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pipeline-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="target")
    ap.add_argument(
        "--filtered-by",
        default=None,
        help="also publish one filtered view per distinct value of this column",
    )
    ap.add_argument(
        "--deep-scrub-cols",
        default=None,
        help="comma-separated payload columns to pass through pii.deep_scrub",
    )
    ap.add_argument(
        "--version",
        type=int,
        default=None,
        help="export this target snapshot version instead of the latest "
        "(time travel — reproduce a past artifact bit-for-bit)",
    )
    ap.add_argument(
        "--changes",
        action="store_true",
        help="incremental outbox mode: publish only the change-log rows "
        "appended since the previous run's cursor (O(new changes), not "
        "O(table)) instead of a full target export",
    )
    ap.add_argument(
        "--bundle",
        action="store_true",
        help="finish by zipping the published artifacts into one atomic "
        "download bundle (exports_bundle.zip; K4, reference "
        "zip_exports_task)",
    )
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.version is not None and args.filtered_by:
        # export_filtered_views pins its own (current) snapshot; a stale
        # --version alongside it would silently mix two versions
        print(
            "error: --version cannot be combined with --filtered-by",
            file=sys.stderr,
        )
        return 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from horizon_etl_spark import exports
    from horizon_etl_spark.cdc.apply import CdcPipeline
    from horizon_etl_spark.pii import deep_scrub

    spark = SparkSession.builder.appName("horizon_etl_spark.job_export").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pipe = CdcPipeline.load(args.pipeline_root)
    version = args.version if args.version is not None else pipe.target.current_version()
    scrub = None
    if args.deep_scrub_cols:
        scrub = partial(deep_scrub, cols=args.deep_scrub_cols.split(","))

    if args.changes:
        delta = exports.export_changes(
            spark,
            pipe.change_log,
            args.out,
            f"{args.name}_changes",
            scrub=scrub,
            target=pipe.target,
        )
        print(
            json.dumps(
                {
                    "out_dir": args.out,
                    "name": f"{args.name}_changes",
                    "from_version": delta["from_version"],
                    "to_version": delta["to_version"],
                    "rows": delta["n_rows"],
                }
            )
        )
        return 0

    manifest = exports.export_table(
        spark,
        pipe.target,
        args.out,
        args.name,
        scrub=scrub,
        version=version,
        sort_by="doc_id",
    )
    out = {
        "out_dir": args.out,
        "name": args.name,
        "source_version": manifest["version"],
        "rows": manifest["n_rows"],
    }
    if args.filtered_by:
        # classification columns are low-cardinality by contract (the
        # reference ships 4 views); the distinct scan runs on the SAME
        # pinned snapshot the views will read
        values = [
            r[0]
            for r in pipe.target.read(spark, version=version)
            .select(args.filtered_by)
            .where(F.col(args.filtered_by).isNotNull())
            .distinct()
            .collect()
        ]
        views = exports.export_filtered_views(
            spark,
            pipe.target,
            args.out,
            args.name,
            args.filtered_by,
            sorted(values),
            scrub=scrub,
        )
        out["filtered_views"] = {str(k): v["n_rows"] for k, v in sorted(views.items())}
    if args.bundle:
        b = exports.bundle_exports(args.out)
        out["bundle"] = {"path": b["path"], "n_files": b["n_files"], "bytes_zip": b["bytes_zip"]}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
