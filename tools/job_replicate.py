"""spark-submit entry job: maintain a read replica from outbox deltas
— the downstream-site consumer of `job_export.py --changes`.

    spark-submit --master <cluster> \
        --py-files dist/horizon_etl_spark.zip \
        tools/job_replicate.py \
        --out /mirror/exports --name target_changes \
        --replica-root /mirror/lake/docs_replica

Run it on any schedule; each run applies every delta published since
the replica's cursor and is idempotent under crash re-runs (see
horizon_etl_spark/cdc/replicate.py for the convergence argument).
Cost is O(new changes), never O(table).

Prints exactly one JSON line of replication evidence on success.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="export dir holding the deltas")
    ap.add_argument("--name", required=True, help="outbox base name, e.g. target_changes")
    ap.add_argument("--replica-root", required=True)
    ap.add_argument("--bucket-count", type=int, default=16)
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from horizon_etl_spark.cdc import schema as S
    from horizon_etl_spark.cdc.replicate import replicate_from_outbox
    from horizon_etl_spark.tables.lake import LakeTable

    spark = SparkSession.builder.appName(
        "horizon_etl_spark.job_replicate"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if LakeTable.exists(args.replica_root):
        replica = LakeTable.load(args.replica_root)
    else:
        replica = LakeTable.create(
            args.replica_root,
            S.TARGET_SCHEMA,
            key_col="doc_id",
            bucket_count=args.bucket_count,
            attr_lww=True,
        )

    res = replicate_from_outbox(spark, args.out, args.name, replica)
    print(
        json.dumps(
            {
                "replica_root": args.replica_root,
                "applied_deltas": res["applied_deltas"],
                "change_rows": res["change_rows"],
                "cursor": res["cursor"],
                "replica_version": res["replica_version"],
                "replica_rows": replica.read(spark).count(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
