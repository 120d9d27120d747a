"""spark-submit entry job: relationship-graph bundle — the full
multigraph plus per-kind induced subgraphs published as atomic
nodes/edges Parquet artifacts, the reference's graph-generation flow
(generate_all: one full people graph + one export per classification,
/root/reference/src/core/logic/people_relationship_graph_generator.py:
60-135) as an independent spark-submit job.

    spark-submit --master <cluster> \
        --py-files dist/horizon_etl_spark.zip \
        tools/job_graph.py --sf-dir /data/marts --out /data/exports \
        [--name relationship_graph] [--kinds supplier,customer] \
        [--no-stats]

The full graph's manifest carries the graph-stats block (connected
components via the distributed large-star/small-star algorithm — no
driver-side graph).  Prints exactly one JSON line of evidence on
success.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="relational tables dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="relationship_graph")
    ap.add_argument(
        "--kinds",
        default="supplier,customer",
        help="comma list of node kinds to publish induced subgraphs for "
        "(empty string skips them)",
    )
    ap.add_argument(
        "--no-stats",
        action="store_true",
        help="skip the graph-stats block in the full graph's manifest",
    )
    ap.add_argument(
        "--nation-bundles",
        action="store_true",
        help="also publish one induced subgraph per nation + a bundle "
        "manifest (the reference's research-group graph bundle shape)",
    )
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from horizon_etl_spark.queries.graph import export_relationship_graph

    spark = SparkSession.builder.appName("horizon_etl_spark.job_graph").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    full = export_relationship_graph(
        spark, args.sf_dir, args.out, name=args.name,
        with_stats=not args.no_stats,
    )
    evidence = {
        "out": args.out,
        "full": {"name": args.name, **full},
        "kinds": {},
    }
    for kind in filter(None, args.kinds.split(",")):
        res = export_relationship_graph(
            spark, args.sf_dir, args.out, name=f"{args.name}_{kind}", kind=kind
        )
        evidence["kinds"][kind] = res
    if args.nation_bundles:
        from horizon_etl_spark.queries.graph import export_group_subgraphs

        bundle = export_group_subgraphs(spark, args.sf_dir, args.out)
        evidence["nation_bundle"] = {
            "graphs": len(bundle["graphs"]),
            "manifest": f"{args.out}/relationship_graph_nation_manifest.json",
        }
    print(json.dumps(evidence))
    return 0


if __name__ == "__main__":
    sys.exit(main())
