"""Hot-key skew micro-bench: LWW reduction strategies on a heavily
skewed feed (bounded-zipf s=2.0 → the hottest doc receives a large
share of all events), demonstrating why the engine's reduction is an
aggregate and what the salted two-phase variant buys.

Strategies:
  window  — row_number() over (partition by key order by lsn desc):
            ships EVERY event of the hot key to one reducer and sorts
            it there (the naive plan the north rule warns about).
  plain   — groupBy(key).agg(max_by(payload, lsn)): partial (map-side)
            aggregation collapses each key to ≤1 row per upstream
            partition before the shuffle — skew never reaches a single
            reducer.
  salted  — explicit two-phase (key, salt) → (key) reduction for plans
            where partial aggregation is defeated (e.g. the feed
            arrives already hash-partitioned by key, which Catalyst
            exploits by skipping the partial phase).

Usage: python tools/bench_skew.py [events] [zipf_s]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.cdc.lww import lww_reduce, lww_reduce_salted
from horizon_etl_spark.session import build_session


def window_lww(df, key="doc_id", order="lsn"):
    w = Window.partitionBy(key).orderBy(F.desc(order))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def main():
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    zipf_s = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    spark = build_session("bench-skew", master="local[8]", shuffle_partitions=16)
    scratch = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(), "skew_feed"
    )
    feed = change_feed(
        spark, events, num_keys=1000, seed=42, zipf_s=zipf_s, num_batches=1,
        max_len=256, partitions=64,
    ).drop("batch", "ts")
    feed.write.mode("overwrite").parquet(scratch)
    df = spark.read.parquet(scratch)

    hot = (
        df.groupBy("doc_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    out = {
        "events": df.count(),
        "zipf_s": zipf_s,
        "hottest_key_events": hot["count"],
        "hottest_share": round(hot["count"] / events, 3),
        "strategies": {},
    }

    # pre-partitioned variant: repartition by key first, which lets
    # Catalyst skip partial aggregation — the case salting exists for
    pre = df.repartition(16, "doc_id")

    for name, fn, src in [
        ("window", window_lww, df),
        ("plain_maxby", lww_reduce, df),
        ("salted_two_phase", lww_reduce_salted, df),
        ("plain_prepartitioned", lww_reduce, pre),
        ("salted_prepartitioned", lww_reduce_salted, pre),
    ]:
        fn(src).write.mode("overwrite").parquet(scratch + "_out")  # warm
        t0 = time.time()
        fn(src).write.mode("overwrite").parquet(scratch + "_out")
        out["strategies"][name] = round(time.time() - t0, 2)

    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(scratch + "_out", ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
