"""SparkSession factory with scale-appropriate defaults.

Tuned for the CDC apply workload (shuffle-on-key MERGE + window/agg):
AQE on (runtime coalescing + skew-join splitting), Arrow for the few
vectorized pandas UDFs, and a shuffle-partition default sized for the
local test harness (override for cluster runs via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "horizon_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # parquet scan parallelism at 100 TB is governed by this; the
        # default 128 MiB is right for the real cluster, keep it explicit.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd everywhere: ~2× smaller files/shuffle blocks than snappy/lz4
        # for token arrays — trades cheap CPU for scarce bandwidth, the
        # right direction on both a 1000-executor lake and this sandbox
        # (reference parquet mirror also ships zstd,
        # /root/reference/src/scripts/export_parquet.py:31-70)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.io.compression.codec", "zstd")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        b = b.config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
