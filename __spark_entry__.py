"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC query (validate → dedup → LWW final
state) over the sf0.001 events-as-changefeed.  ``queries`` /
``oracle_sql`` expose the registry in
``horizon_etl_spark/queries`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data ops (dedup, ANN,
text analysis, multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC final-state (validate → dedup → LWW, W1 semantics)
    over the sf0.001 change feed derived from events."""
    from horizon_etl_spark.cdc.lww import lww_reduce
    from horizon_etl_spark.cdc.validate import split_valid
    from horizon_etl_spark.queries.cdc_feed import events_as_feed
    from pyspark.sql import functions as F

    feed = events_as_feed(spark, "/root/testdata/sf0.001")
    valid, _ = split_valid(feed)
    winners = lww_reduce(valid.dropDuplicates(["doc_id", "lsn"]))
    return winners.filter(F.col("op") != "delete").select(
        "doc_id", "tokens", "n_tok", "source"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from horizon_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from horizon_etl_spark.queries import ORACLES

    return dict(ORACLES)
