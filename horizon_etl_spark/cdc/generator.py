"""Deterministic, distributed change-feed generator (FIXTURES.md §2).

Everything is a pure JVM-side expression of (seed, lsn, doc_id) — no
wall clock, no RNG state, no driver-side loops — so the feed is
reproducible at any scale (the 10^10 design point is the same plan over
a bigger ``spark.range``) and the expected final token array is a pure
function of (doc_id, max lsn), which is what lets the oracle skip the
replay (FIXTURES.md §5).

Reference analogues: per-year files re-ingested in any order
(/root/reference/src/flows/sigpesq/advisorships.py:29-39) → out-of-order
delivery; duplicate re-delivery swallowed by the unique constraint
(/root/reference/src/tracking/recorder.py:165-178) → 2% cross-batch dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.cdc.schema import SOURCE_WHITELIST

EPOCH = 1_700_000_000  # fixed; ts = EPOCH + lsn seconds (no wall clock)


def _hash01(*cols) -> F.Column:
    """Deterministic uniform (0,1) from arbitrary columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) + F.lit(0.5)) / F.lit(1_000_000.0)


def change_feed(
    spark: SparkSession,
    num_events: int,
    num_keys: int,
    seed: int = 42,
    zipf_s: float = 1.2,
    min_len: int = 8,
    max_len: int = 2048,
    vocab: int = 50257,
    num_batches: int = 1,
    delete_frac: float = 0.10,
    dup_frac: float = 0.02,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the CDC feed.

    Columns: op, doc_id, lsn, tokens, n_tok, source, ts, batch.
    ``lsn`` is globally monotonic in generation order (hence strictly
    increasing per doc_id); ``batch`` splits the feed into
    ``num_batches`` micro-batches by lsn range, and ``dup_frac`` of
    events are re-emitted verbatim into the *next* batch (cross-batch
    duplicate delivery).  Physical row order inside a batch is whatever
    the shuffle produces — deliberately not lsn order.
    """
    base = spark.range(0, num_events, 1, partitions or spark.sparkContext.defaultParallelism)
    lsn = F.col("id")

    # bounded power-law (Zipf-ish, exponent zipf_s) key rank in [1, num_keys]:
    # inverse-CDF of a bounded Pareto — a few hot docs take a large share.
    a = float(zipf_s)
    u = _hash01(F.lit(seed), lsn, F.lit("key"))
    rank = F.floor(
        F.pow(
            F.lit(1.0) + u * (F.pow(F.lit(float(num_keys)), F.lit(1.0 - a)) - F.lit(1.0)),
            F.lit(1.0 / (1.0 - a)),
        )
    )
    rank = F.least(F.greatest(rank, F.lit(1)), F.lit(num_keys))

    df = base.select(
        lsn.alias("lsn"),
        F.format_string("doc-%012d", rank).alias("doc_id"),
    )

    # op mix: first event per key = insert; later events 10% delete /
    # 90% update (generator-only window; the apply path never needs it).
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("doc_id").orderBy("lsn"))
    is_delete = _hash01(F.lit(seed), F.col("lsn"), F.lit("del")) < F.lit(delete_frac)
    df = df.withColumn(
        "op",
        F.when(rn == 1, F.lit("insert"))
        .when(is_delete, F.lit("delete"))
        .otherwise(F.lit("update")),
    )

    length = F.lit(min_len) + F.pmod(
        F.xxhash64(F.col("doc_id"), F.col("lsn"), F.lit("len")),
        F.lit(max_len - min_len + 1),
    )
    tokens = F.transform(
        F.sequence(F.lit(0), (length - 1).cast("int")),
        lambda i: F.pmod(F.xxhash64(F.col("doc_id"), F.col("lsn"), i), F.lit(vocab)).cast("int"),
    )
    not_del = F.col("op") != "delete"
    df = (
        df.withColumn("tokens", F.when(not_del, tokens))
        .withColumn("n_tok", F.when(not_del, F.size("tokens")).cast("int"))
        .withColumn(
            "source",
            F.element_at(
                F.array(*[F.lit(s) for s in SOURCE_WHITELIST]),
                (F.pmod(F.xxhash64("doc_id", F.lit(seed), F.lit("src")), F.lit(len(SOURCE_WHITELIST))) + 1).cast("int"),
            ),
        )
        .withColumn("ts", F.timestamp_seconds(F.lit(EPOCH) + F.col("lsn")))
    )

    batch_size = max(1, -(-num_events // num_batches))  # ceil
    df = df.withColumn("batch", F.floor(F.col("lsn") / F.lit(batch_size)).cast("int"))

    if dup_frac > 0:
        mod = max(2, int(round(1.0 / dup_frac)))
        dups = df.filter(
            F.pmod(F.xxhash64(F.lit(seed), F.col("lsn"), F.lit("dup")), F.lit(mod)) == 0
        ).withColumn(
            "batch",
            F.least(F.col("batch") + 1, F.lit(num_batches - 1)).cast("int"),
        )
        df = df.unionByName(dups)

    return df.select("op", "doc_id", "lsn", "tokens", "n_tok", "source", "ts", "batch")


def corrupt_feed(spark: SparkSession, num_events: int, num_keys: int, seed: int = 43) -> DataFrame:
    """A batch where a deterministic ~5% slice violates exactly one
    validation rule each (FIXTURES.md 'corruption slice')."""
    clean = change_feed(
        spark, num_events, num_keys, seed=seed, num_batches=1, dup_frac=0.0,
        min_len=4, max_len=32,
    )
    sel = F.pmod(F.xxhash64(F.lit(seed), F.col("lsn"), F.lit("corrupt")), F.lit(20))
    kind = F.pmod(F.col("lsn"), F.lit(4))
    corrupted = (
        clean.withColumn(
            "n_tok",
            F.when((sel == 0) & (kind == 0) & (F.col("op") != "delete"), F.col("n_tok") + 1)
            .otherwise(F.col("n_tok")),
        )
        .withColumn(
            "source",
            F.when((sel == 0) & (kind == 1), F.lit("darkweb")).otherwise(F.col("source")),
        )
        .withColumn(
            "doc_id",
            F.when((sel == 0) & (kind == 2), F.lit(None).cast("string")).otherwise(F.col("doc_id")),
        )
        .withColumn(
            "tokens",
            F.when((sel == 0) & (kind == 3) & (F.col("op") != "delete"),
                   F.array().cast("array<int>")).otherwise(F.col("tokens")),
        )
        .withColumn(
            "n_tok",
            F.when((sel == 0) & (kind == 3) & (F.col("op") != "delete"), F.lit(0)).otherwise(F.col("n_tok")),
        )
    )
    return corrupted


def evolved_feed(spark: SparkSession, num_events: int, num_keys: int, seed: int = 44,
                 num_batches: int = 2) -> DataFrame:
    """Feed whose later half carries a new payload column ``lang``
    (FIXTURES.md §3 — additive schema evolution)."""
    df = change_feed(spark, num_events, num_keys, seed=seed, num_batches=num_batches,
                     dup_frac=0.0, min_len=4, max_len=32)
    langs = F.array(F.lit("en"), F.lit("pt"), F.lit("de"))
    half = num_events // 2
    return df.withColumn(
        "lang",
        F.when(
            (F.col("lsn") >= half) & (F.col("op") != "delete"),
            F.element_at(langs, (F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(3)) + 1).cast("int")),
        ),
    )
