"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

``knn_bruteforce`` is the exact baseline (oracle-checked against
DuckDB's list_cosine_similarity); ``knn_lsh`` is the scale path:
random-hyperplane LSH buckets shrink the candidate set so the pairwise
stage is per-bucket, not |V|².  At 100 TB the bucket join replaces the
cross join — identical structure to the MinHash banding in text.py.

Float determinism: dot products are computed in double precision with
a sequential fold in both engines; ranks are tie-broken by neighbor id
so the emitted (query, neighbor, rank) triples are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from horizon_etl_spark.queries.registry import register, table


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    v = F.transform(F.col(col), lambda x: x.cast("double"))
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


@register(
    "knn_bruteforce",
    oracle="""
    SELECT qid, nid, rank FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                        b.vec_id ASC) AS rank
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 100
    ) WHERE rank <= 5
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 100 query vectors —
    brute force baseline (JVM-side higher-order functions, no UDF)."""
    e = with_norm(table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    c = e.select(
        F.col("vec_id").alias("nid"), F.col("_v").alias("nv"), F.col("_norm").alias("nn")
    )
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        q.join(c, F.col("qid") != F.col("nid"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, num_planes: int):
    """Deterministic pseudo-random hyperplanes as JVM expressions:
    component (p, d) = xxhash64(p, d) mapped to (-1, 1)."""
    return [
        F.array(
            *[
                (
                    (F.pmod(F.xxhash64(F.lit(p), F.lit(d)), F.lit(2_000_001)) - F.lit(1_000_000))
                    / F.lit(1_000_000.0)
                )
                for d in range(dim)
            ]
        )
        for p in range(num_planes)
    ]


@register("knn_lsh")  # approximate — no SQL oracle (rows-only check)
def knn_lsh(spark: SparkSession, sf_dir: str, num_planes: int = 6) -> DataFrame:
    """Random-hyperplane LSH ANN: sign-bit bucket per vector, exact
    cosine re-rank within bucket.  Candidate join is an equi-join on
    the bucket id — shuffle ∝ bucket sizes, never |V|²."""
    e = with_norm(table(spark, sf_dir, "embeddings"))
    dim = len(e.select("_v").first()["_v"])
    planes = hyperplanes(dim, num_planes)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bucket = bucket + F.when(_dot(F.col("_v"), p) >= 0, F.lit(1 << i)).otherwise(0)
    b = e.withColumn("bucket", bucket)
    q = b.select(
        F.col("vec_id").alias("qid"),
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("nid"),
        F.col("_v").alias("nv"),
        F.col("_norm").alias("nn"),
        F.col("bucket").alias("nbucket"),
    )
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        q.join(c, (F.col("bucket") == F.col("nbucket")) & (F.col("qid") != F.col("nid")))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "label_sizes",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM embeddings GROUP BY label
    """,
)
def label_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF partition-statistics step: cluster (label) population counts —
    the list-length metadata an IVF index maintains per centroid."""
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


@register("ivf_probe")  # float centroid sums are order-sensitive → rows-only
def ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style probe: centroids = per-label mean vector (one partial
    agg), queries probe the 2 nearest centroids, exact re-rank within
    probed labels only.  The inverted-list scan becomes an equi-join on
    label — the standard billion-scale ANN layout."""
    e = with_norm(table(spark, sf_dir, "embeddings"))
    dim = len(e.select("_v").first()["_v"])
    sums = e.groupBy("label").agg(
        *[F.sum(F.element_at("_v", i + 1)).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    )
    centroid = F.array(*[F.col(f"s{i}") / F.col("n") for i in range(dim)])
    cents = sums.select(F.col("label").alias("clabel"), centroid.alias("cv"))
    cents = cents.withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))

    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    csim = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    wprobe = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("clabel"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", csim)
        .withColumn("prank", F.row_number().over(wprobe))
        .filter(F.col("prank") <= 2)
        .select("qid", "qv", "qn", F.col("clabel").alias("probe_label"))
    )
    c = e.select(
        F.col("vec_id").alias("nid"),
        F.col("_v").alias("nv"),
        F.col("_norm").alias("nn"),
        F.col("label").alias("nlabel"),
    )
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        probed.join(c, (F.col("probe_label") == F.col("nlabel")) & (F.col("qid") != F.col("nid")))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", F.col("rank").cast("long").alias("rank"))
    )
