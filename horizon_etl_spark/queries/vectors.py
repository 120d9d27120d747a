"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

``knn_bruteforce`` is the exact baseline (oracle-checked against
DuckDB's list_cosine_similarity); ``knn_lsh`` is the scale path:
random-hyperplane LSH buckets shrink the candidate set so the pairwise
stage is per-bucket, not |V|².  At 100 TB the bucket join replaces the
cross join — identical structure to the MinHash banding in text.py.

The approximate paths (``knn_lsh``, ``ivf_probe``) are driver-checked
through deterministic RECALL WITNESS rows (``knn_lsh_recall``,
``ivf_probe_recall``): approximate top-k joined against in-Spark
brute-force top-k, reduced to one constant-comparable row whose pass
flag flips to 0 — and the driver hash goes red — if recall ever drops
below the gated bar.  That closes the "approximate ⇒ no oracle" hole
without pretending the methods are exact.

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


def lsh_bucket_udf(num_tables: int, planes_per_table: int):
    """All L×k hyperplane projections in one Arrow-batched numpy matmul
    (the literal-expression formulation built L·k·dim expression nodes
    and fell out of codegen — ~20× slower).  The plane matrix is
    regenerated per batch from a fixed seed and the batch's own vector
    width — identical on every executor, and no driver-side
    ``.first()`` probe job just to learn the dimension.  Returns a
    pandas UDF: vector → array of L bucket ids."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def bucket_ids(vs):
        import pandas as pd

        mat = np.vstack(vs.map(lambda v: np.asarray(v, dtype="float64")))
        planes = (
            np.random.RandomState(42)
            .standard_normal((num_tables * planes_per_table, mat.shape[1]))
            .astype("float64")
        )
        signs = (mat @ planes.T) >= 0  # (n, L*k)
        weights = 1 << np.arange(planes_per_table)
        out = [
            [
                int(signs[i, t * planes_per_table : (t + 1) * planes_per_table] @ weights)
                for t in range(num_tables)
            ]
            for i in range(signs.shape[0])
        ]
        return pd.Series(out)

    return bucket_ids


def knn_lsh(
    spark: SparkSession, sf_dir: str, num_tables: int = 16, planes_per_table: int = 4
) -> DataFrame:
    """Multi-table random-hyperplane LSH ANN: L independent hash tables
    of k sign bits each; candidates = pairs sharing a bucket in ANY
    table (recall grows with L, bucket size shrinks with k — the
    classic (L, k) tradeoff), then exact cosine re-rank of the
    candidate union.  All joins are equi-joins on (table_id, bucket) —
    shuffle ∝ collisions, never |V|².  Measured recall@5 vs brute force
    on the sf0.001 embeddings (uniform-on-sphere — the hard case):
    0.67 at L=8/k=4, 0.90 at the default L=16/k=4 at equal wall time
    (tests/test_ann_quality.py); at larger N raise k to keep buckets
    bounded and L for recall."""
    e = with_norm(table(spark, sf_dir, "embeddings"))
    bucket_ids = lsh_bucket_udf(num_tables, planes_per_table)
    b = (
        e.withColumn("_buckets", bucket_ids(F.col("_v")))
        .select(
            "vec_id",
            "_v",
            "_norm",
            F.posexplode("_buckets").alias("table_id", "bucket"),
        )
        # buckets feed BOTH sides of the self-join below; without the
        # checkpoint each side re-runs the Arrow bucket UDF + norm fold
        # over the full table (2× the most expensive stage)
        .localCheckpoint(eager=False)
    )
    q = b.select(
        F.col("vec_id").alias("qid"),
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
        "table_id",
        "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("nid"),
        F.col("_v").alias("nv"),
        F.col("_norm").alias("nn"),
        F.col("table_id").alias("ntable"),
        F.col("bucket").alias("nbucket"),
    )
    cand = (
        q.join(
            c,
            (F.col("table_id") == F.col("ntable"))
            & (F.col("bucket") == F.col("nbucket"))
            & (F.col("qid") != F.col("nid")),
        )
        .select("qid", "qv", "qn", "nid", "nv", "nn")
        .dropDuplicates(["qid", "nid"])
    )
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", F.col("rank").cast("long").alias("rank"))
    )


def _recall_witness(
    truth: DataFrame, approx: DataFrame, config: dict[str, int], threshold_pct: int, flag: str
) -> DataFrame:
    """One-row deterministic recall witness: join the approximate
    method's top-k against the exact brute-force top-k and emit the
    fixed config plus ``<flag> = 1`` iff recall ≥ ``threshold_pct``.
    Both engines' side of the driver compare reduce to constants (the
    oracle derives n_truth from the same table), so the row is
    hash-checkable — yet it only stays green while the ANN path
    actually clears the recall bar on the driver's data."""
    hit = truth.join(
        approx.select("qid", "nid").withColumn("_hit", F.lit(1)),
        ["qid", "nid"],
        "left",
    )
    agg = hit.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
    )
    return agg.select(
        *[F.lit(v).cast("long").alias(k) for k, v in config.items()],
        F.col("n_truth").cast("long").alias("n_truth"),
        (F.col("n_hit") * 100 >= F.col("n_truth") * threshold_pct)
        .cast("long")
        .alias(flag),
    )


@register(
    "knn_lsh_recall",
    oracle="""
    SELECT CAST(16 AS BIGINT) AS num_tables,
           CAST(4 AS BIGINT) AS planes_per_table,
           CAST(5 * COUNT(*) AS BIGINT) AS n_truth,
           CAST(1 AS BIGINT) AS recall_ge_85
    FROM embeddings WHERE vec_id < 100
    """,
)
def knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable witness for the approximate ``knn_lsh`` path
    (the one registry row an approximate method CAN honestly have): LSH
    top-5 joined against in-Spark brute-force top-5 over the 100 query
    vectors, emitting ``recall_ge_85 = 1``.  Measured recall@5 is 0.90
    at sf0.001 and 0.91 at sf0.01 (uniform-on-sphere embeddings — the
    hard case), so the 85% bar holds with margin while still failing
    loudly if the bucket machinery regresses.  Determinism: fixed
    hyperplane seed (RandomState(42)), stable tie-breaks by neighbor
    id in both rankings."""
    truth = knn_bruteforce(spark, sf_dir)
    approx = knn_lsh(spark, sf_dir).filter(F.col("qid") < 100)
    return _recall_witness(
        truth, approx, {"num_tables": 16, "planes_per_table": 4}, 85, "recall_ge_85"
    )


_NEAR_DUP_ORACLE = """
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings
    ), pert AS (
      SELECT vec_id + 1000000 AS vec_id, label,
             list_prepend(v[1] * 1.1 + 0.05, v[2:]) AS v
      FROM base WHERE vec_id % 10 = 0
    ), u AS (
      SELECT * FROM base UNION ALL SELECT * FROM pert
    )
    SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b
    FROM u a JOIN u b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    """


def _near_dup_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base embeddings ∪ deterministic perturbed copies (the synthetic
    ground truth both near-dup variants must recover): the testdata
    embeddings are uniform on the sphere (no natural pair exceeds
    cosine 0.5), so every vec_id % 10 == 0 gets a near-copy (first
    component scaled+shifted, id offset +1e6) — the only pairs above
    threshold 0.9, with wide float margin on both sides."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    pert = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        "label",
        F.concat(
            F.array(F.element_at("v", 1) * 1.1 + 0.05),
            F.slice(F.col("v"), 2, F.size("v") - 1),
        ).alias("v"),
    )
    return base.unionByName(pert).withColumn("_n", F.sqrt(_dot(F.col("v"), F.col("v"))))


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, blocked on the label
    column — the ORACLE TWIN: exactly reproducible in DuckDB SQL, but
    quadratic within each label block at scale.  The WIRED 100 TB path
    is ``embedding_near_dup_lsh`` below (bucket-blocked candidate
    generation, work ∝ collisions); tests/test_ann_quality.py asserts
    the two find the identical pair set on the synthesized ground truth
    — the same twin pattern as ngram_jaccard_pairs / minhash_dedup in
    text.py."""
    u = _near_dup_universe(spark, sf_dir)
    a = u.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("la"),
        F.col("v").alias("va"), F.col("_n").alias("na"),
    )
    b = u.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lb"),
        F.col("v").alias("vb"), F.col("_n").alias("nb"),
    )
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
        .filter(sim >= 0.9)
        .select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
    )


# the driver row stays on the exactly-SQL-checkable twin; the wired
# scale path below is recall- and plan-gated in tests/test_ann_quality.py
register("embedding_near_dup", oracle=_NEAR_DUP_ORACLE)(embedding_near_dup)


def embedding_near_dup_lsh(
    spark: SparkSession, sf_dir: str, num_tables: int = 16, planes_per_table: int = 4
) -> DataFrame:
    """Embedding-cosine near-dup, WIRED scale path: candidate pairs are
    vectors sharing a random-hyperplane LSH bucket in ANY of the L
    tables (the same bucket machinery as ``knn_lsh``), verified by
    exact cosine ≥ 0.9.  Near-identical vectors (cosine ≥ 0.9) agree on
    almost every hyperplane sign, so with L=16 tables of k=4 bits the
    probability of missing a true pair is negligible (~(1-0.97⁴)¹⁶);
    measured recall on the synthesized perturbed-copy ground truth is
    1.0 (test_ann_quality.py).  All joins are equi-joins on
    (table_id, bucket) — shuffle ∝ collisions, never |V|², unlike the
    label-blocked oracle twin above."""
    u = _near_dup_universe(spark, sf_dir)
    bucket_ids = lsh_bucket_udf(num_tables, planes_per_table)
    b = (
        u.withColumn("_buckets", bucket_ids(F.col("v")))
        .select(
            "vec_id", "v", "_n", F.posexplode("_buckets").alias("table_id", "bucket")
        )
        # computed once for both self-join sides (see knn_lsh)
        .localCheckpoint(eager=False)
    )
    a_side = b.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("_n").alias("na"), "table_id", "bucket",
    )
    b_side = b.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("_n").alias("nb"),
        F.col("table_id").alias("btable"), F.col("bucket").alias("bbucket"),
    )
    cand = (
        a_side.join(
            b_side,
            (F.col("table_id") == F.col("btable"))
            & (F.col("bucket") == F.col("bbucket"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "va", "na", "id_b", "vb", "nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.filter(sim >= 0.9)
        .select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
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


def ivf_probe(
    spark: SparkSession,
    sf_dir: str,
    num_cells: int = 16,
    nprobe: int = 6,
    cell_chunk: int = 4096,
) -> DataFrame:
    """IVF coarse quantize + probe: ``num_cells`` deterministic seed
    vectors (the first vec_ids) act as centroids; every vector is
    assigned to its nearest seed (one k-means assignment step); queries
    probe the ``nprobe`` nearest cells and re-rank exactly within them.
    The inverted-list scan is an equi-join on cell id — the standard
    billion-scale ANN layout (cells ≈ √N, probe a few).

    Scale path: the assignment is an Arrow-batched numpy matmul
    against the broadcast seed matrix (argsort top-n per row) — no
    crossJoin row blowup (the previous crossJoin(broadcast(seeds))
    multiplied the table num_cells× before the argmax window; at
    cells≈√N that was the scale-killer k-means-assign shape).  The seed
    matrix is O(num_cells·dim) and ships in the UDF closure, same slot
    as the LSH hyperplanes; the matmul is CHUNKED over ``cell_chunk``
    cell blocks with a running per-row top-``nprobe`` merge, so the
    (batch × num_cells) similarity intermediate never materializes at
    large num_cells — peak extra memory is
    O(batch × (cell_chunk + nprobe)) regardless of cell count.
    Chunked and unchunked paths are bit-identical (ties break by
    ascending cell id; tests force cell_chunk < num_cells and assert
    equality).  Measured recall@5 vs brute force at sf0.001 is gated in
    tests/test_ann_quality.py."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    e = with_norm(table(spark, sf_dir, "embeddings"))
    seed_rows = (
        e.filter(F.col("vec_id") < num_cells)
        .select("vec_id", "_v", "_norm")
        .collect()
    )
    seed_rows.sort(key=lambda r: r["vec_id"])
    seed_ids = np.array([r["vec_id"] for r in seed_rows], dtype="int64")
    seed_mat = np.vstack([np.asarray(r["_v"], dtype="float64") for r in seed_rows])
    seed_mat = seed_mat / np.array([[r["_norm"]] for r in seed_rows])
    chunk = max(1, int(cell_chunk))

    @pandas_udf("array<long>")
    def nearest_cells(vs):
        import pandas as pd

        mat = np.vstack(vs.map(lambda v: np.asarray(v, dtype="float64")))
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = mat.shape[0]
        # running top-nprobe per row, merged chunk by chunk.  Tie-break
        # invariant: within any equal-sim group the kept entries are in
        # ascending seed-index order — true inductively because chunks
        # ascend in seed index and the stable argsort keeps earlier
        # (lower-index) entries first.
        best_sims = np.full((n, 0), -np.inf)
        best_idx = np.zeros((n, 0), dtype="int64")
        for lo in range(0, seed_mat.shape[0], chunk):
            sims_c = mat @ seed_mat[lo : lo + chunk].T  # (batch, chunk)
            idx_c = np.broadcast_to(
                np.arange(lo, lo + sims_c.shape[1], dtype="int64"), sims_c.shape
            )
            cat_sims = np.concatenate([best_sims, sims_c], axis=1)
            cat_idx = np.concatenate([best_idx, idx_c], axis=1)
            order = np.argsort(-cat_sims, axis=1, kind="stable")[:, :nprobe]
            rows = np.arange(n)[:, None]
            best_sims = cat_sims[rows, order]
            best_idx = cat_idx[rows, order]
        return pd.Series([[int(seed_ids[j]) for j in row] for row in best_idx])

    ranked = e.withColumn("_cells", nearest_cells(F.col("_v")))
    assigned = ranked.select(
        "vec_id", "_v", "_norm", F.element_at("_cells", 1).alias("cell")
    )
    probed = (
        ranked.filter(F.col("vec_id") < 50)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("_v").alias("qv"),
            F.col("_norm").alias("qn"),
            F.explode("_cells").alias("probe_cell"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("nid"),
        F.col("_v").alias("nv"),
        F.col("_norm").alias("nn"),
        F.col("cell").alias("ncell"),
    )
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        probed.join(c, (F.col("probe_cell") == F.col("ncell")) & (F.col("qid") != F.col("nid")))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "ivf_probe_recall",
    oracle="""
    SELECT CAST(16 AS BIGINT) AS num_cells,
           CAST(6 AS BIGINT) AS nprobe,
           CAST(5 * COUNT(*) AS BIGINT) AS n_truth,
           CAST(1 AS BIGINT) AS recall_ge_60
    FROM embeddings WHERE vec_id < 50
    """,
)
def ivf_probe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable witness for the approximate ``ivf_probe`` path:
    IVF top-5 joined against in-Spark brute-force top-5 over the 50
    query vectors, emitting ``recall_ge_60 = 1``.  Measured recall@5 is
    0.71 at sf0.001 and 0.75 at sf0.01 on structureless
    uniform-on-sphere data (random probing of 6/16 cells would land
    ~0.375), so the 60% bar holds with margin and still catches an
    assignment/probe regression.  Determinism: fixed seed centroids
    (lowest vec_ids), stable argsort tie-breaks by cell id, stable
    rank tie-breaks by neighbor id."""
    truth = knn_bruteforce(spark, sf_dir).filter(F.col("qid") < 50)
    approx = ivf_probe(spark, sf_dir).filter(F.col("qid") < 50)
    return _recall_witness(
        truth, approx, {"num_cells": 16, "nprobe": 6}, 60, "recall_ge_60"
    )
