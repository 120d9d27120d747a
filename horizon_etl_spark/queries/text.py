"""Text-analysis & deduplication operators over the ``documents`` table —
the training-data-pipeline surface (language-ID, quality scoring, token
counting, fingerprinting, exact + near dedup).

All oracle-checked queries emit only exactly-representable values
(strings, bigints, md5 hex) — similarity ratios are carried as
(intersection, union) integer pairs so the DuckDB comparison is exact.

Scale notes: fingerprint/exact-dedup are map-side + one hash agg on the
fingerprint (no skew: hashes are uniform).  Near-dup pair generation is
*blocked* on (lang, source) before the self-join — at 100 TB the block
key would be a banded MinHash bucket (see ``minhash_dedup``), never an
unblocked cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.queries.registry import register, table

# canonical whitespace-token split used by token_count/quality/shingles
_WS = " +"


def _words(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), _WS)


# ---------------------------------------------------------------- tokens
# BPE-ish pre-tokenizer pattern (GPT-2 style, reduced to the regex
# subset Java and RE2 share): contractions, letter runs, digit runs,
# punctuation runs, whitespace runs — each with the leading-space merge.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS BIGINT) AS n_distinct_words,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
           CAST(len(list_filter(regexp_extract_all(text, '{_BPE_PAT_SQL}'),
                                t -> trim(t) <> '')) AS BIGINT) AS n_bpe_tokens,
           md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-style token counting and the content
    fingerprint, per document, in one pass — the token-counting /
    fingerprinting ops of the training-data surface (split mirrors
    strategies/base.py:78-83; hash mirrors tracking/recorder.py:36-40).
    One driver row witnesses all three (the per-op variants below stay
    callable for tests/composition)."""
    d = table(spark, sf_dir, "documents")
    w = _words()
    toks = F.filter(
        F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0)),
        lambda t: F.trim(t) != "",
    )
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias(
            "n_word_chars"
        ),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.md5(norm).alias("fingerprint"),
    )


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer counting: the GPT-2 split pattern
    (contractions / letter / digit / punct runs with leading-space
    merge) applied JVM-side with regexp_extract_all; whitespace-only
    matches excluded.  This is the token-estimate a training-data
    pipeline budgets by before running the real BPE merge table."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0)),
        lambda t: F.trim(t) != "",
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


@register(
    "winnowing_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(length(text) - 7, 0)),
                            i -> md5(substring(text, i, 8))) AS gh
      FROM documents
    ), w AS (
      SELECT doc_id,
             CASE WHEN len(gh) = 0 THEN CAST([] AS VARCHAR[])
                  WHEN len(gh) < 4 THEN [list_min(gh)]
                  ELSE list_transform(generate_series(1, len(gh) - 3),
                                      j -> list_min(gh[j:j+3]))
             END AS wins
      FROM g
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(list_distinct(wins)) AS BIGINT) AS n_fp,
           md5(coalesce(list_aggregate(list_sort(list_distinct(wins)),
                                       'string_agg', ''), '')) AS fp_digest
    FROM w
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing / MOSS family):
    hash every 8-char gram, slide a window of 4 gram-hashes keeping the
    window minimum, emit the distinct fingerprint set (here its size +
    an md5 digest of the sorted set, exactly reproducible in SQL).

    Scale note: the nested transform(slice) formulation is fine for the
    oracle twin; at 100 TB the same winnow is the explode → window-min
    → distinct pipeline (identical shape to minhash_signatures'
    explode + min-agg), which stays in whole-stage codegen."""
    d = table(spark, sf_dir, "documents")
    n = F.length("text")
    gh = F.transform(
        F.when(n >= 8, F.sequence(F.lit(1), n - 7)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.md5(F.substring(F.col("text"), i, 8)),
    )
    d2 = d.select(F.col("doc_id").cast("long").alias("doc_id"), gh.alias("gh"))
    m = F.size("gh")
    wins = (
        F.when(m == 0, F.array().cast("array<string>"))
        .when(m < 4, F.array(F.array_min("gh")))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), m - 3),
                lambda j: F.array_min(F.slice(F.col("gh"), j, 4)),
            )
        )
    )
    return d2.select(
        "doc_id",
        F.size(F.array_distinct(wins)).cast("long").alias("n_fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(wins)), "")).alias("fp_digest"),
    )


# --------------------------------------------------------- quality+langid
@register(
    "doc_quality_score",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_stop AS BIGINT) AS n_stop,
           CASE WHEN n_words >= 20 AND n_stop * 10 >= n_words THEN 'keep'
                WHEN n_words >= 5 THEN 'review' ELSE 'drop' END AS quality_bucket,
           lang AS labeled_lang,
           CASE WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
                WHEN c_es >= c_de THEN 'es' ELSE 'de' END AS pred_lang
    FROM (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), ' +')) AS n_words,
             len(list_filter(regexp_split_to_array(trim(text), ' +'),
                             w -> w IN ('the','a','of','and','data'))) AS n_stop,
             len(list_filter(regexp_split_to_array(trim(text), ' +'),
                             w -> w IN ('the','a','of'))) AS c_en,
             len(list_filter(regexp_split_to_array(trim(text), ' +'),
                             w -> w IN ('el','la','de'))) AS c_es,
             len(list_filter(regexp_split_to_array(trim(text), ' +'),
                             w -> w IN ('der','die','das'))) AS c_de
      FROM documents
    )
    """,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/stopword-ratio heuristics — the P2
    validation-filter idea re-targeted at document quality,
    project_loader.py:524-529) plus marker-word-voting language ID
    (n-gram heuristic family, deterministic argmax with fixed tie
    order) — both per-doc classifications in one pass / one driver row."""
    d = table(spark, sf_dir, "documents")
    w = _words()
    stop = F.array([F.lit(s) for s in ("the", "a", "of", "and", "data")])
    n_words = F.size(w)
    # F.filter keeps duplicates — a count, not a set-intersect
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop, x)))
    bucket = (
        F.when((n_words >= 20) & (n_stop * 10 >= n_words), "keep")
        .when(n_words >= 5, "review")
        .otherwise("drop")
    )

    def count_in(words: tuple[str, ...]) -> F.Column:
        arr = F.array([F.lit(s) for s in words])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    c_en = count_in(("the", "a", "of"))
    c_es = count_in(("el", "la", "de"))
    c_de = count_in(("der", "die", "das"))
    pred = (
        F.when((c_en >= c_es) & (c_en >= c_de), "en")
        .when(c_es >= c_de, "es")
        .otherwise("de")
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        n_stop.cast("long").alias("n_stop"),
        bucket.alias("quality_bucket"),
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
    )


# ---------------------------------------------------------------- langid
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word-voting language ID (n-gram heuristic family).
    Deterministic argmax with a fixed preference order on ties."""
    d = table(spark, sf_dir, "documents")
    w = _words()

    def count_in(words: tuple[str, ...]) -> F.Column:
        arr = F.array([F.lit(s) for s in words])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    c_en = count_in(("the", "a", "of"))
    c_es = count_in(("el", "la", "de"))
    c_de = count_in(("der", "die", "das"))
    pred = (
        F.when((c_en >= c_es) & (c_en >= c_de), "en")
        .when(c_es >= c_de, "es")
        .otherwise("de")
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
    )


# ----------------------------------------------------------- fingerprint
_NORM_SQL = "md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))"


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text — the stable_hash idea (tracking/recorder.py:36-40: hash of a
    canonicalized serialization)."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.md5(norm).alias("fingerprint")
    )


# ---------------------------------------------------------- exact dedup
@register(
    "exact_dedup_docs",
    oracle=f"""
    SELECT {_NORM_SQL} AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint, keep the
    min doc_id — the payload-hash unique-constraint dedup of the
    reference (source_record.py:10-17) as a distributed group-by."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", " +", " ")))
    return (
        d.select(F.md5(norm).alias("fingerprint"), F.col("doc_id").cast("long").alias("doc_id"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------- n-gram jaccard
@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang, source,
             list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, lang, source,
                   regexp_split_to_array(trim(text), ' +') AS w
            FROM documents)
      WHERE len(w) >= 3
    )
    SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_inter,
           CAST(len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_union
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) * 5
          >= (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles)))
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs, blocked on (lang, source):
    candidate pairs J >= 0.2, similarity reported as exact integer
    (intersection, union).  The blocked self-join is the scalable shape
    of reference fuzzy matching (person_matcher.py:216-241: block on a
    normalized key, score within block)."""
    d = table(spark, sf_dir, "documents")
    w = _words()
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        )
    )
    par = spark.sparkContext.defaultParallelism
    sh = (
        d.repartition(par)  # small-file scan is 1 task; spread the shingle work
        .withColumn("w", w)
        .filter(F.size("w") >= 3)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            "source",
            shingles.alias("shingles"),
        )
        .localCheckpoint(eager=False)  # compute shingles once, not per join side
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
        )
        .filter(F.col("n_inter") * 5 >= F.col("n_union"))
    )


# ------------------------------------------------------------- minhash
def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signatures over word-3-gram shingles, all JVM-side.

    ``hash_fn='md5'`` (default): slot i = MIN over shingles of
    ``md5('<i>|' || shingle)`` as a 32-char hex string — fixed-length
    hex, so lexicographic MIN == numeric MIN, and DuckDB computes the
    exact same strings (the signatures/bands are *exactly*
    oracle-checkable).  ``hash_fn='xxhash64'`` is the max-throughput
    variant (8-byte longs, ~2-3× cheaper per shingle) with identical
    structure but no cross-engine twin.

    Physical shape: explode shingles → ``num_hashes`` codegen'd hash
    columns (literal seeds) → partial+final min-aggregate per doc →
    packed back into an array.  An earlier formulation computed the
    signature with nested higher-order-function lambdas
    (transform(seq, seed -> array_min(transform(shingles, ...)))) —
    nested HOF lambdas are evaluated interpreted, outside whole-stage
    codegen, and measured 18× slower (9.0s → 0.5s for 5000 docs).
    The explode never shuffles shingle rows: the min-agg collapses
    map-side to one row per (doc, 16 mins) before the exchange."""
    w = F.split(F.trim(F.col(text_col)), _WS)
    # guard: sequence(1, n) with n < 1 generates DESCENDING [1..n] in
    # Spark — short docs must map to an empty shingle set explicitly
    shingles = F.when(
        F.size(w) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the generator expression stays INLINE in the explode select:
    # projecting the array into a column first and exploding the
    # attribute measures ~5x slower (Generate loses the collapsed
    # projection); explode also drops empty arrays, no filter needed
    ex = docs.select(id_col, F.explode(shingles).alias("_sh"))
    if hash_fn == "md5":
        hcols = [
            F.md5(F.concat(F.lit(f"{i}|"), F.col("_sh"))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    else:
        hcols = [F.xxhash64("_sh", F.lit(i)).alias(f"_h{i}") for i in range(num_hashes)]
    hashed = ex.select(id_col, *hcols)
    return hashed.groupBy(id_col).agg(
        F.array(*[F.min(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


_MINHASH_ORACLE = """
    WITH wd AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM wd WHERE len(w) >= 3
    ), hs AS (
      SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || '|' || s)) AS mh
      FROM sh, unnest(shingles) AS t(s), generate_series(0, 15) AS g(i)
      GROUP BY doc_id, i
    ), sig AS (
      SELECT doc_id, list(mh ORDER BY i) AS sig FROM hs GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, b,
             md5(sig[b*4+1] || sig[b*4+2] || sig[b*4+3] || sig[b*4+4]) AS bh
      FROM sig, generate_series(0, 3) AS gb(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT CAST(c.doc_a AS BIGINT) AS doc_a, CAST(c.doc_b AS BIGINT) AS doc_b,
           CAST(len(list_filter(generate_series(1, 16),
                                i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_agree
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) * 2 >= 16
    """


@register("minhash_dedup", oracle=_MINHASH_ORACLE)
def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates: signatures → band
    buckets (band = md5 of 4 consecutive sig slots) → pairs sharing a
    bucket → verified by signature agreement >= 50%.  On md5 the whole
    pipeline — signatures, band buckets, candidate pairs, agreement
    counts — is reproduced exactly by the DuckDB oracle (no
    approximate/rows-only check).

    This is the 100-TB-scale path: candidate generation is a groupBy on
    (band_id, band_hash) — work is proportional to collisions, never to
    |docs|² (the blocked-jaccard query above is the small-scale twin)."""
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    # signatures computed exactly once (localCheckpoint cuts the lineage
    # so neither the band self-join nor the verify join recomputes them)
    sigs = (
        minhash_signatures(d.repartition(par), num_hashes=16)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "sig")
        .localCheckpoint(eager=False)
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.md5(F.concat_ws("", F.slice(F.col("sig"), b * 4 + 1, 4))).alias(
                        "band_hash"
                    ),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    # candidate pairs: narrow (id, band) rows only — signature payloads
    # stay out of the shuffle (work ∝ bucket collisions, not |docs|²)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify: join the small signature table back in (broadcast)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y), lambda e: e)
    )
    return (
        cand.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", agree.cast("long").alias("n_agree"))
        .filter(F.col("n_agree") * 2 >= 16)
    )


def _simhash_oracle() -> str:
    """Generate the DuckDB twin of the md5 SimHash: per-bit set-counts
    via hex-nibble decode (strpos alphabet), majority → bit, bits →
    16-hex-char hash string + its four 4-char (16-bit) bands."""
    counts = []
    for b in range(64):
        ci, k = b // 4 + 1, 3 - (b % 4)
        counts.append(
            f"list_sum(list_transform(hs, h -> "
            f"((strpos('0123456789abcdef', substring(h, {ci}, 1)) - 1) >> {k}) & 1)) AS c{b}"
        )
    nibbles = []
    for j in range(16):
        bits = " + ".join(
            f"(CASE WHEN 2 * coalesce(c{4 * j + i}, 0) > n THEN {1 << (3 - i)} ELSE 0 END)"
            for i in range(4)
        )
        nibbles.append(f"substring('0123456789abcdef', ({bits}) + 1, 1)")
    sim = " || ".join(nibbles)
    return f"""
    WITH wd AS (
      SELECT doc_id,
             list_transform(list_distinct(regexp_split_to_array(trim(text), ' +')),
                            s -> md5(s)) AS hs
      FROM documents
    ), cnt AS (
      SELECT doc_id, len(hs) AS n, {", ".join(counts)} FROM wd
    ), sh AS (
      SELECT doc_id, {sim} AS simhash FROM cnt
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash,
           substring(simhash, 1, 4) AS band0, substring(simhash, 5, 4) AS band1,
           substring(simhash, 9, 4) AS band2, substring(simhash, 13, 4) AS band3
    FROM sh
    """


@register("simhash_docs", oracle=_simhash_oracle())
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: per-word md5, per-bit majority vote
    over the first 16 hex nibbles, emitted as a 16-hex-char hash plus
    its 4 four-char (16-bit) hamming candidate bands.  All JVM
    expressions — no UDF — and exactly reproduced by the DuckDB oracle
    (md5 is the cross-engine hash; nibbles decode via conv() on the
    Spark side, strpos-alphabet on DuckDB).

    Physical shape: one md5 per distinct word (computed once into an
    array column), then 64 static ``aggregate`` folds — each a
    codegen'd single pass over the hash array — then pure projections."""
    d = table(spark, sf_dir, "documents")
    w = _words()
    hashes = F.transform(F.array_distinct(w), lambda s: F.md5(s))

    # set-bit count for bit b: nibble = conv(hex char, 16, 10), then
    # (nibble >> k) & 1 summed over words
    def _count(b: int):
        ci, k = b // 4 + 1, 3 - (b % 4)
        return F.aggregate(
            F.col("h"),
            F.lit(0),
            lambda acc, x: acc
            + F.shiftright(
                F.conv(F.substring(x, ci, 1), 16, 10).cast("int"), k
            ).bitwiseAND(F.lit(1)),
        )

    bit_counts = F.array(*[_count(b) for b in range(64)])
    n = F.size(F.col("h"))

    def _bit(b: int) -> F.Column:
        return F.when(F.element_at(F.col("cnt"), b + 1) * 2 > n, F.lit(1 << (3 - b % 4))).otherwise(
            F.lit(0)
        )

    alphabet = "0123456789abcdef"
    nibble_chars = [
        F.substring(
            F.lit(alphabet),
            sum([_bit(4 * j + i) for i in range(4)], F.lit(0)) + 1,
            1,
        )
        for j in range(16)
    ]
    out = (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), hashes.alias("h"))
        .withColumn("cnt", bit_counts)
        .withColumn("simhash", F.concat(*nibble_chars))
    )
    return out.select(
        "doc_id",
        "simhash",
        F.substring("simhash", 1, 4).alias("band0"),
        F.substring("simhash", 5, 4).alias("band1"),
        F.substring("simhash", 9, 4).alias("band2"),
        F.substring("simhash", 13, 4).alias("band3"),
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTER consolidation — the step a training-data
    pipeline runs after candidate generation: the MinHash-LSH verified
    pair set (``minhash_dedup``) is closed into connected components
    (a doc transitively linked to a near-dup group belongs to it even
    without a direct pair), every document gets a cluster id
    (singletons are their own cluster), and each cluster elects ONE
    canonical document — longest text wins, ties broken by smallest
    doc_id — so ``is_duplicate`` rows are exactly what a dedup pass
    drops.  Reference semantics: the duplicate-group consolidation in
    canonical_data.py's dedup step (group → elected survivor →
    non-survivors removed), re-expressed over the LSH candidate graph.

    Scale posture: pair volume is ∝ LSH bucket collisions (never
    |docs|²), the closure is the same large-star/small-star
    ``connected_components`` the relationship graph uses (O(log n)
    shuffle rounds, no driver-side graph), and the election is one
    max_by-shaped aggregate per cluster — each stage survives a
    100 TB corpus.

    Returns (doc_id, cluster_id, cluster_size, canonical_doc,
    is_duplicate), one row per document."""
    from horizon_etl_spark.queries.graph import connected_components

    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(F.col("text")).alias("_q"),
    )
    pairs = minhash_dedup(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(spark, pairs, src="doc_a", dst="doc_b")
    member = d.join(
        comp.select(F.col("node").alias("doc_id"), "component"),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "_q",
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
    )
    # one aggregate elects the canonical doc: max (quality, -doc_id)
    # struct = longest text, then smallest id — deterministic without
    # a window sort over the whole corpus
    elect = member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.max(F.struct(F.col("_q"), (-F.col("doc_id")).alias("_n"))).alias("_w"),
    ).select(
        "cluster_id",
        "cluster_size",
        (-F.col("_w._n")).cast("long").alias("canonical_doc"),
    )
    return member.join(elect, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "canonical_doc",
        (F.col("doc_id") != F.col("canonical_doc")).alias("is_duplicate"),
    )
