"""Entity matching / key resolution — the stage that turns dirty
source-record identities into canonical entity keys before apply.

Reference semantics reproduced:
  * an ``entity_matches`` lineage row records (source_record →
    canonical id, match_strategy, match_confidence)
    (/root/reference/src/tracking/entities/entity_match.py:8-33);
  * resolution is a score ladder — stable identifiers first, then
    exact name, then normalized name, then fuzzy
    (/root/reference/src/core/logic/researcher_resolution.py:29-53,119-165;
    /root/reference/src/core/logic/person_matcher.py:196-241);
  * fuzzy matching is token_sort_ratio >= 90 after normalization
    (/root/reference/src/core/logic/person_matcher.py:216-241) — here
    blocked on a cheap key first so the scorer only sees candidate
    pairs, never |src| x |registry| (J6, SURVEY.md §2.3).

Spark shape: the ladder is a fixed chain of LEFT joins against
key-deduplicated registry projections (broadcast when small) with a
priority coalesce — one declarative plan, no driver-side loops.  The
fuzzy stage is a blocked equi-join + grouped Arrow-batched pandas
scorer (the sanctioned Python slot)."""

from __future__ import annotations

import difflib

from pyspark.sql import DataFrame, functions as F

def norm_name(col: F.Column) -> F.Column:
    """lower + collapse whitespace (cheap JVM normalization; full
    unicode strip lives in the F1/F2 pandas UDF when needed)."""
    return F.lower(F.trim(F.regexp_replace(col, " +", " ")))


def token_sort_key(col: F.Column) -> F.Column:
    """Sorted-token canonical form: two names with the same tokens in
    any order collide — token_sort_ratio == 100 as an equi-join."""
    return F.array_join(F.array_sort(F.split(norm_name(col), " ")), " ")


# resolution ladder, strongest first: (strategy, confidence, join-key
# expression).  The reference scores 500/400/.../150
# (researcher_resolution.py:119-165); carried here as confidence
# percentages like entity_match.match_confidence.  This single tuple
# drives resolve_entities' joins, strategy CASE, confidence CASE and
# coalesce — add or re-weight a stage in ONE place.
STRATEGIES = (
    ("exact_name", 100, lambda c: c),
    ("normalized_name", 95, norm_name),
    ("token_sort", 90, token_sort_key),
)


def _dedup_registry(registry: DataFrame, id_col: str, key: F.Column) -> DataFrame:
    """One registry row per join key, lowest id wins (the reference
    keeps the best-quality row per canonical name,
    person_matcher.py:58-65; lowest-id is our deterministic tiebreak)."""
    return (
        registry.select(key.alias("_k"), F.col(id_col).alias("_cid"))
        .filter(F.col("_k").isNotNull() & (F.col("_k") != ""))
        .groupBy("_k")
        .agg(F.min("_cid").alias("_cid"))
    )


def resolve_entities(
    src: DataFrame,
    registry: DataFrame,
    src_name: str = "qname",
    reg_name: str = "name",
    reg_id: str = "cid",
    broadcast_registry: bool = True,
) -> DataFrame:
    """Score-laddered key resolution: exact name → normalized name →
    sorted-token name.  Returns ``src`` columns + ``canonical_id``
    (null when unresolved), ``match_strategy`` ('unresolved' when no
    stage hit) and ``match_confidence``.

    Unresolved rows are the caller's quarantine feed (reference: new
    entities are only *created* by loaders that own the registry;
    resolution alone never invents ids)."""
    maybe_b = F.broadcast if broadcast_registry else (lambda df: df)
    out = src
    for sname, _conf, key_fn in STRATEGIES:
        reg = maybe_b(_dedup_registry(registry, reg_id, key_fn(F.col(reg_name))))
        out = out.join(
            reg.withColumnRenamed("_cid", f"_cid_{sname}"),
            key_fn(F.col(src_name)) == F.col("_k"),
            "left",
        ).drop("_k")
    hits = [(F.col(f"_cid_{sname}"), sname, conf) for sname, conf, _ in STRATEGIES]
    strategy = F.lit("unresolved")
    confidence = F.lit(None).cast("long")
    for hit, sname, conf in reversed(hits):
        strategy = F.when(hit.isNotNull(), sname).otherwise(strategy)
        confidence = F.when(hit.isNotNull(), conf).otherwise(confidence)
    canonical = F.coalesce(*[hit for hit, _, _ in hits])
    return out.select(
        *[c for c in src.columns],
        canonical.alias("canonical_id"),
        strategy.alias("match_strategy"),
        confidence.alias("match_confidence"),
    )


def token_sort_ratio(a: str, b: str) -> int:
    """Pure-python token_sort_ratio (thefuzz semantics: ratio over the
    space-joined sorted token lists, person_matcher.py:216-241) on
    difflib — deterministic, stdlib-only."""
    ta = " ".join(sorted(a.split()))
    tb = " ".join(sorted(b.split()))
    return int(round(100 * difflib.SequenceMatcher(None, ta, tb).ratio()))


def fuzzy_resolve_blocked(
    src: DataFrame,
    registry: DataFrame,
    src_name: str = "qname",
    reg_name: str = "name",
    reg_id: str = "cid",
    threshold: int = 90,
    broadcast_registry: bool = True,
) -> DataFrame:
    """Stage-4 fuzzy resolution for rows the exact ladder left
    unresolved: block on the first normalized token (cheap equi-join —
    at 100 TB the block key bounds candidate fan-out), score each
    candidate pair with token_sort_ratio in an Arrow-batched pandas
    UDF, keep the best score >= threshold per source row (ties → lowest
    registry id).

    ``broadcast_registry=False`` (same opt-out as ``resolve_entities``)
    switches the candidate join to a shuffle on the block key for
    registries too large to broadcast — the blocking still bounds
    fan-out either way.

    Returns one row per resolved source ROW: src columns +
    canonical_id, match_strategy='fuzzy', match_confidence=score.  The
    best-candidate window partitions by a per-row id (not the name
    value), so two distinct source rows sharing the same dirty name
    each keep their own output row."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window

    block = lambda c: F.split(norm_name(c), " ")[0]  # noqa: E731

    @pandas_udf("int")
    def score(a, b):
        import pandas as pd

        return pd.Series(
            [
                token_sort_ratio(x, y) if x is not None and y is not None else 0
                for x, y in zip(a, b)
            ]
        )

    reg = registry.select(
        F.col(reg_id).alias("_cid"),
        F.col(reg_name).alias("_rname"),
        block(F.col(reg_name)).alias("_blk"),
    )
    # _rid is assigned BEFORE the candidate join and only disambiguates
    # rows within this one plan execution — it never leaves the query
    maybe_b = F.broadcast if broadcast_registry else (lambda df: df)
    cand = (
        src.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_blk", block(F.col(src_name)))
        .join(maybe_b(reg), "_blk")
    )
    scored = cand.withColumn(
        "_score", score(norm_name(F.col(src_name)), norm_name(F.col("_rname")))
    ).filter(F.col("_score") >= threshold)
    w = Window.partitionBy("_rid").orderBy(F.desc("_score"), F.asc("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *[c for c in src.columns],
            F.col("_cid").alias("canonical_id"),
            F.lit("fuzzy").alias("match_strategy"),
            F.col("_score").cast("long").alias("match_confidence"),
        )
    )
