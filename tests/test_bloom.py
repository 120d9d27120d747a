"""Per-file key-Bloom pruning: build/probe round trip, no false
negatives (the correctness-critical property — a false negative would
carry a file whose key the merge rewrites elsewhere, duplicating the
row), point-key pruning wins over the range test, and graceful
degradation when a sidecar is missing."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from horizon_etl_spark.tables.lake import (
    BLOOM_PROP,
    BUCKET_COL,
    FileEntry,
    LakeTable,
    bucket_expr,
)

SCHEMA = StructType(
    [StructField("k", StringType(), False), StructField("v", LongType(), True)]
)


def _mk_table(tmp_table_dir, name, bloom=True, buckets=4):
    return LakeTable.create(
        os.path.join(tmp_table_dir, name),
        SCHEMA,
        key_col="k",
        bucket_count=buckets,
        props={BLOOM_PROP: "true"} if bloom else None,
    )


def _batch(spark, lo, hi, lsn, op="upsert"):
    return spark.range(lo, hi).select(
        F.format_string("k%06d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
        F.lit(op).alias("op"),
        F.lit(lsn).cast("long").alias("lsn"),
    )


def _files(t):
    return [FileEntry.from_json(f) for f in t.snapshot()["files"]]


def _keys_in_file(t, entry):
    return set(
        pq.read_table(os.path.join(t.path, entry.path), columns=["k"])["k"].to_pylist()
    )


def _prune(t, batch):
    snap = t.snapshot()
    src = batch.withColumn(BUCKET_COL, bucket_expr("k", snap["bucket_count"]))
    return t._prune_for_batch(src, snap)


def test_bulk_writes_build_bloom_sidecars(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 500, 1))
    files = _files(t)
    assert files and all(f.bloom for f in files)
    from horizon_etl_spark.tables.lake import _usable_bloom_words

    for f in files:
        words = _usable_bloom_words(t.path, f.bloom)
        assert words is not None and len(words) * 64 == f.bloom["m"]
        # sized ~BITS_PER_KEY per row, rounded to whole words
        assert f.bloom["m"] >= f.rows and f.bloom["m"] % 64 == 0


def test_no_false_negatives_every_contained_key_hits(spark, tmp_table_dir):
    """The load-bearing property: for EVERY key present in a bloomed
    file, a batch containing that key must select the file for rewrite
    (range + bloom intersection can never drop a true match)."""
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 400, 1))
    t.merge(_batch(spark, 400, 800, 2))
    truth = {f.path: _keys_in_file(t, f) for f in _files(t)}
    # one batch containing ALL keys: every file must be rewritten
    rw, carry = _prune(t, _batch(spark, 0, 800, 3))
    assert carry == [] and {f.path for f in rw} == set(truth)
    # spot batches of single point keys across the range
    for kid in (0, 399, 400, 799, 123, 677):
        b = _batch(spark, kid, kid + 1, 3)
        rw, _ = _prune(t, b)
        key = f"k{kid:06d}"
        holders = {p for p, ks in truth.items() if key in ks}
        assert holders <= {f.path for f in rw}, f"bloom false negative for {key}"


def test_point_key_trickle_prunes_more_than_range(spark, tmp_table_dir):
    """Two commits with INTERLEAVED key ranges per bucket: the range
    test alone must rewrite both commits' files in a touched bucket,
    the bloom probe rewrites only the file(s) actually holding the
    key."""
    bloom_t = _mk_table(tmp_table_dir, "b", bloom=True)
    plain_t = _mk_table(tmp_table_dir, "p", bloom=False)
    trickle = _batch(spark, 0, 1000, 2).filter(F.col("v").isin(101, 103, 105, 107, 109))
    for t in (bloom_t, plain_t):
        # bulk load of the even keys, then a 5-key odd trickle: the odd
        # keys INTERLEAVE with every file's [min,max] range, so range
        # pruning must rewrite the touched buckets' files while the
        # bloom probes prove the keys absent and carry everything
        t.merge(_batch(spark, 0, 1000, 1).filter(F.col("v") % 2 == 0))
        t.merge(trickle)
    assert plain_t.snapshot()["summary"]["rewritten_files"] > 0
    assert bloom_t.snapshot()["summary"]["rewritten_files"] == 0
    assert len(_files(bloom_t)) > len(_files(plain_t))
    # a single point update touches only the one file holding the key
    point = _batch(spark, 100, 101, 3)  # an even key
    rw_bloom, carry_bloom = _prune(bloom_t, point)
    assert len(rw_bloom) == 1
    assert "k000100" in _keys_in_file(bloom_t, rw_bloom[0])
    assert len(carry_bloom) == len(_files(bloom_t)) - 1


def test_merge_converges_with_blooms_enabled(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 300, 1))
    t.merge(_batch(spark, 100, 120, 5))  # point updates
    t.merge(_batch(spark, 110, 115, 3))  # stale replay, must no-op
    t.merge(_batch(spark, 150, 152, 6, op="delete"))
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(rows) == 298
    assert rows["k000100"] == 100 and "k000150" not in rows
    # trickle merges against the bloomed base stayed narrow
    assert t.snapshot()["summary"]["rewritten_files"] <= 2


def test_missing_sidecar_degrades_to_range_pruning(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 300, 1))
    for f in _files(t):
        os.remove(os.path.join(t.path, f.bloom["ref"]))
    # probes silently fall back to the range test — still correct
    rw, carry = _prune(t, _batch(spark, 10, 11, 2))
    assert len(rw) == 1  # the key's bucket file, via range overlap
    t.merge(_batch(spark, 10, 11, 2))
    assert {r["k"]: r["v"] for r in t.read(spark).collect()}["k000010"] == 10


def test_overwrite_and_compact_build_blooms_and_attr_path(spark, tmp_table_dir):
    t = LakeTable.create(
        os.path.join(tmp_table_dir, "a"),
        SCHEMA,
        key_col="k",
        bucket_count=4,
        props={BLOOM_PROP: "true"},
        attr_lww=True,
    )
    ev = _batch(spark, 0, 200, 1).select(
        "k", "v", F.lit(1).cast("long").alias("_alsn_v"), F.lit(None).cast("long").alias("_del_lsn")
    )
    t.merge_attrs(ev)
    assert all(f.bloom for f in _files(t))
    # point attr update prunes by bloom too
    up = _batch(spark, 50, 51, 2).select(
        "k", "v", F.lit(2).cast("long").alias("_alsn_v"), F.lit(None).cast("long").alias("_del_lsn")
    )
    rw, _ = _prune(t, up)
    assert len(rw) == 1


def test_vacuum_sweeps_orphaned_bloom_sidecars(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 200, 1))
    t.merge(_batch(spark, 0, 200, 2))  # rewrites; v1 sidecars now orphaned
    blooms_dir = os.path.join(t.path, "_meta", "blooms")
    before = len(os.listdir(blooms_dir))
    res = t.vacuum(keep_versions=1, min_age_seconds=0)
    assert res["removed_blooms"] > 0
    live = {f.bloom["ref"] for f in _files(t)}
    remaining = {
        os.path.join("_meta", "blooms", fn) for fn in os.listdir(blooms_dir)
    }
    assert remaining == live and len(remaining) < before
    # retained sidecars still load and prune after the sweep
    rw, _ = _prune(t, _batch(spark, 10, 11, 3))
    assert len(rw) == 1


def test_probe_budget_cap_prefers_largest_files(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 800, 1))   # big files
    t.merge(_batch(spark, 800, 850, 2))  # small files, interleave-free
    # shrink the probe budget so only the big files' blooms fit
    big = sorted((f.bloom["m"] for f in _files(t)), reverse=True)
    keep_bytes = sum(big[:4]) / 8
    t.set_props({"key_bloom_max_probe_mb": keep_bytes / 1e6})
    # a batch of keys present only in the big files: the big files are
    # bloom-pruned precisely, the small (range-carried) files untouched
    rw, carry = _prune(t, _batch(spark, 5, 6, 3))
    assert len(rw) == 1
    truth = _keys_in_file(t, rw[0])
    assert "k000005" in truth
    # and correctness is unaffected with the cap at zero (range-only)
    t.set_props({"key_bloom_max_probe_mb": 0})
    rw0, _ = _prune(t, _batch(spark, 5, 6, 3))
    assert {f.path for f in rw} <= {f.path for f in rw0}


def test_read_keys_point_lookup_scans_only_holding_files(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t", buckets=4)
    t.merge(_batch(spark, 0, 400, 1))
    t.merge(_batch(spark, 400, 800, 2))
    t.merge(_batch(spark, 150, 151, 9, op="delete"))
    # values equal the filtered full read
    got = {r["k"]: r["v"] for r in t.read_keys(spark, ["k000010", "k000700", "k000150", "k999999"]).collect()}
    assert got == {"k000010": 10, "k000700": 700}  # deleted + absent keys drop
    # pruning: the lookup scans only files that can hold the keys
    snap = t.snapshot()
    pruned = t._files_for_keys(spark, ["k000010"], snap)
    holders = [f for f in _files(t) if "k000010" in _keys_in_file(t, f)]
    assert {f.path for f in holders} <= {f.path for f in pruned}
    assert len(pruned) <= 2  # bloom keeps it near the single holding file
    # absent-but-in-range key ("k0001505" sorts between k000150 and
    # k000151): range pruning alone would scan its bucket's files, the
    # bloom proves absence driver-side (fixed key, deterministic — a
    # false positive would keep ≤1 file, never produce a wrong row)
    assert len(t._files_for_keys(spark, ["k0001505"], snap)) == 0
    # out-of-range key and empty lookup cost nothing
    assert t._files_for_keys(spark, ["k999999"], snap) == []
    assert t.read_keys(spark, []).count() == 0


def test_schema_evolution_on_bloomed_table(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 200, 1))
    evolved = _batch(spark, 100, 300, 2).withColumn("extra", F.col("v") * 2)
    t.merge(evolved)  # additive evolution on a bloomed table
    files = _files(t)
    assert all(f.bloom for f in files)
    rows = {r["k"]: r for r in t.read(spark).collect()}
    assert len(rows) == 300
    assert rows["k000150"]["extra"] == 300 and rows["k000050"]["extra"] is None
    # point lookup still prunes and returns the evolved column
    got = t.read_keys(spark, ["k000250"]).collect()
    assert len(got) == 1 and got[0]["extra"] == 500


def test_read_keys_native_long_key_dtype(spark, tmp_table_dir):
    t = LakeTable.create(
        os.path.join(tmp_table_dir, "lk"),
        StructType([StructField("id", LongType(), False), StructField("v", LongType(), True)]),
        key_col="id",
        bucket_count=4,
        props={BLOOM_PROP: "true"},
    )
    t.merge(
        spark.range(0, 300).select(
            F.col("id"), (F.col("id") * 10).alias("v"),
            F.lit("upsert").alias("op"), F.lit(1).cast("long").alias("lsn"),
        )
    )
    got = {r["id"]: r["v"] for r in t.read_keys(spark, [7, 250, 999]).collect()}
    assert got == {7: 70, 250: 2500}


def test_merge_rewrites_stray_unbucketed_file(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 50, 1))
    # stray append lands keyed rows in an unbucketed (bucket=-1) file
    stray = spark.createDataFrame(
        [("k900000", 1, 1, False)], "k string, v long, _lsn long, _tombstone boolean"
    )
    t.append(stray)
    assert any(f.bucket == -1 for f in _files(t))
    # an update for the stray key must rewrite that file, not duplicate
    t.merge(_batch(spark, 900000, 900001, 5))
    rows = [r for r in t.read(spark).collect() if r["k"] == "k900000"]
    assert len(rows) == 1 and rows[0]["v"] == 900000
    assert not any(f.bucket == -1 for f in _files(t))
    # and read_keys sees exactly the merged row
    got = t.read_keys(spark, ["k900000"]).collect()
    assert len(got) == 1 and got[0]["v"] == 900000


def test_probe_plan_broadcasts_and_avoids_cartesian(spark, tmp_table_dir):
    """The merge-time probe must join batch keys to the sidecar scan
    with a broadcast hash join (bloom meta is small by construction —
    the byte cap bounds it) and never a cartesian/nested-loop shape."""
    t = _mk_table(tmp_table_dir, "t")
    t.merge(_batch(spark, 0, 400, 1))
    captured = []
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    orig = ClassicDF.collect

    def spy(self):
        captured.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self)

    ClassicDF.collect = spy
    try:
        _prune(t, _batch(spark, 10, 12, 2))
    finally:
        ClassicDF.collect = orig
    plan = captured[-1]
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bloom_build_collects_descriptors_not_words(spark, tmp_table_dir):
    """The build job must never ship filter words to the driver: the
    sidecars are written executor-side inside the applyInPandas kernel
    and the driver collects only {_file, ref, m, k} descriptor rows
    (O(100 B)/file instead of O(1 MiB)/file on a big bootstrap)."""
    from horizon_etl_spark.tables.lake import _BLOOM_BUILD_RESULT_SCHEMA

    assert "words" not in _BLOOM_BUILD_RESULT_SCHEMA
    collected_cols = []
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    orig = ClassicDF.collect

    def spy(self):
        collected_cols.append(list(self.columns))
        return orig(self)

    ClassicDF.collect = spy
    try:
        t = _mk_table(tmp_table_dir, "t")
        t.merge(_batch(spark, 0, 300, 1))
    finally:
        ClassicDF.collect = orig
    build_rows = [c for c in collected_cols if "ref" in c and "_file" in c]
    assert build_rows, "bloom build job did not run"
    assert all("words" not in c for c in collected_cols)
    # and the executor-written sidecars are real + probeable
    from horizon_etl_spark.tables.lake import _usable_bloom_words

    files = _files(t)
    assert files and all(f.bloom for f in files)
    for f in files:
        assert os.path.exists(os.path.join(t.path, f.bloom["ref"]))
        assert _usable_bloom_words(t.path, f.bloom) is not None


def test_read_keys_bulk_fallback_broadcast_semi_join(spark, tmp_table_dir):
    """Beyond READ_KEYS_ISIN_MAX keys the point-lookup degrades
    gracefully: broadcast semi-join instead of a giant isin() literal,
    range-only pruning instead of the per-key driver bloom loop."""
    t = _mk_table(tmp_table_dir, "t", buckets=4)
    t.merge(_batch(spark, 0, 2000, 1))
    keys = [f"k{i:06d}" for i in range(50_000)]  # 2k present, 48k absent
    df = t.read_keys(spark, keys)
    assert df.count() == 2000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # small lists keep the literal-pushdown point plan
    small = t.read_keys(spark, ["k000010"])
    assert small.count() == 1
    assert "LeftSemi" not in small._jdf.queryExecution().executedPlan().toString()


def test_read_keys_unkeyed_table_raises(spark, tmp_table_dir):
    t = LakeTable.create(
        os.path.join(tmp_table_dir, "nk"), SCHEMA, key_col=None, bucket_count=1
    )
    with pytest.raises(ValueError, match="keyed table"):
        t.read_keys(spark, ["k000001"])
