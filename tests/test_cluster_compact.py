"""Clustered (sort-ordered) compaction: rewrite files hold disjoint,
key-sorted ranges per bucket, so the range pruner touches ~1 file per
point key — Iceberg's sort-ordered rewrite_data_files analogue.  State
must round-trip exactly, later merges must still converge, and the
option must compose with bloom sidecars and compact_buckets' hot-only
pass."""

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

from conftest import assert_disjoint_bucket_ranges

SCHEMA = StructType(
    [StructField("k", StringType(), False), StructField("v", LongType(), True)]
)


def _mk_table(tmp_table_dir, name, bloom=False, buckets=4):
    return LakeTable.create(
        os.path.join(tmp_table_dir, name),
        SCHEMA,
        key_col="k",
        bucket_count=buckets,
        props={BLOOM_PROP: "true"} if bloom else None,
    )


def _batch(spark, ids, lsn, op="upsert"):
    return spark.createDataFrame(
        [(f"k{i:06d}", i, op, lsn) for i in ids], "k string, v long, op string, lsn long"
    )


def _files(t):
    return [FileEntry.from_json(f) for f in t.snapshot()["files"]]


def _prune(t, batch):
    snap = t.snapshot()
    src = batch.withColumn(BUCKET_COL, bucket_expr("k", snap["bucket_count"]))
    return t._prune_for_batch(src, snap)


def _interleaved(spark, t):
    """Three merges whose key sets stripe the space; copy-on-write
    coalesces the overlaps, leaving ONE fat full-range file per bucket
    — the shape where a point merge rewrites the entire bucket."""
    for stripe in range(3):
        t.merge(_batch(spark, range(stripe, 600, 3), lsn=stripe + 1))


def _blocked(spark, t):
    """Three merges over ADJACENT key blocks: no range overlap, so each
    merge's files carry forward — 3 files per bucket accumulate."""
    for block in range(3):
        t.merge(_batch(spark, range(block * 200, (block + 1) * 200), lsn=block + 1))


def test_clustered_compact_disjoint_ranges_and_point_pruning(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    _interleaved(spark, t)
    before = sorted(t.read(spark).collect())

    # pre-compact: one full-range file per bucket → a point key
    # rewrites the WHOLE bucket
    probe = _batch(spark, [301], lsn=99)
    rewrite_pre, _ = _prune(t, probe)
    bucket_rows = sum(f.rows for f in _files(t) if f.bucket == rewrite_pre[0].bucket)
    assert sum(f.rows for f in rewrite_pre) == bucket_rows

    t.compact(spark, cluster_by_key=True, target_file_rows=60)
    assert sorted(t.read(spark).collect()) == before  # state round-trips

    files = _files(t)
    assert_disjoint_bucket_ranges(t, require_split=True)
    # rows inside each file are key-sorted (contiguous range layout)
    ks = pq.read_table(os.path.join(t.path, files[0].path), columns=["k"])[
        "k"
    ].to_pylist()
    assert ks == sorted(ks)

    # post-compact: the range test alone isolates ONE split — the
    # point merge now rewrites a file's worth of rows, not a bucket's
    rewrite_post, _ = _prune(t, probe)
    assert len(rewrite_post) == 1
    lo, hi = rewrite_post[0].min_key, rewrite_post[0].max_key
    assert lo <= "k000301" <= hi
    assert rewrite_post[0].rows < bucket_rows


def test_exact_key_refinement_skips_swept_middle_files(spark, tmp_table_dir):
    """A sparse batch with two far-apart keys in ONE bucket: the
    interval [min,max] sweeps every file between them, but the
    exact-key refinement carries the gap files — only the two files
    actually holding the keys rewrite.  This is the trickle steady
    state clustering exists for, exact WITHOUT bloom sidecars."""
    t = _mk_table(tmp_table_dir, "t")
    _interleaved(spark, t)
    t.compact(spark, cluster_by_key=True, target_file_rows=40)

    by_bucket = assert_disjoint_bucket_ranges(t)
    bucket, fs = max(by_bucket.items(), key=lambda kv: len(kv[1]))
    assert len(fs) >= 3  # first + gap file(s) + last
    probe = spark.createDataFrame(
        [(fs[0].min_key, 1, "update", 99), (fs[-1].max_key, 2, "update", 99)],
        "k string, v long, op string, lsn long",
    )
    rewrite, carry = _prune(t, probe)
    hit = [f for f in rewrite if f.bucket == bucket]
    assert {f.path for f in hit} == {fs[0].path, fs[-1].path}
    carried = {f.path for f in carry if f.bucket == bucket}
    assert carried == {f.path for f in fs[1:-1]}

    # the full merge converges to the same state an unrefined rewrite
    # would produce
    before = {r["k"]: r["v"] for r in t.read(spark).collect()}
    t.merge(probe)
    after = {r["k"]: r["v"] for r in t.read(spark).collect()}
    before[fs[0].min_key], before[fs[-1].max_key] = 1, 2
    assert after == before


def test_merge_after_clustered_compact_converges(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t")
    _interleaved(spark, t)
    t.compact(spark, cluster_by_key=True, target_file_rows=60)
    t.merge(
        spark.createDataFrame(
            [("k000301", 9999, "update", 50)], "k string, v long, op string, lsn long"
        )
    )
    t.merge(  # stale replay → ignored
        spark.createDataFrame(
            [("k000301", 1, "update", 40)], "k string, v long, op string, lsn long"
        )
    )
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(rows) == 600
    assert rows["k000301"] == 9999


def test_clustered_compact_builds_bloom_sidecars(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t", bloom=True)
    _interleaved(spark, t)
    t.compact(spark, cluster_by_key=True, target_file_rows=60)
    files = _files(t)
    assert files and all(f.bloom for f in files)


def test_clustered_compact_buckets_touches_only_hot(spark, tmp_table_dir):
    t = _mk_table(tmp_table_dir, "t", buckets=4)
    _blocked(spark, t)  # adjacent-range merges carry → 3 files per bucket
    before = sorted(t.read(spark).collect())
    stats = t.compact_buckets(
        spark, max_files_per_bucket=2, cluster_by_key=True, target_file_rows=60
    )
    assert stats["compacted_buckets"] == 4 and stats["carried_files"] == 0
    assert sorted(t.read(spark).collect()) == before
    assert_disjoint_bucket_ranges(t)

    # a cold table (nothing over the threshold) is untouched
    stats2 = t.compact_buckets(
        spark, max_files_per_bucket=8, cluster_by_key=True, target_file_rows=60
    )
    assert stats2["compacted_buckets"] == 0


def test_refinement_carries_single_swept_file_on_gap_insert(spark, tmp_table_dir):
    """A sparse INSERT batch whose keys straddle a lone file's range
    (but all lie outside it): the interval test sweeps the file in,
    and the refinement must carry it — single-file buckets stay
    eligible, this wasted full-file rewrite is exactly the case the
    range-only pruner cannot see."""
    t = LakeTable.create(
        os.path.join(tmp_table_dir, "t"), SCHEMA, key_col="k", bucket_count=1
    )
    t.merge(_batch(spark, range(200, 400), lsn=1))  # one file [k000200,k000399]
    probe = _batch(spark, [100, 500], lsn=2)  # new keys bracketing the range
    rewrite, carry = _prune(t, probe)
    assert rewrite == [] and len(carry) == 1
    st = t.merge(probe)
    assert st["rewritten_files"] == 0 and st["inserted"] == 2
    rows = {r["k"] for r in t.read(spark).collect()}
    assert len(rows) == 202 and {"k000100", "k000500"} <= rows


def test_cluster_advisory_fires_and_clears(spark, tmp_table_dir):
    """The merge-time clustering advisory: a sparse batch churning a
    fat full-range file (mean rewritten rows/file > 2x target, rewrite
    >> batch) stamps cluster_recommended on the summary; after a
    clustered compact the same trickle rewrites ~target-sized files and
    the advisory stops firing (amplification alone must NOT retrigger
    it — copy-on-write point merges never reach amp 1)."""
    t = LakeTable.create(
        os.path.join(tmp_table_dir, "t"),
        SCHEMA,
        key_col="k",
        bucket_count=4,
        props={"target_file_rows": 50},
    )
    t.merge(_batch(spark, range(600), lsn=1))  # bulk: nothing rewritten
    assert "cluster_recommended" not in t.snapshot()["summary"]
    t.merge(_batch(spark, [301], lsn=2))  # 1-key trickle vs 150-row file
    assert t.snapshot()["summary"].get("cluster_recommended") is True
    t.compact(spark, cluster_by_key=True)  # target from the table prop
    t.merge(_batch(spark, [302], lsn=3))  # now rewrites one ~50-row file
    assert "cluster_recommended" not in t.snapshot()["summary"]


def test_prune_soundness_randomized(spark, tmp_table_dir):
    """No false carries, ever: across clustered / bloomed / fragmented
    layouts and random sparse batches (present keys, gap inserts,
    out-of-range keys), every file that ACTUALLY holds a batch key must
    be in the rewrite set — the ground truth is read straight from the
    parquet files.  This is the safety property the bloom probe, the
    interval test, and the exact-key refinement must jointly preserve;
    a false carry is silent data corruption (stale row survives a
    merge it should have joined)."""
    import random

    rnd = random.Random(7)
    for name, bloom in (("plain", False), ("bloomed", True)):
        t = _mk_table(tmp_table_dir, name, bloom=bloom, buckets=3)
        t.merge(_batch(spark, range(0, 600, 2), lsn=1))  # evens only
        t.compact(spark, cluster_by_key=True, target_file_rows=rnd.choice([20, 55]))
        # fragment: a few extra merges so buckets mix clustered + fresh files
        t.merge(_batch(spark, rnd.sample(range(0, 600, 2), 40), lsn=2))
        t.merge(_batch(spark, rnd.sample(range(0, 600, 2), 10), lsn=3))

        for probe_trial in range(6):
            ids = rnd.sample(range(0, 640), rnd.randint(1, 12))  # odds = absent
            batch = _batch(spark, ids, lsn=10 + probe_trial)
            rewrite, carry = _prune(t, batch)
            keys = {f"k{i:06d}" for i in ids}
            rewrite_paths = {f.path for f in rewrite}
            for f in rewrite + carry:
                file_keys = set(
                    pq.read_table(os.path.join(t.path, f.path), columns=["k"])[
                        "k"
                    ].to_pylist()
                )
                if file_keys & keys:
                    assert f.path in rewrite_paths, (
                        f"{name}: false carry of {f.path} holding "
                        f"{sorted(file_keys & keys)[:3]}"
                    )


def test_cluster_by_key_requires_keyed_table(spark, tmp_table_dir):
    t = LakeTable.create(os.path.join(tmp_table_dir, "unkeyed"), SCHEMA)
    t.append(spark.createDataFrame([("a", 1)], SCHEMA))
    with pytest.raises(ValueError, match="keyed"):
        t.compact(spark, cluster_by_key=True)
    with pytest.raises(ValueError, match="positive"):
        _mk_table(tmp_table_dir, "t").compact(
            spark, cluster_by_key=True, target_file_rows=0
        )
