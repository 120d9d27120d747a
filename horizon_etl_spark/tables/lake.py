"""LakeTable — a minimal ACID snapshot table format over parquet.

The sandbox ships no Iceberg/Delta runtime jars, so the Iceberg
capabilities the engine needs are implemented here from scratch,
Spark-first (no per-row Python anywhere in the data path):

  * atomic snapshot commits  — a snapshot is a JSON manifest listing
    immutable parquet data files; committing is a single hard-link
    (create-exclusive) of ``v{N}.json``, so readers see either the old
    or the new version, never a torn state.  Reference analogue: the
    atomic temp-file+fsync+rename writer
    (/root/reference/src/core/logic/atomic_io.py:16-41) and SQLite
    transactionality.
  * hash-bucket partitioning — data files are laid out by
    ``pmod(xxhash64(key), bucket_count)``; MERGE only rewrites buckets
    (and, via per-file min/max key stats, only files) touched by the
    incoming batch: copy-on-write, Iceberg-style.  Reference analogue:
    the hot-predicate indexes
    (/root/reference/src/scripts/harden_db_indices.py:8-19).
  * keyed MERGE (upsert/delete) with an ``_lsn`` monotonicity guard and
    delete tombstones, so re-applying any batch — or applying batches
    in any order — converges to the same final state (exactly-once /
    idempotent apply; reference analogue: unique-constraint dedup +
    IntegrityError swallow, /root/reference/src/tracking/recorder.py:165-178,
    and in-place upsert handlers,
    /root/reference/src/core/logic/initiative_handlers.py:54-106).
  * additive schema evolution — the snapshot carries the table schema;
    old files simply lack new columns and are read as null via an
    explicit-schema parquet scan (no footer merging job, no rewrite).
    Reference analogue: guarded ``ALTER TABLE ... ADD COLUMN``
    migrations (/root/reference/src/db/migrations.py:19-58).
  * time travel — any retained snapshot version is readable (used by
    the replay-equality audit).

Scale notes (100 TB / 1000 executors): ``bucket_count`` bounds merge
write amplification — at production scale use 2^12..2^14 buckets so a
batch touching k keys rewrites only the overlapping files, found via
per-file [min_key, max_key] pruning (keys are zero-padded, so string
order == numeric order).  All joins/reductions shuffle once on the
bucket/key column; the manifest is O(files) JSON handled driver-side,
exactly like Iceberg's metadata layer.
"""

from __future__ import annotations

import bisect
import json
import os
import shutil
import uuid
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    MapType,
    StructField,
    StructType,
)

# Internal meta columns present in every data file of a merge-managed table.
LSN_COL = "_lsn"
TOMBSTONE_COL = "_tombstone"
BUCKET_COL = "_bucket"
# clustered-compaction file sizing: ~4M rows/file ≈ 128-512 MB parquet
# at typical tokenized-sequence row widths (the cloud-object sweet spot)
DEFAULT_TARGET_FILE_ROWS = 4_000_000
# Per-attribute LWW tables additionally carry one assertion-lsn column
# per payload column plus the row's delete watermark.
DEL_LSN_COL = "_del_lsn"
ALSN_PREFIX = "_alsn_"


def alsn_col(c: str) -> str:
    return f"{ALSN_PREFIX}{c}"


@dataclass
class FileEntry:
    path: str  # relative to table root
    bucket: int
    rows: int
    min_key: str | None
    max_key: str | None
    # Optional key-bloom sidecar: {"ref": <path relative to table root>,
    # "m": <bits>, "k": <hash count>} — see the key-bloom block below.
    bloom: dict[str, Any] | None = None

    def to_json(self) -> dict[str, Any]:
        d = {
            "path": self.path,
            "bucket": self.bucket,
            "rows": self.rows,
            "min_key": self.min_key,
            "max_key": self.max_key,
        }
        if self.bloom:
            d["bloom"] = self.bloom
        return d

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "FileEntry":
        return cls(
            d["path"],
            d["bucket"],
            d["rows"],
            d.get("min_key"),
            d.get("max_key"),
            d.get("bloom"),
        )


def bucket_expr(key_col: str, bucket_count: int):
    """Deterministic hash bucket of the key (JVM-side, codegen'd)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(bucket_count)).cast("int")


# Default sizing target: a bucket is one merge-write task and one unit
# of copy-on-write amplification.  ~4M rows/bucket keeps a bucket's
# file set in one executor's working memory at ~100-byte rows while
# bounding the file count; ops can override per table via the
# 'target_rows_per_bucket' prop.
DEFAULT_TARGET_ROWS_PER_BUCKET = 4_000_000


def recommended_bucket_count(
    total_rows: int, target_rows_per_bucket: int = DEFAULT_TARGET_ROWS_PER_BUCKET
) -> int:
    """Power-of-two bucket count keeping rows/bucket under target,
    clamped to [4, 2^14] (the lake.py scale prescription: 2^12-2^14 at
    production scale)."""
    import math

    need = max(1, -(-max(0, total_rows) // target_rows_per_bucket))
    return min(16384, max(4, 1 << math.ceil(math.log2(need))))


# --------------------------------------------------------------- key blooms
# Per-file key Bloom filters extend carry/rewrite pruning beyond the
# min/max range test: a CDC trickle of POINT keys spread across the key
# range defeats range pruning (every file's range overlaps the batch's
# range), but a Bloom membership probe still proves most files key-free
# and carries them.  Design mirrors Iceberg's puffin sidecars: the
# filter is built once at bulk-write time (compact / rebucket /
# bootstrap-overwrite, opt-in per table via the ``key_bloom`` prop),
# stored as a sidecar under _meta/blooms/, and probed at merge time
# inside the SAME one-pass per-bucket aggregate the range pruner
# already runs — zero extra Spark actions on the hot path.
#
# Hash scheme: classic double hashing pos_i = (h1 + i*h2) mod m with
# h1/h2 both computed BY SPARK (xxhash64) on the build and probe sides,
# so Python never re-implements the hash.  Both sides reduce h1/h2 mod
# m BEFORE the multiply-add (mathematically identical, and the partial
# sums then fit in int64 — Spark 4's ANSI mode would throw on a raw
# h1 + i*h2 long overflow); numpy's % with a positive divisor matches
# Spark's pmod, verified by the round-trip property test.
# 16 bits/key + 8 probes → per-probe FPR ~5.6e-4.  The parameter that
# matters operationally is P(file falsely rewritten) ≈ 1-(1-FPR)^p for
# p batch keys landing in the file's bucket — at p≈80 that's ~4% here
# vs ~21% at the textbook 12 bits/6 probes, a 5× cut in copy-on-write
# write amplification for 33% bigger sidecars.
BLOOM_BITS_PER_KEY = 16
BLOOM_K = 8
BLOOM_MAX_BITS = 1 << 23  # 1 MiB cap per file (FPR degrades, stays safe)
BLOOM_PROP = "key_bloom"
# read_keys is a POINT-lookup API; beyond this many keys the isin()
# literal list (and the per-key driver bloom loop) stops being the
# right plan, so the read degrades to a broadcast semi-join with
# bucket+range-only pruning instead of failing or crawling
READ_KEYS_ISIN_MAX = 10_000
# Exact-key prune refinement (trickle merges): when the per-bucket
# interval test keeps >1 un-probed file in a bucket whose batch holds
# at most this many distinct keys, collect those keys (one extra SMALL
# Spark action) and carry every file whose [min,max] contains none —
# on a key-clustered table this isolates ~1 file per point key with
# no bloom sidecars (and no load tax).  Dense/bulk batches blow the
# gate (their HLL count is large) and skip the second action entirely.
PRUNE_REFINE_BUCKET_KEYS = 4_096
PRUNE_REFINE_TOTAL_KEYS = 65_536
# ...and the refinement must PAY: the second action re-executes the
# batch lineage (the src frame is typically an unstaged
# validate/dedup pipeline, not a cached scan), so a bucket only
# qualifies when the rows it might avoid rewriting dwarf the batch
# keys it holds — steady-state replay batches sit at amp ≈ 1 and must
# never pay the extra pass (measured: an ungated refinement cost the
# sf0.1 CDC bench ~40% of its apply throughput for zero carried files).
PRUNE_REFINE_MIN_AMP = 8
# Clustering advisory (merge-time, consumed by job_maintain
# --cluster-by-key auto): fires when a merge's copy-on-write rewrite
# was dominated by FAT files churned for a sparse batch — mean rows
# per rewritten file over 2× target_file_rows AND rewritten rows over
# this multiple of the batch.  A freshly clustered table stops firing
# because its rewritten files are ~target_file_rows-sized even though
# point-merge amplification never reaches 1 under copy-on-write.
CLUSTER_ADVICE_MIN_AMP = 8


def _bloom_hash_exprs(key_col: str) -> tuple[Column, Column]:
    """(h1, h2) bigint hash columns for the double-hashing scheme —
    identical expressions on the build and probe paths.

    BOTH hashes are salted: plain ``xxhash64(key)`` is the bucket
    assignment hash (bucket_expr), so within one bucket every key — and
    every probing batch key — shares ``h1 ≡ bucket (mod bucket_count)``;
    with m a multiple of the bucket count that packs the i=0 probe bits
    of a file's keys into an m/bucket_count subspace whose fill is ~16×
    the nominal rate, inflating the measured FPR ~20× over theory.
    Salting decorrelates the bloom positions from the bucket layout."""
    return (
        F.xxhash64(F.lit("bloom#1"), F.col(key_col)),
        F.xxhash64(F.lit("bloom#2"), F.col(key_col)),
    )


# Result schema of the bloom BUILD job: descriptors only — the filter
# words are written to their sidecar files EXECUTOR-SIDE inside the
# kernel and never ride back to the driver (tests assert no "words"
# column here; the pre-round-5 design collected every file's words —
# O(new files × 1 MiB) driver memory on a huge bootstrap/compact).
_BLOOM_BUILD_RESULT_SCHEMA = "_file string, ref string, m long, k int"


def _make_bloom_build_pdf(table_path: str, version: int):
    """Grouped-map kernel factory: one file's (h1, h2) rows -> one
    bloom SIDECAR written in the worker + one descriptor row back.

    Arrow-batched; numpy bit ops only (no per-row Python).  The sidecar
    write is atomic (tmp + os.replace) and its name is a deterministic
    digest of the data file's bucket-dir/basename, so a speculated or
    retried task rewrites the identical path with identical bytes —
    idempotent.  ``table_path`` must be reachable from the executors
    (on a cluster: a DFS/object-store mount), the same contract the
    data-file writes already have."""

    def _bloom_build_pdf(pdf):
        import hashlib
        import os as _os
        import uuid as _uuid

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = len(pdf)
        m = min(BLOOM_MAX_BITS, max(256, ((n * BLOOM_BITS_PER_KEY + 63) // 64) * 64))
        words = np.zeros(m // 64, dtype=np.uint64)
        # reduce mod m first: partial sums stay < BLOOM_K*m ≤ 2^26, no
        # overflow; numpy % with a positive divisor = Spark pmod
        h1 = pdf["_h1"].to_numpy(dtype=np.int64) % np.int64(m)
        h2 = pdf["_h2"].to_numpy(dtype=np.int64) % np.int64(m)
        for i in range(BLOOM_K):
            pos = (h1 + np.int64(i) * h2) % np.int64(m)
            np.bitwise_or.at(
                words,
                pos >> 6,
                np.left_shift(np.uint64(1), (pos & 63).astype(np.uint64)),
            )
        fname = pdf["_file"].iloc[0]
        # bucket-dir/basename identifies the data file within this
        # commit (a dynamic partition write reuses the same part-file
        # basename in every bucket directory, so the basename alone is
        # ambiguous); digesting it gives a stable, collision-free
        # sidecar name per (version, data file)
        rel_id = "/".join(fname.rstrip("/").split("/")[-2:])
        digest = hashlib.sha1(rel_id.encode()).hexdigest()[:16]
        ref = _os.path.join(
            "_meta", "blooms", f"v{version:08d}-{digest}.bloom.parquet"
        )
        final = _os.path.join(table_path, ref)
        _os.makedirs(_os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp.{_uuid.uuid4().hex[:8]}"
        pq.write_table(
            pa.table(
                {
                    "m": pa.array([int(m)], pa.int64()),
                    "k": pa.array([BLOOM_K], pa.int32()),
                    "words": pa.array(
                        [words.view(np.int64)], pa.list_(pa.int64())
                    ),
                }
            ),
            tmp,
        )
        _os.replace(tmp, final)
        return pd.DataFrame(
            {"_file": [fname], "ref": [ref], "m": [m], "k": [BLOOM_K]}
        )

    return _bloom_build_pdf


# Sidecars are one-row parquet files (m, k, words) — the merge-time
# probe scans them JVM-side (no Python word serialization on the hot
# path); only the driver-side point-lookup path decodes them here.
# Immutable once written, so cache per absolute path — bounded LRU
# (sidecars from expired snapshots would otherwise accumulate for the
# driver process's lifetime).
_BLOOM_CACHE: "OrderedDict[str, list[int]]" = OrderedDict()
_BLOOM_CACHE_STATE = {"bytes": 0, "max_bytes": 256 * 1024 * 1024}


def _bloom_cache_evict(abs_path: str) -> None:
    ws = _BLOOM_CACHE.pop(abs_path, None)
    if ws is not None:
        _BLOOM_CACHE_STATE["bytes"] -= len(ws) * 8


def _usable_bloom_words(table_path: str, bloom: dict[str, Any]) -> "np.ndarray | None":
    """Decode + validate one sidecar for driver-side probing; None for
    any missing / corrupt / parameter-mismatched sidecar (the caller
    degrades to range-only pruning).  The usability invariant (k
    matches this engine's probe count, word length matches m, m matches
    the manifest) lives here and in the merge path's JVM-side filter —
    the only two consumers."""
    if not bloom or int(bloom.get("k", -1)) != BLOOM_K:
        return None
    import numpy as np

    abs_path = os.path.join(table_path, bloom["ref"])
    cached = _BLOOM_CACHE.get(abs_path)
    if cached is not None:
        # re-validate against THIS manifest entry: a cache hit must not
        # skip the m check (a mismatched manifest would otherwise probe
        # out-of-range positions instead of degrading)
        if len(cached) * 64 != int(bloom["m"]):
            return None
        _BLOOM_CACHE.move_to_end(abs_path)
        return cached
    try:
        import pyarrow.parquet as pq

        t = pq.read_table(abs_path)
        m, k = t["m"][0].as_py(), t["k"][0].as_py()
        # numpy array, not a list of boxed ints: the LRU's 8-bytes/word
        # accounting is then true (a list[int] costs ~5× its nominal
        # size and would blow past the 256 MB bound unnoticed)
        words = np.asarray(t["words"][0].as_py(), dtype=np.int64)
    except Exception:
        return None
    if k != BLOOM_K or len(words) * 64 != m or m != int(bloom["m"]):
        return None
    _BLOOM_CACHE[abs_path] = words
    _BLOOM_CACHE_STATE["bytes"] += len(words) * 8
    while _BLOOM_CACHE_STATE["bytes"] > _BLOOM_CACHE_STATE["max_bytes"] and _BLOOM_CACHE:
        _evicted, ws = _BLOOM_CACHE.popitem(last=False)
        _BLOOM_CACHE_STATE["bytes"] -= len(ws) * 8
    return words


def _footer_stats(path: str, key: str | None) -> tuple[int, str | None, str | None]:
    """(row_count, min_key, max_key) for one written parquet file, read
    from its footer metadata only — O(KB) driver-side, no data decode.
    Row count is exact; key min/max aggregate the row-group statistics
    and degrade to (None, None) — 'never prunable' — if the writer
    omitted or produced non-string stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    rows = int(md.num_rows)
    if key is None:
        return rows, None, None
    idx = None
    for i in range(len(md.schema)):
        if md.schema.column(i).name == key:
            idx = i
            break
    if idx is None:
        return rows, None, None
    mn = mx = None
    try:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return rows, None, None
            lo, hi = st.min, st.max
            if not isinstance(lo, str) or not isinstance(hi, str):
                return rows, None, None
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
    except Exception:
        return rows, None, None
    return rows, mn, mx


# Snapshot row-stats scheme versions.  1 (pre-footer-stats):
# FileEntry.rows was the BUCKET-level count per commit, repeated on each
# file of that bucket+commit.  2: rows is the exact per-file parquet
# footer count.  Commits stamp the CURRENT version.  A manifest MISSING
# the stamp defaults to scheme 2: the stamping writer postdates the
# footer-stats writer, so every live unstamped manifest carries exact
# per-file counts — reading those with the scheme-1 dedup would keep
# one file per (commit, bucket) and UNDER-count, silencing rebucket
# advisories on overloaded tables.  Scheme-1 dedup still applies to
# manifests that explicitly declare stats_version: 1 (a hand-migrated
# pre-footer-stats snapshot); its failure mode (an advisory firing
# early → one harmless atomic rebucket) is the safer direction anyway.
STATS_FILE_ROWS = 2


def _distinct_bucket_rows(
    files: list["FileEntry"], stats_version: int = STATS_FILE_ROWS
) -> int:
    """Approximate table rows from file entries, honouring the
    manifest's declared stats scheme (see STATS_FILE_ROWS)."""
    if stats_version >= STATS_FILE_ROWS:
        return sum(f.rows for f in files if f.rows and f.rows > 0)
    # old scheme: rows repeated per file of a bucket+commit — dedup on
    # (commit dir, bucket) before summing
    seen: dict[tuple[str, int], int] = {}
    for f in files:
        seen[(os.path.dirname(f.path), f.bucket)] = f.rows
    return sum(r for r in seen.values() if r and r > 0)


class LakeTable:
    """One table rooted at a local/posix ``path`` (on a cluster: DFS path)."""

    def __init__(self, path: str):
        self.path = path

    # ------------------------------------------------------------------ meta
    @property
    def _snap_dir(self) -> str:
        return os.path.join(self.path, "_meta", "snapshots")

    def _snap_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version:08d}.json")

    def current_version(self) -> int:
        if not os.path.isdir(self._snap_dir):
            raise FileNotFoundError(f"not a LakeTable: {self.path}")
        versions = [
            int(f[1:9]) for f in os.listdir(self._snap_dir) if f.endswith(".json")
        ]
        if not versions:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        return max(versions)

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        v = self.current_version() if version is None else version
        with open(self._snap_path(v)) as fh:
            return json.load(fh)

    def schema(self, version: int | None = None) -> StructType:
        return StructType.fromJson(self.snapshot(version)["schema"])

    def history(self) -> list[dict[str, Any]]:
        """Commit log of retained snapshots, oldest→newest — the
        Iceberg ``table.history()``/``snapshots`` metadata view:
        one entry per snapshot with version, parent, operation,
        summary, row/file counts.  Driver-side metadata only (reads
        the O(retained-versions) snapshot JSONs, no data scan)."""
        versions = sorted(
            int(f[1:9]) for f in os.listdir(self._snap_dir) if f.endswith(".json")
        )
        out = []
        for v in versions:
            s = self.snapshot(v)
            out.append(
                {
                    "version": s["version"],
                    "parent": s.get("parent"),
                    "operation": s.get("operation"),
                    "summary": s.get("summary", {}),
                    "files": len(s["files"]),
                    # honor the snapshot's declared stats scheme — a
                    # scheme-1 manifest repeats bucket rows per file,
                    # and a raw sum would inflate the view
                    "rows": _distinct_bucket_rows(
                        [FileEntry.from_json(f) for f in s["files"]],
                        int(s.get("stats_version", STATS_FILE_ROWS)),
                    ),
                }
            )
        return out

    @property
    def key_col(self) -> str:
        return self.snapshot()["key_col"]

    @property
    def bucket_count(self) -> int:
        return self.snapshot()["bucket_count"]

    # ---------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        path: str,
        schema: StructType,
        key_col: str | None = None,
        bucket_count: int = 16,
        props: dict[str, Any] | None = None,
        attr_lww: bool = False,
    ) -> "LakeTable":
        t = cls(path)
        os.makedirs(t._snap_dir, exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        if key_col is not None:
            # keyed (merge-managed) tables carry the lsn guard + delete
            # tombstone as physical meta columns; attr-LWW tables
            # additionally carry one assertion-lsn per payload column
            # and the delete watermark (field-level provenance, the
            # reference's attribute_assertion rows
            # /root/reference/src/tracking/entities/attribute_assertion.py:8-44
            # folded into the row layout)
            names = {f.name for f in schema.fields}
            extra = []
            if LSN_COL not in names:
                extra.append(StructField(LSN_COL, LongType(), True))
            if TOMBSTONE_COL not in names:
                extra.append(StructField(TOMBSTONE_COL, BooleanType(), True))
            if attr_lww:
                extra.append(StructField(DEL_LSN_COL, LongType(), True))
                extra.extend(
                    StructField(alsn_col(f.name), LongType(), True)
                    for f in schema.fields
                    if f.name != key_col
                )
            schema = StructType(list(schema.fields) + extra)
        t._commit(
            version=1,
            snapshot={
                "version": 1,
                "parent": None,
                "schema": schema.jsonValue(),
                "key_col": key_col,
                "bucket_count": bucket_count,
                "attr_lww": attr_lww,
                "files": [],
                "props": props or {},
                "operation": "create",
                "summary": {},
            },
        )
        return t

    @classmethod
    def load(cls, path: str) -> "LakeTable":
        t = cls(path)
        t.current_version()  # raises if absent
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        try:
            cls.load(path)
            return True
        except FileNotFoundError:
            return False

    def _commit(self, version: int, snapshot: dict[str, Any]) -> None:
        """Atomic, create-exclusive commit: hard-link tmp → vN.json.

        ``os.link`` fails with EEXIST if another writer committed vN
        first → optimistic-concurrency conflict surfaces as an error
        instead of silent overwrite (POSIX rename would overwrite).
        """
        # stamp the row-stats scheme for NEW snapshots; snapshots that
        # arrive pre-stamped (rollback carrying an old manifest) keep
        # their original declaration so the reader picks the right
        # row-count interpretation
        snapshot.setdefault("stats_version", STATS_FILE_ROWS)
        tmp = self._snap_path(version) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(snapshot, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._snap_path(version))
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------------ read
    def _scan(
        self, spark: SparkSession, files: list[FileEntry], schema: StructType
    ) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f.path) for f in files]
        # Explicit-schema scan: files written before a schema evolution
        # lack the new columns; Spark's parquet reader fills them with
        # null by name — no mergeSchema footer job needed.
        return spark.read.schema(schema).parquet(*paths)

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        include_meta: bool = False,
    ) -> DataFrame:
        snap = self.snapshot(version)
        schema = StructType.fromJson(snap["schema"])
        files = [FileEntry.from_json(f) for f in snap["files"]]
        df = self._scan(spark, files, schema)
        if include_meta:
            return df
        return self._strip_meta(df, schema)

    @staticmethod
    def _strip_meta(df: DataFrame, schema: StructType) -> DataFrame:
        """Drop tombstoned rows and internal meta columns — the shared
        tail of read() and read_keys()."""

        def is_meta(n: str) -> bool:
            return n in (LSN_COL, TOMBSTONE_COL, DEL_LSN_COL) or n.startswith(ALSN_PREFIX)

        if TOMBSTONE_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        return df.select(*[f.name for f in schema.fields if not is_meta(f.name)])

    def _files_for_keys(
        self,
        spark: SparkSession,
        keys: list,
        snap: dict[str, Any],
        probe_blooms: bool = True,
        key_df: DataFrame | None = None,
    ) -> list[FileEntry]:
        """Driver-side file pruning for a point-key lookup: bucket +
        min/max range + (when sidecars exist) bloom membership.  The
        only Spark work is one tiny job computing the keys' xxhash64
        values with the TABLE's key dtype (the engine never
        re-implements the hash in Python, and hashing e.g. a long key
        as its string form would silently probe the wrong bucket); the
        probes themselves run in-process against the cached sidecar
        words, so pruning cost is O(keys × files-in-their-buckets) bit
        tests — no cluster round trip per file."""
        import bisect

        key_col = snap["key_col"]
        nb = snap["bucket_count"]
        key_field = StructType.fromJson(snap["schema"])[key_col]
        src = key_df if key_df is not None else spark.createDataFrame(
            [(k,) for k in keys], StructType([key_field])
        )
        cols = [F.col(key_col), bucket_expr(key_col, nb).alias("_b")]
        if probe_blooms:
            h1e, h2e = _bloom_hash_exprs(key_col)
            cols += [h1e.alias("_h1"), h2e.alias("_h2")]
        rows = src.select(*cols).collect()
        by_bucket: dict[int, list] = {}
        for r in rows:
            by_bucket.setdefault(r["_b"], []).append(r)
        # bulk path (no bloom probes): the per-file question collapses
        # to "does ANY key fall in [min,max]" — sort each bucket's keys
        # once and bisect, O(files × log keys) instead of O(files × keys)
        sorted_keys: dict[int, list] = (
            {}
            if probe_blooms
            else {b: sorted(r[key_col] for r in rs) for b, rs in by_bucket.items()}
        )
        out: list[FileEntry] = []
        for f in [FileEntry.from_json(x) for x in snap["files"]]:
            if f.bucket == -1:
                out.append(f)  # unbucketed file: no layout info, scan it
                continue
            if f.bucket not in by_bucket:
                continue
            if not probe_blooms:
                ks = sorted_keys[f.bucket]
                if f.min_key is not None and f.max_key is not None:
                    i = bisect.bisect_left(ks, f.min_key)
                    if i >= len(ks) or ks[i] > f.max_key:
                        continue
                out.append(f)
                continue
            cands = by_bucket[f.bucket]
            cands = [
                r
                for r in cands
                if f.min_key is None
                or f.max_key is None
                or (f.min_key <= r[key_col] <= f.max_key)
            ]
            if not cands:
                continue
            words = (
                _usable_bloom_words(self.path, f.bloom)
                if (probe_blooms and f.bloom)
                else None
            )
            if words is None:
                out.append(f)  # no usable sidecar → range result stands
                continue
            m = int(f.bloom["m"])
            hit = False
            for r in cands:
                h1m, h2m = r["_h1"] % m, r["_h2"] % m
                if all(
                    (words[p >> 6] >> (p & 63)) & 1
                    for p in ((h1m + i * h2m) % m for i in range(BLOOM_K))
                ):
                    hit = True
                    break
            if hit:
                out.append(f)
        return out

    def read_keys(
        self,
        spark: SparkSession,
        keys: list,
        version: int | None = None,
        include_meta: bool = False,
    ) -> DataFrame:
        """Point-lookup read: the rows for ``keys`` — values in the
        TABLE's native key dtype (a long-keyed table takes ints, not
        their string forms) — live only, unless ``include_meta``,
        scanning ONLY the data files that can hold them: bucket +
        min/max + bloom pruning driver-side, then an
        explicit-schema scan of the surviving files with the key
        predicate pushed to parquet.  At production scale this is the
        difference between an entity lookup costing O(keys) file reads
        and a full-table scan; the reference's per-entity get paths
        (/root/reference/src/core/logic/initiative_handlers.py:54-106)
        are point reads of exactly this shape."""
        snap = self.snapshot(version)
        if snap["key_col"] is None:
            # ValueError, not assert: asserts vanish under `python -O`
            # and the failure would then surface as an opaque
            # StructType[None] error deep in the scan
            raise ValueError("read_keys requires a keyed table")
        schema = StructType.fromJson(snap["schema"])
        keys = list(keys)
        bulk = len(keys) > READ_KEYS_ISIN_MAX
        # ONE key frame serves both the pruning job and (on the bulk
        # path) the semi-join — not two identical driver serializations
        lk = (
            spark.createDataFrame(
                [(k,) for k in keys], StructType([schema[snap["key_col"]]])
            )
            if keys
            else None
        )
        files = (
            self._files_for_keys(
                spark, keys, snap, probe_blooms=not bulk, key_df=lk
            )
            if keys
            else []
        )
        df = self._scan(spark, files, schema)
        if bulk:
            # point-lookup misuse guard: a giant isin() literal list
            # blows up the plan (and the per-key driver bloom loop is
            # O(keys × files)); degrade to a broadcast semi-join, which
            # is the right plan shape for bulk key sets anyway
            df = df.join(F.broadcast(lk), snap["key_col"], "semi")
        else:
            df = df.filter(F.col(snap["key_col"]).isin(keys))
        if include_meta:
            return df
        return self._strip_meta(df, schema)

    # ---------------------------------------------------------------- append
    def append(
        self, df: DataFrame, operation: str = "append", props: dict[str, Any] | None = None
    ) -> int:
        """Blind append (no key semantics) — used by lineage/metrics/log
        tables, mirroring the reference's append-only tracking tables
        (/root/reference/src/tracking/entities/entity_change_log.py:8-42).
        ``props`` entries are merged into the snapshot props (e.g. the
        change-log batch high-watermark that makes appends idempotent)."""
        snap = self.snapshot()
        version = snap["version"] + 1
        schema = StructType.fromJson(snap["schema"])
        df = df.select([F.col(f.name).cast(f.dataType) for f in schema.fields])
        new_files = self._write_data(df, version, bucketed=False)
        files = [FileEntry.from_json(f) for f in snap["files"]] + new_files
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in files],
                "props": {**snap.get("props", {}), **(props or {})},
                "operation": operation,
                "summary": {"appended_files": len(new_files)},
            },
        )
        return version

    def append_rows(
        self,
        rows: list[dict[str, Any]],
        operation: str = "append_rows",
        props: dict[str, Any] | None = None,
    ) -> int:
        """Driver-side small append for control-plane tables (runs,
        metrics): writes the rows as ONE parquet file with pyarrow — no
        Spark job — then commits exactly like :meth:`append`.  A Spark
        write of a handful of lineage rows per batch was pure fixed
        overhead (one full job each at ~0.5-1 s); the pyarrow file uses
        the table's own arrow schema so Spark reads it back
        bit-identically (session + system tz are UTC, matching the
        engine's naive-UTC timestamps).  Missing keys land as null."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        snap = self.snapshot()
        version = snap["version"] + 1
        schema = StructType.fromJson(snap["schema"])
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema.fields}
        table = pa.Table.from_pydict(cols, schema=to_arrow_schema(schema))
        rel_dir = os.path.join("data", f"commit-{version:08d}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.path, rel_dir)
        os.makedirs(out_dir)
        pq.write_table(table, os.path.join(out_dir, "part-00000.parquet"))
        new_files = [
            FileEntry(os.path.join(rel_dir, "part-00000.parquet"), -1, len(rows), None, None)
        ]
        files = [FileEntry.from_json(f) for f in snap["files"]] + new_files
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in files],
                "props": {**snap.get("props", {}), **(props or {})},
                "operation": operation,
                "summary": {"appended_files": 1},
            },
        )
        return version

    # ---------------------------------------------------- schema evolution
    @staticmethod
    def _is_widening(old_t, new_t) -> bool:
        """Iceberg's safe type-promotion set (spec §Schema Evolution):
        int→long, float→double, decimal(P,S)→decimal(P',S) with P'>P.
        All three are zero-rewrite: Spark's vectorized parquet reader
        upcasts old files on scan when given the widened read schema
        (verified on this build — illegal promotions like
        decimal→double abort the scan, so the gate below is load-bearing).
        """
        from pyspark.sql.types import (
            DecimalType,
            DoubleType,
            FloatType,
            IntegerType,
        )

        if isinstance(old_t, IntegerType) and isinstance(new_t, LongType):
            return True
        if isinstance(old_t, FloatType) and isinstance(new_t, DoubleType):
            return True
        if isinstance(old_t, DecimalType) and isinstance(new_t, DecimalType):
            return new_t.scale == old_t.scale and new_t.precision > old_t.precision
        return False

    def evolve_schema(self, new_schema: StructType, operation: str = "evolve") -> int:
        """Additive + widening schema evolution: new columns are
        appended nullable; existing columns may widen along Iceberg's
        promotion lattice (``_is_widening``); anything else is
        rejected.  Old data files are untouched — new columns read as
        null, widened columns upcast at scan time."""
        snap = self.snapshot()
        old = StructType.fromJson(snap["schema"])
        old_names = {f.name: f for f in old.fields}
        for f in old.fields:
            if f.name not in [n.name for n in new_schema.fields]:
                raise ValueError(f"schema evolution may not drop column {f.name!r}")
        new_by_name = {f.name: f for f in new_schema.fields}
        merged = []
        widened: list[str] = []
        for f in old.fields:
            nf = new_by_name[f.name]
            if str(nf.dataType) == str(f.dataType):
                merged.append(f)
            elif self._is_widening(f.dataType, nf.dataType):
                merged.append(StructField(f.name, nf.dataType, True))
                widened.append(f"{f.name}: {f.dataType.simpleString()}->{nf.dataType.simpleString()}")
            else:
                raise ValueError(
                    f"schema evolution may not change type of {f.name!r}: "
                    f"{f.dataType} -> {nf.dataType} (only int->long, "
                    f"float->double, decimal precision widening)"
                )
        for f in new_schema.fields:
            if f.name not in old_names:
                # force nullable regardless of the source field: old
                # data files lack the column and scan as null, so a
                # non-null table schema would let Catalyst's
                # null-constraint propagation fold isNotNull filters
                # to true over pre-evolution rows
                merged.append(StructField(f.name, f.dataType, True))
        version = snap["version"] + 1
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "schema": StructType(merged).jsonValue(),
                "operation": operation,
                "summary": {
                    "added": [f.name for f in merged if f.name not in old_names],
                    "widened": widened,
                },
            },
        )
        return version

    # ------------------------------------------------------------- rollback
    def rollback(self, to_version: int) -> int:
        """Roll the table back to a prior snapshot — Iceberg's
        ``rollback_to_snapshot``.  Implemented as a NEW commit whose
        schema/files/props are copied from the target snapshot, so
        history is preserved (the bad commits stay inspectable until
        vacuumed) and ``vacuum`` keeps the rolled-back-to files alive
        because the head snapshot references them.

        Props roll back too: the CDC batch high-watermarks
        (``last_batch_id`` / change-log watermark) revert with the
        data, so re-applying the change feed from the rolled-back
        point is NOT suppressed by the idempotency guards — replay
        reconverges the table (T3)."""
        snap = self.snapshot()
        if to_version > snap["version"]:
            raise ValueError(
                f"cannot roll back to future version {to_version} "
                f"(current {snap['version']})"
            )
        target = self.snapshot(to_version)  # raises if expired
        version = snap["version"] + 1
        self._commit(
            version,
            {
                **target,
                "version": version,
                "parent": snap["version"],
                "operation": "rollback",
                "summary": {"to_version": to_version},
            },
        )
        return version

    # --------------------------------------------------- incremental scan
    def read_appends(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Incremental append scan — Iceberg's
        ``incremental-scan`` contract: return exactly the rows added by
        ``append`` commits in ``(from_version, to_version]``, by
        scanning only the files those commits introduced (no diffing of
        row contents, no full-table read).

        Raises if any commit in the range rewrote files (merge /
        overwrite / rebucket / compact remove or replace files, so
        "rows added since v" is not file-expressible there —
        downstream consumers of merge-managed tables subscribe to the
        change-log table instead, which exists precisely for that).
        The check is on the FILE SET, not the operation label: a
        commit qualifies iff its file set is a superset of its
        parent's, so every append variant (change_log, metrics,
        run(...), quarantine appends) and metadata-only commits
        (evolve) qualify regardless of how they were labeled."""
        to_v = self.current_version() if to_version is None else to_version
        if from_version > to_v:
            raise ValueError(f"from_version {from_version} > to_version {to_v}")
        schema = StructType.fromJson(self.snapshot(to_v)["schema"])
        new_files: list[FileEntry] = []
        prev_paths = {f["path"] for f in self.snapshot(from_version)["files"]}
        for v in range(from_version + 1, to_v + 1):
            snap = self.snapshot(v)
            cur_paths = {f["path"] for f in snap["files"]}
            if not prev_paths <= cur_paths:
                raise ValueError(
                    f"incremental append scan requires append-only history; "
                    f"version {v} ({snap.get('operation')!r}) removed or "
                    f"rewrote files — consume the change-log table instead"
                )
            new_files.extend(
                FileEntry.from_json(f)
                for f in snap["files"]
                if f["path"] not in prev_paths
            )
            prev_paths = cur_paths
        return self._scan(spark, new_files, schema)

    # ----------------------------------------------------------------- write
    def _write_data(
        self,
        df: DataFrame,
        version: int,
        bucketed: bool,
        with_blooms: bool = False,
        cluster_files: int | None = None,
    ) -> list[FileEntry]:
        """Write df to a fresh commit directory; return file entries.

        When ``bucketed``, df must carry BUCKET_COL; output is
        partitioned by it so each file belongs to exactly one bucket,
        and per-file row counts + min/max key are collected for pruning.
        With ``with_blooms`` a per-file key Bloom sidecar is also built
        (one column-pruned read-back job over the just-written files —
        only callers on the bulk/opt-in paths pass it).

        ``cluster_files`` (compaction paths only) switches the shuffle
        to ``repartitionByRange(cluster_files, bucket, key)`` + a
        within-partition sort — range partitioning on (bucket, key) is
        lexicographic, so the files it produces INSIDE each bucket hold
        pairwise-disjoint, key-sorted ranges.  The footer min/max stats
        below then make ``_prune_for_batch``'s range test (paired with
        its sparse exact-key refinement, which stops the batch interval
        from sweeping files BETWEEN two keys) exact for point keys
        (≤1 file per bucket per key) with zero read-side changes —
        Iceberg's sort-ordered ``rewrite_data_files``
        expressed as one extra exchange on the O(table) job that
        compaction already is.  The default hash ``repartition`` stays
        on the merge hot path: a range exchange there would add a
        sampling pass per micro-batch for ranges the next merge
        immediately fragments.
        """
        rel_dir = os.path.join("data", f"commit-{version:08d}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.path, rel_dir)
        if bucketed:
            key = self.key_col
            if cluster_files:
                shuffled = df.repartitionByRange(
                    int(cluster_files), F.col(BUCKET_COL), F.col(key)
                ).sortWithinPartitions(BUCKET_COL, key)
            else:
                shuffled = df.repartition(F.col(BUCKET_COL))
            (
                shuffled
                .write.partitionBy(BUCKET_COL)
                .mode("error")
                .parquet(out_dir)
            )
            has_data = any(
                sub.startswith(f"{BUCKET_COL}=") for sub in os.listdir(out_dir)
            )
            if not has_data:
                return []
            # per-file pruning stats from the PARQUET FOOTERS the write
            # just produced — driver-side metadata reads, no second
            # Spark job over the merged plan (the previous per-bucket
            # groupBy cost a full extra action per merge) and no data
            # decode.  Same design as Iceberg manifests: the writer
            # already collected min/max/row-count per file.  Writer-side
            # truncation of string stats is CONSERVATIVE (min prefix ≤
            # min, incremented prefix ≥ max), so pruning stays safe;
            # missing stats degrade to None = never pruned.
            entries: list[FileEntry] = []
            for sub in sorted(os.listdir(out_dir)):
                if not sub.startswith(f"{BUCKET_COL}="):
                    continue
                b = int(sub.split("=", 1)[1])
                for fn in sorted(os.listdir(os.path.join(out_dir, sub))):
                    if fn.endswith(".parquet"):
                        rows, mn, mx = _footer_stats(
                            os.path.join(out_dir, sub, fn), key
                        )
                        entries.append(
                            FileEntry(os.path.join(rel_dir, sub, fn), b, rows, mn, mx)
                        )
            if with_blooms and entries:
                blooms = self._build_blooms(df.sparkSession, out_dir, key, version)
                for e in entries:
                    e.bloom = blooms.get("/".join(e.path.split(os.sep)[-2:]))
            return entries
        df.write.mode("error").parquet(out_dir)
        entries = []
        for fn in sorted(os.listdir(out_dir)):
            if fn.endswith(".parquet"):
                rows, _, _ = _footer_stats(os.path.join(out_dir, fn), None)
                entries.append(FileEntry(os.path.join(rel_dir, fn), -1, rows, None, None))
        return entries

    def _build_blooms(
        self, spark: SparkSession, out_dir: str, key: str, version: int
    ) -> dict[str, dict[str, Any]]:
        """Build one key-Bloom sidecar per just-written data file.

        One extra Spark job whose input is ONLY the key column of the
        new files (column-pruned scan, grouped by ``input_file_name``,
        numpy bit-set kernel per file via applyInPandas) — distributed
        and O(written rows), never a driver-side data decode.  The
        sidecar parquet files are written EXECUTOR-SIDE inside the
        kernel (atomic, idempotent under task retry); the driver
        collects only {_file, ref, m, k} descriptor rows — O(new files
        × ~100 B), never the filter words (which would be O(new files
        × 1 MiB) on a big bootstrap/compact).  Returns
        {"<bucket dir>/<basename>": bloom descriptor} — a dynamic
        partition write reuses the SAME part-file basename in every
        bucket directory, so the basename alone is ambiguous."""
        os.makedirs(os.path.join(self.path, "_meta", "blooms"), exist_ok=True)
        h1, h2 = _bloom_hash_exprs(key)
        per = (
            spark.read.option("basePath", out_dir)
            .parquet(out_dir)
            .select(F.input_file_name().alias("_file"), h1.alias("_h1"), h2.alias("_h2"))
        )
        rows = (
            per.groupBy("_file")
            .applyInPandas(
                _make_bloom_build_pdf(self.path, version),
                schema=_BLOOM_BUILD_RESULT_SCHEMA,
            )
            .collect()
        )
        out: dict[str, dict[str, Any]] = {}
        for r in rows:
            parts = r["_file"].rstrip("/").split("/")
            out["/".join(parts[-2:])] = {
                "ref": r["ref"],
                "m": int(r["m"]),
                "k": int(r["k"]),
            }
        return out

    def _bloom_enabled(self, snap: dict[str, Any]) -> bool:
        """Key blooms are an opt-in table prop (``key_bloom: "true"``) —
        point-key CDC tables turn it on; range-local feeds don't need
        it and skip the build job."""
        return str(snap.get("props", {}).get(BLOOM_PROP, "")).lower() in ("true", "1")

    # ------------------------------------------------- shared merge plumbing
    def _prune_for_batch(
        self, src: DataFrame, snap: dict[str, Any]
    ) -> tuple[list[FileEntry], list[FileEntry]]:
        """Bucket + min/max-key (+ optional key-Bloom) file pruning for
        a bucketed batch, decided driver-side over O(buckets) rows:
        files whose bucket/key range can contain batch keys are
        rewritten, the rest carry.  Files carrying a Bloom sidecar are
        additionally membership-probed — the probes ride the SAME
        single aggregation as the range stats (batch ⋈ broadcast
        bloom-meta, unrolled ``bit_get`` tests, ``collect_set`` of hit
        file ids per bucket), so a point-key trickle against a
        compacted table carries every file the batch provably misses
        at no extra Spark action.  Both tests are free of false
        negatives (range: disjoint intervals share no key; bloom: every
        inserted key sets all its probe bits), so intersecting them is
        sound and prunes strictly more than either alone."""
        key = self.key_col
        all_files = [FileEntry.from_json(f) for f in snap["files"]]
        # files with a k-compatible sidecar get membership probes; the
        # sidecars are one-row parquet files scanned JVM-SIDE inside the
        # probe (no Python word serialization per merge — the trickle
        # hot path stays driver-light).  The probe broadcasts every
        # participating bloom, so cap the total bytes
        # (``key_bloom_max_probe_mb`` prop) and prefer the LARGEST
        # files — each carries the most avoidable rewrite I/O per
        # broadcast byte; files past the cap keep the range test.
        cap_bytes = (
            float(snap.get("props", {}).get("key_bloom_max_probe_mb", 512)) * 1e6
        )
        candidates: list[tuple[int, FileEntry]] = []
        for idx, f in enumerate(all_files):
            bl = f.bloom
            # suffix check keeps legacy/foreign sidecar formats (which
            # the JVM scan would silently drop) from consuming budget
            if (
                bl
                and int(bl.get("k", -1)) == BLOOM_K
                and bl["ref"].endswith(".bloom.parquet")
            ):
                candidates.append((idx, f))
        candidates.sort(key=lambda t: t[1].rows or 0, reverse=True)
        bloomed: list[tuple[int, FileEntry]] = []
        budget = cap_bytes
        for idx, f in candidates:
            cost = int(f.bloom["m"]) / 8
            # existence check at selection: a path missing at PLANNING
            # time throws despite ignoreMissingFiles (which only covers
            # disappearance between listing and execution — the vacuum
            # race the option is kept for)
            if budget >= cost and os.path.exists(os.path.join(self.path, f.bloom["ref"])):
                bloomed.append((idx, f))
                budget -= cost

        # probed = files whose sidecar actually joined the aggregate;
        # hit = probed files some batch key's bits all matched.  The
        # distinction makes sidecar loss safe: a missing/corrupt/
        # mis-sized sidecar silently drops out of the scan
        # (ignoreMissing/ignoreCorrupt + the m/k filter), its file is
        # then NOT in `probed`, and the range-only verdict stands.
        probed_fids: dict[int, set[int]] = {}
        hit_fids: dict[int, set[int]] = {}
        if not bloomed:
            touched = (
                src.groupBy(BUCKET_COL)
                .agg(
                    F.min(key).alias("mn"),
                    F.max(key).alias("mx"),
                    F.approx_count_distinct(key).alias("ndk"),
                )
                .collect()
            )
        else:
            spark = src.sparkSession
            lk = spark.createDataFrame(
                [
                    (os.path.basename(f.bloom["ref"]), f.bucket, idx)
                    for idx, f in bloomed
                ],
                schema=f"_ref string, {BUCKET_COL} int, _fid int",
            )
            fm = (
                spark.read.schema("m long, k int, words array<bigint>")
                .option("ignoreCorruptFiles", "true")
                .option("ignoreMissingFiles", "true")
                .parquet(*[os.path.join(self.path, f.bloom["ref"]) for _i, f in bloomed])
                .filter(
                    (F.col("k") == BLOOM_K) & (F.size("words") * 64 == F.col("m"))
                )
                .withColumn(
                    "_ref", F.element_at(F.split(F.input_file_name(), "/"), -1)
                )
                .join(F.broadcast(lk), "_ref")
                .select(BUCKET_COL, "_fid", F.col("m").alias("_m"), F.col("words").alias("_words"))
            )
            h1, h2 = _bloom_hash_exprs(key)
            probe = (
                src.select(
                    F.col(BUCKET_COL), F.col(key), h1.alias("_h1"), h2.alias("_h2")
                )
                .join(F.broadcast(fm), BUCKET_COL, "left")
                # reduce mod m before the multiply-add (same scheme as
                # the build kernel; keeps ANSI-mode int64 arithmetic
                # overflow-free)
                .withColumns(
                    {
                        "_h1m": F.pmod(F.col("_h1"), F.col("_m")),
                        "_h2m": F.pmod(F.col("_h2"), F.col("_m")),
                    }
                )
            )
            hit = F.lit(True)
            for i in range(BLOOM_K):
                pos = F.pmod(F.col("_h1m") + F.lit(i) * F.col("_h2m"), F.col("_m"))
                word = F.element_at(
                    F.col("_words"), (F.shiftright(pos, 6) + 1).cast("int")
                )
                hit = hit & (F.bit_get(word, pos.bitwiseAND(F.lit(63))) == 1)
            touched = (
                probe.groupBy(BUCKET_COL)
                .agg(
                    F.min(key).alias("mn"),
                    F.max(key).alias("mx"),
                    F.approx_count_distinct(key).alias("ndk"),
                    F.collect_set(F.col("_fid")).alias("probed"),
                    F.collect_set(F.when(hit, F.col("_fid"))).alias("hits"),
                )
                .collect()
            )
            probed_fids = {r[BUCKET_COL]: set(r["probed"]) for r in touched}
            hit_fids = {r[BUCKET_COL]: set(r["hits"]) for r in touched}

        touched_range = {r[BUCKET_COL]: (r["mn"], r["mx"]) for r in touched}
        touched_ndk = {r[BUCKET_COL]: int(r["ndk"]) for r in touched}
        rewrite_files: list[FileEntry] = []
        carry_files: list[FileEntry] = []
        # bucket -> rewrite_files positions the interval test ALONE kept
        # (bloom-probed files are already membership-exact) — the
        # candidates for the exact-key refinement below
        refinable: dict[int, list[int]] = {}
        for idx, f in enumerate(all_files):
            if f.bucket == -1:
                # unbucketed file on a keyed table (stray append): no
                # layout info, so any non-empty batch may touch it —
                # must rewrite, mirroring read_keys' always-scan rule
                (rewrite_files if touched_range else carry_files).append(f)
                continue
            rng = touched_range.get(f.bucket)
            overlaps = rng is not None and not (
                f.max_key is not None
                and f.min_key is not None
                and (f.max_key < rng[0] or f.min_key > rng[1])
            )
            probed = idx in probed_fids.get(f.bucket, set())
            if overlaps and probed:
                overlaps = idx in hit_fids.get(f.bucket, set())
            if overlaps:
                if not probed and f.min_key is not None and f.max_key is not None:
                    refinable.setdefault(f.bucket, []).append(len(rewrite_files))
                rewrite_files.append(f)
            else:
                carry_files.append(f)

        # Exact-key refinement: the interval [batch-min, batch-max] per
        # bucket sweeps in every file BETWEEN two batch keys, even on a
        # key-clustered table whose file ranges are pairwise disjoint.
        # For trickle-shaped buckets (HLL distinct-key estimate under
        # the gate) a second SMALL action collects the actual batch
        # keys and carries every un-probed file whose [min,max] holds
        # none of them.  Sound (no false carries): file stats are true
        # bounds and collect_set is exact, so a file containing a batch
        # key always has some collected key inside its range.  Dense
        # batches skip this entirely — they rewrite broadly regardless,
        # and the gate keeps the driver's key copy O(refined buckets ×
        # PRUNE_REFINE_BUCKET_KEYS) at worst.
        # single-file buckets stay eligible: a sparse INSERT batch whose
        # keys straddle a lone file's range (but live in its gaps) is
        # exactly the wasted-rewrite case the refinement exists for
        refine = [
            b
            for b, ps in refinable.items()
            if 0 < touched_ndk.get(b, 0) <= PRUNE_REFINE_BUCKET_KEYS
            # trickle-shaped only: the avoidable rewrite must dwarf the
            # bucket's batch keys, else the extra pass can't pay for
            # itself (see PRUNE_REFINE_MIN_AMP)
            and sum(int(rewrite_files[p].rows or 0) for p in ps)
            > PRUNE_REFINE_MIN_AMP * touched_ndk[b]
        ]
        if refine and sum(touched_ndk[b] for b in refine) <= PRUNE_REFINE_TOTAL_KEYS:
            keys_by_bucket = {
                r[BUCKET_COL]: r["ks"]
                for r in src.filter(F.col(BUCKET_COL).isin(refine))
                .groupBy(BUCKET_COL)
                .agg(F.sort_array(F.collect_set(key)).alias("ks"))
                .collect()
            }
            dropped: set[int] = set()
            for b in refine:
                ks = keys_by_bucket.get(b) or []
                for pos in refinable[b]:
                    f = rewrite_files[pos]
                    i = bisect.bisect_left(ks, f.min_key)
                    if not (i < len(ks) and ks[i] <= f.max_key):
                        dropped.add(pos)
            if dropped:
                carry_files.extend(rewrite_files[p] for p in sorted(dropped))
                rewrite_files = [
                    f for p, f in enumerate(rewrite_files) if p not in dropped
                ]
        return rewrite_files, carry_files

    def _bucket_policy_advice(
        self, snap: dict[str, Any], files: list[FileEntry], summary: dict[str, Any]
    ) -> None:
        """Merge-time bucket-count policy check: record a rebucket
        recommendation in the snapshot summary when rows/bucket exceeds
        the table's target (the operator schedules rebucket() — an
        O(table) rewrite — off the hot path)."""
        target_rpb = int(
            snap.get("props", {}).get(
                "target_rows_per_bucket", DEFAULT_TARGET_ROWS_PER_BUCKET
            )
        )
        est_rows = _distinct_bucket_rows(
            files, int(snap.get("stats_version", STATS_FILE_ROWS))
        )
        if est_rows > snap["bucket_count"] * target_rpb:
            summary["rebucket_recommended"] = recommended_bucket_count(
                est_rows, target_rpb
            )
        # clustering advisory — see CLUSTER_ADVICE_MIN_AMP.  Uses the
        # REWRITTEN side of this merge only (O(1) over already-known
        # summary numbers); job_maintain's auto mode schedules the
        # sort-ordered rewrite off the hot path, like rebucket.
        rr = summary.get("rewritten_rows", 0)
        rf = summary.get("rewritten_files", 0)
        try:
            target = self._target_file_rows(snap)
        except (TypeError, ValueError):
            # advisory is best-effort: a malformed target_file_rows
            # prop must not poison the merge that is about to commit
            # (the explicit clustered-compaction paths still raise)
            target = DEFAULT_TARGET_FILE_ROWS
        if (
            rf > 0
            and rr > CLUSTER_ADVICE_MIN_AMP * max(1, summary.get("batch_rows", 0))
            and rr / rf > 2 * target
        ):
            summary["cluster_recommended"] = True

    # ----------------------------------------------------------------- merge
    def merge(
        self,
        batch: DataFrame,
        op_col: str = "op",
        lsn_col: str = "lsn",
        delete_op: str = "delete",
        change_log_sink: "LakeTable | None" = None,
        change_log_extra: dict[str, Any] | None = None,
        persist_join: bool | None = None,
    ) -> dict[str, Any]:
        """Copy-on-write keyed MERGE — the engine's `MERGE INTO`.

        ``batch`` must have exactly one row per key (run the LWW
        reduction first), with columns: key, payload columns (a subset
        or superset of the table payload schema — new columns trigger
        additive evolution), ``op_col`` and ``lsn_col``.

        Semantics per key (reference: create-or-update handlers
        /root/reference/src/core/logic/initiative_handlers.py:54-106 and
        member deletion /root/reference/src/core/logic/team_synchronizer.py:161-189):

          WHEN MATCHED  AND s.lsn > t._lsn AND s.op = delete → tombstone
          WHEN MATCHED  AND s.lsn > t._lsn                  → UPDATE
          WHEN MATCHED  AND s.lsn <= t._lsn                 → no-op (stale / replayed)
          WHEN NOT MATCHED AND s.op != delete               → INSERT
          WHEN NOT MATCHED AND s.op = delete                → tombstone (guards
              a later out-of-order stale update; GC'd by compaction)

        Only buckets (and files, via min/max key pruning) containing
        batch keys are rewritten; untouched files carry forward.

        Returns stats + a lazily-evaluated ``change_log`` DataFrame of
        before/after images (valid as long as the pre-merge snapshot
        files are retained).
        """
        snap = self.snapshot()
        spark = batch.sparkSession
        key = snap["key_col"]
        nb = snap["bucket_count"]
        if key is None:
            # ValueError, not assert: asserts vanish under `python -O`
            raise ValueError("merge requires a keyed table")

        # --- additive schema evolution from batch payload columns
        payload_cols = [c for c in batch.columns if c not in (op_col, lsn_col)]
        table_schema = StructType.fromJson(snap["schema"])
        known = {f.name for f in table_schema.fields}
        new_cols = [c for c in payload_cols if c not in known]
        if new_cols:
            add = [f for f in batch.schema.fields if f.name in new_cols]
            self.evolve_schema(
                StructType(list(table_schema.fields) + add), operation="evolve(merge)"
            )
            snap = self.snapshot()
            table_schema = StructType.fromJson(snap["schema"])

        data_cols = [
            f.name for f in table_schema.fields if f.name not in (LSN_COL, TOMBSTONE_COL)
        ]

        src = batch.withColumn(BUCKET_COL, bucket_expr(key, nb))
        rewrite_files, carry_files = self._prune_for_batch(src, snap)
        cur = self._scan(spark, rewrite_files, table_schema).withColumn(
            BUCKET_COL, bucket_expr(key, nb)
        )

        # --- single full-outer join on the key: yields both the merged
        # rows and the before/after change images in one shuffle.
        s = src.select(
            F.col(key).alias("_s_key"),
            F.col(BUCKET_COL).alias("_s_bucket"),
            F.col(op_col).alias("_s_op"),
            F.col(lsn_col).cast("long").alias("_s_lsn"),
            *[
                (F.col(c) if c in batch.columns else F.lit(None).cast(
                    table_schema[c].dataType
                )).alias(f"_s_{c}")
                for c in data_cols
                if c != key
            ],
        )
        t = cur.select(
            F.col(key).alias("_t_key"),
            F.col(BUCKET_COL).alias("_t_bucket"),
            F.col(LSN_COL).alias("_t_lsn"),
            F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)).alias("_t_tomb"),
            *[F.col(c).alias(f"_t_{c}") for c in data_cols if c != key],
        )
        # Cache the join ONLY when a second consumer re-reads it — the
        # in-call change-log sink append, or (persist_join=True from
        # the caller) the returned change-image frame, which a rollup
        # maintainer evaluates AFTER this call returns.  An explicit
        # persist_join=True therefore transfers unpersist ownership to
        # the caller via the returned ``persisted_join`` handle —
        # unpersisting here would drop the cache entry before the
        # caller's consumer plans against it, recomputing the join.
        # On the lineage-off throughput path the data write is the
        # single pass, and pushing ~2 copies of every token array per
        # batch through the memory bus just to fill a cache nobody
        # reads is pure overhead; the rare degenerate stats fallback
        # simply recomputes.
        caller_owns_join = persist_join is True
        if persist_join is None:
            persist_join = change_log_sink is not None
        j = t.join(s, t["_t_key"] == s["_s_key"], "full_outer")
        if persist_join:
            j = j.persist()  # consumed by merged write + change images

        fresh = F.col("_s_key").isNotNull() & (
            F.col("_t_key").isNull() | (F.col("_s_lsn") > F.col("_t_lsn"))
        )
        is_del = F.col("_s_op") == F.lit(delete_op)

        # merge stats RIDE the data write via an Observation on the
        # joined frame (no separate aggregation pass over j); the
        # cache-scan fallback below covers degenerate plans where
        # Catalyst elides the CollectMetrics node
        from pyspark.sql import Observation

        stat_exprs = {
            "batch_rows": F.sum(F.when(F.col("_s_key").isNotNull(), 1).otherwise(0)),
            "inserted": F.sum(F.when(fresh & ~is_del & (F.col("_t_key").isNull() | F.col("_t_tomb")), 1).otherwise(0)),
            "updated": F.sum(F.when(fresh & ~is_del & F.col("_t_key").isNotNull() & ~F.col("_t_tomb"), 1).otherwise(0)),
            "deleted": F.sum(F.when(fresh & is_del & F.col("_t_key").isNotNull() & ~F.col("_t_tomb"), 1).otherwise(0)),
            "delete_noop": F.sum(F.when(fresh & is_del & (F.col("_t_key").isNull() | F.col("_t_tomb")), 1).otherwise(0)),
            "skipped_stale": F.sum(F.when(F.col("_s_key").isNotNull() & ~fresh, 1).otherwise(0)),
        }
        obs = Observation(f"merge_v{snap['version'] + 1}")
        jo = j.observe(obs, *[e.alias(k) for k, e in stat_exprs.items()])

        merged = jo.select(
            F.coalesce(F.col("_t_key"), F.col("_s_key")).alias(key),
            F.coalesce(F.col("_t_bucket"), F.col("_s_bucket")).alias(BUCKET_COL),
            F.when(fresh, F.col("_s_lsn")).otherwise(F.col("_t_lsn")).alias(LSN_COL),
            F.when(fresh, is_del)
            .otherwise(F.coalesce(F.col("_t_tomb"), F.lit(False)))
            .alias(TOMBSTONE_COL),
            *[
                F.when(fresh & ~is_del, F.col(f"_s_{c}"))
                .when(fresh & is_del, F.lit(None).cast(table_schema[c].dataType))
                .otherwise(F.col(f"_t_{c}"))
                .alias(c)
                for c in data_cols
                if c != key
            ],
        )

        version = snap["version"] + 1
        ordered = [key, LSN_COL, TOMBSTONE_COL] + [c for c in data_cols if c != key]
        new_files = self._write_data(
            merged.select(BUCKET_COL, *ordered),
            version,
            bucketed=True,
            with_blooms=self._bloom_enabled(snap),
        )

        files = carry_files + new_files
        # change images — before/after per atomic payload column
        # (reference: entity_change_log before/after JSON,
        # /root/reference/src/tracking/entities/entity_change_log.py:8-42)
        atomic_cols = [
            c
            for c in data_cols
            if c != key
            and not isinstance(table_schema[c].dataType, (ArrayType, MapType, StructType))
        ]
        change_log = j.filter(F.col("_s_key").isNotNull()).select(
            F.col("_s_key").alias(key),
            F.col("_s_lsn").alias("lsn"),
            F.when(~fresh, F.lit("skipped_stale"))
            .when(is_del & (F.col("_t_key").isNull() | F.col("_t_tomb")), F.lit("delete_noop"))
            .when(is_del, F.lit("delete"))
            .when(F.col("_t_key").isNull() | F.col("_t_tomb"), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op_applied"),
            *[
                F.when(~F.col("_t_tomb"), F.col(f"_t_{c}")).alias(f"before_{c}")
                for c in atomic_cols
            ],
            *[
                F.when(fresh & ~is_del, F.col(f"_s_{c}")).alias(f"after_{c}")
                for c in atomic_cols
            ],
        )
        if change_log_extra:
            for k2, v2 in change_log_extra.items():
                change_log = change_log.withColumn(k2, F.lit(v2))
        if change_log_sink is not None:
            # Idempotent per batch: the append precedes this merge's
            # snapshot commit, so on a crash between the two the
            # redelivered batch re-derives IDENTICAL images (the merge
            # never committed); the sink's props remember the LAST
            # appended batch id and an append for exactly that id is
            # skipped.  Only the equality case is deduped: a streaming
            # redelivery is always a retry of the most recent batch
            # (the checkpoint advances only after success), while a
            # fresh batch-mode replay of a NEW feed may legitimately
            # restart its batch numbering below the old watermark and
            # must still be logged.
            batch_id = (change_log_extra or {}).get("batch_id")
            last = change_log_sink.props.get("last_batch_id") if batch_id is not None else None
            if batch_id is None or last is None or batch_id != last:
                change_log_sink.append(
                    change_log,
                    operation="change_log",
                    props={"last_batch_id": batch_id} if batch_id is not None else None,
                )

        try:
            stats_row = dict(obs.get)
        except Exception:
            stats_row = j.agg(
                *[e.alias(k) for k, e in stat_exprs.items()]
            ).collect()[0].asDict()
        if persist_join and not caller_owns_join:
            j.unpersist()

        summary = {
            "batch_rows": int(stats_row["batch_rows"] or 0),
            "inserted": int(stats_row["inserted"] or 0),
            "updated": int(stats_row["updated"] or 0),
            "deleted": int(stats_row["deleted"] or 0),
            "skipped_stale": int(stats_row["skipped_stale"] or 0),
            "rewritten_files": len(rewrite_files),
            "rewritten_rows": sum(int(f.rows or 0) for f in rewrite_files),
            "carried_files": len(carry_files),
        }
        self._bucket_policy_advice(snap, files, summary)
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in files],
                "operation": "merge",
                "summary": summary,
            },
        )
        return {
            "version": version,
            "inserted": int(stats_row["inserted"] or 0),
            "updated": int(stats_row["updated"] or 0),
            "deleted": int(stats_row["deleted"] or 0),
            "delete_noop": int(stats_row["delete_noop"] or 0),
            "skipped_stale": int(stats_row["skipped_stale"] or 0),
            "applied": int(
                (stats_row["inserted"] or 0)
                + (stats_row["updated"] or 0)
                + (stats_row["deleted"] or 0)
            ),
            "rewritten_files": len(rewrite_files),
            "carried_files": len(carry_files),
            "change_log": change_log,
            # non-None iff the caller passed persist_join=True: the
            # still-cached join backing change_log — caller unpersists
            # after its last consumer
            "persisted_join": j if caller_owns_join else None,
        }

    # ----------------------------------------------------------- merge_attrs
    def merge_attrs(
        self,
        winners: DataFrame,
        change_log_sink: "LakeTable | None" = None,
        change_log_extra: dict[str, Any] | None = None,
        persist_join: bool | None = None,
    ) -> dict[str, Any]:
        """Field-level (per-attribute) LWW MERGE for partial-update
        change events — the reference's core conflict resolution:
        latest *selected assertion* per (entity, attribute) wins
        (/root/reference/src/core/logic/canonical_exporter.py:749-753,
        first-hit fold :834-850;
        /root/reference/src/tracking/entities/attribute_assertion.py:8-44).

        ``winners`` must be the output of
        :func:`horizon_etl_spark.cdc.attrs.attr_lww_reduce` — one row
        per key with, for each payload column ``c``: the batch-winning
        value ``c`` and its assertion lsn ``_alsn_c`` (null when the
        batch never asserted ``c``), plus ``_del_lsn`` (the batch's
        highest delete lsn for the key, null if none).

        Resolution per (key, attribute) — a commutative, associative,
        idempotent fold, so batch boundaries / replay order / duplicate
        delivery cannot change the result:

          del_m   = max(table._del_lsn, batch._del_lsn)          # delete watermark
          live(x) = x.alsn is not null AND x.alsn > del_m        # survived every delete
          winner  = the live side with the higher alsn (batch wins ties:
                    a redelivered batch re-writes the identical value)
          row dead (tombstone) iff no attribute is live; the watermark
          row is kept so later out-of-order stale assertions stay dead.

        Unlike whole-row merge, a batch whose max lsn is *lower* than
        the row's — but which asserts a column never asserted before —
        correctly lands that column (the bug class whole-row LWW has
        with partial updates).

        Lineage: ``change_log_sink`` receives LONG-format per-attribute
        images (one row per (key, column) whose assertion lsn changed:
        'set' with the new value, 'unset' when a delete watermark killed
        it) — the columnar twin of the reference's per-assertion lineage
        (/root/reference/src/tracking/entities/attribute_assertion.py:8-44,
        entity_change_log.py:8-42); same last-batch idempotence guard as
        the whole-row merge.  The returned ``change_log`` is the
        ROW-level before/after image frame (same shape as
        :meth:`merge`'s) so downstream rollup maintenance is mode-
        agnostic."""
        snap = self.snapshot()
        if not snap.get("attr_lww"):
            raise ValueError("merge_attrs requires an attr_lww table")
        spark = winners.sparkSession
        key = snap["key_col"]
        nb = snap["bucket_count"]

        # --- additive schema evolution: new payload col → + its alsn col
        table_schema = StructType.fromJson(snap["schema"])
        known = {f.name for f in table_schema.fields}
        new_payload = [
            c
            for c in winners.columns
            if c not in known
            and c != DEL_LSN_COL
            and not c.startswith(ALSN_PREFIX)
        ]
        if new_payload:
            add = [f for f in winners.schema.fields if f.name in new_payload]
            add += [StructField(alsn_col(c), LongType(), True) for c in new_payload]
            self.evolve_schema(
                StructType(list(table_schema.fields) + add), operation="evolve(merge_attrs)"
            )
            snap = self.snapshot()
            table_schema = StructType.fromJson(snap["schema"])

        payload_cols = [
            f.name
            for f in table_schema.fields
            if f.name not in (key, LSN_COL, TOMBSTONE_COL, DEL_LSN_COL)
            and not f.name.startswith(ALSN_PREFIX)
        ]

        src = winners.withColumn(BUCKET_COL, bucket_expr(key, nb))
        rewrite_files, carry_files = self._prune_for_batch(src, snap)
        cur = self._scan(spark, rewrite_files, table_schema).withColumn(
            BUCKET_COL, bucket_expr(key, nb)
        )

        def s_val(c):  # batch side, null when the column is post-evolution
            if c in winners.columns:
                return F.col(c)
            return F.lit(None).cast(table_schema[c].dataType)

        def s_al(c):
            if alsn_col(c) in winners.columns:
                return F.col(alsn_col(c))
            return F.lit(None).cast("long")

        s = src.select(
            F.col(key).alias("_s_key"),
            F.col(BUCKET_COL).alias("_s_bucket"),
            F.coalesce(F.col(DEL_LSN_COL), F.lit(None).cast("long")).alias("_s_del"),
            *[s_val(c).alias(f"_s_{c}") for c in payload_cols],
            *[s_al(c).alias(f"_s_al_{c}") for c in payload_cols],
        )
        t = cur.select(
            F.col(key).alias("_t_key"),
            F.col(BUCKET_COL).alias("_t_bucket"),
            F.col(DEL_LSN_COL).alias("_t_del"),
            F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)).alias("_t_tomb"),
            *[F.col(c).alias(f"_t_{c}") for c in payload_cols],
            *[F.col(alsn_col(c)).alias(f"_t_al_{c}") for c in payload_cols],
        )
        # --- resolve each column's winner ONCE into projected columns
        # (_n_<c> value, _n_al_<c> assertion lsn, _n_del watermark) and
        # persist the RESOLVED frame: every downstream consumer — data
        # write, merge stats, field lineage, row images, stats fallback
        # — then references plain attributes instead of re-inlining the
        # per-column CASE trees (Catalyst's CollapseProject re-expands
        # non-cheap expressions per use site; at N payload columns ×
        # ~6 consumers that multiplied analysis+codegen fixed cost per
        # batch — measured ~2× merge-time overhead vs whole-row merge
        # on identical data before this layering)
        del_m = F.greatest(
            F.coalesce(F.col("_t_del"), F.lit(-1)), F.coalesce(F.col("_s_del"), F.lit(-1))
        )

        def resolved(c):
            t_al, s_al_ = F.col(f"_t_al_{c}"), F.col(f"_s_al_{c}")
            t_live = t_al.isNotNull() & (t_al > del_m)
            s_live = s_al_.isNotNull() & (s_al_ > del_m)
            take_s = s_live & (~F.coalesce(t_live, F.lit(False)) | (s_al_ >= t_al))
            new_al = F.when(take_s, s_al_).when(t_live, t_al)
            new_v = (
                F.when(take_s, F.col(f"_s_{c}"))
                .when(t_live, F.col(f"_t_{c}"))
                .otherwise(F.lit(None).cast(table_schema[c].dataType))
            )
            return new_v, new_al

        # same conditional-cache rule as merge(): persist only when the
        # sink append or the caller's change-image consumer re-reads j;
        # the lineage-off path's single write pass should not pay a
        # cache fill of every token array.  Explicit persist_join=True
        # transfers unpersist ownership to the caller (see merge()).
        caller_owns_join = persist_join is True
        if persist_join is None:
            persist_join = change_log_sink is not None
        j = t.join(s, t["_t_key"] == s["_s_key"], "full_outer").select(
            "*",
            *[resolved(c)[0].alias(f"_n_{c}") for c in payload_cols],
            *[resolved(c)[1].alias(f"_n_al_{c}") for c in payload_cols],
            F.when(del_m >= 0, del_m).alias("_n_del"),
        )
        if persist_join:
            j = j.persist()

        def _greatest(cols):
            return cols[0] if len(cols) == 1 else F.greatest(*cols)

        res = {c: (F.col(f"_n_{c}"), F.col(f"_n_al_{c}")) for c in payload_cols}
        new_del = F.col("_n_del")
        alsns = [F.coalesce(res[c][1], F.lit(-1)) for c in payload_cols]
        alive = _greatest(alsns) > F.lit(-1)
        row_lsn = _greatest([F.coalesce(new_del, F.lit(-1))] + alsns)

        changed = F.lit(False)
        for c in payload_cols:
            changed = changed | ~res[c][1].eqNullSafe(F.col(f"_t_al_{c}"))
        changed = changed | ~new_del.eqNullSafe(F.col("_t_del"))
        t_alive_before = F.col("_t_key").isNotNull() & ~F.col("_t_tomb")
        in_batch = F.col("_s_key").isNotNull()

        # merge stats ride the data write (same Observation shape as
        # merge(); fallback covers metrics-elided degenerate plans)
        from pyspark.sql import Observation

        stat_exprs = {
            "batch_rows": F.sum(F.when(in_batch, 1).otherwise(0)),
            "inserted": F.sum(F.when(in_batch & changed & ~t_alive_before & alive, 1).otherwise(0)),
            "updated": F.sum(F.when(in_batch & changed & t_alive_before & alive, 1).otherwise(0)),
            "deleted": F.sum(F.when(in_batch & changed & t_alive_before & ~alive, 1).otherwise(0)),
            "delete_noop": F.sum(F.when(in_batch & changed & ~t_alive_before & ~alive, 1).otherwise(0)),
            "skipped_stale": F.sum(F.when(in_batch & ~changed, 1).otherwise(0)),
        }
        obs = Observation(f"merge_attrs_v{snap['version'] + 1}")
        jo = j.observe(obs, *[e.alias(k) for k, e in stat_exprs.items()])

        merged = jo.select(
            F.coalesce(F.col("_t_key"), F.col("_s_key")).alias(key),
            F.coalesce(F.col("_t_bucket"), F.col("_s_bucket")).alias(BUCKET_COL),
            row_lsn.alias(LSN_COL),
            (~alive).alias(TOMBSTONE_COL),
            new_del.alias(DEL_LSN_COL),
            *[res[c][0].alias(c) for c in payload_cols],
            *[res[c][1].alias(alsn_col(c)) for c in payload_cols],
        )

        version = snap["version"] + 1
        ordered = (
            [key, LSN_COL, TOMBSTONE_COL, DEL_LSN_COL]
            + payload_cols
            + [alsn_col(c) for c in payload_cols]
        )
        new_files = self._write_data(
            merged.select(BUCKET_COL, *ordered),
            version,
            bucketed=True,
            with_blooms=self._bloom_enabled(snap),
        )
        files = carry_files + new_files

        # --- field-level lineage: one LONG row per (key, column) whose
        # assertion lsn moved — 'set' (new winning assertion, its value
        # and lsn) or 'unset' (killed by the delete watermark, lsn = the
        # watermark).  Values ride as strings so heterogeneous payload
        # types share one sink, like the reference's JSON images.
        # Atomic values cast (lossless both ways); container values are
        # JSON-encoded with to_json so EVERY container type — including
        # array<string>, whose plain cast renders unquoted elements —
        # round-trips exactly through from_json on the consumer side
        # (cdc/replicate._typed).
        def _log_str(col: Column, c: str) -> Column:
            if isinstance(table_schema[c].dataType, (ArrayType, MapType, StructType)):
                return F.to_json(col)
            return col.cast("string")

        per_attr = []
        for c in payload_cols:
            new_v, new_al = res[c]
            t_al = F.col(f"_t_al_{c}")
            per_attr.append(
                F.when(
                    ~new_al.eqNullSafe(t_al),
                    F.struct(
                        F.lit(c).alias("column"),
                        F.coalesce(new_al, new_del).alias("lsn"),
                        F.when(new_al.isNotNull(), F.lit("set"))
                        .otherwise(F.lit("unset"))
                        .alias("op_applied"),
                        F.when(t_al.isNotNull(), _log_str(F.col(f"_t_{c}"), c)).alias(
                            "before_value"
                        ),
                        _log_str(new_v, c).alias("after_value"),
                    ),
                )
            )
        attr_changes = (
            j.filter(in_batch)
            .select(
                F.coalesce(F.col("_t_key"), F.col("_s_key")).alias(key),
                F.explode(F.array_compact(F.array(*per_attr))).alias("_ch"),
            )
            .select(
                key,
                "_ch.column",
                "_ch.lsn",
                "_ch.op_applied",
                "_ch.before_value",
                "_ch.after_value",
            )
        )
        if change_log_extra:
            for k2, v2 in change_log_extra.items():
                attr_changes = attr_changes.withColumn(k2, F.lit(v2))
        if change_log_sink is not None:
            # same idempotence contract as merge(): the append precedes
            # this merge's commit; a redelivered batch re-derives
            # identical rows and the exact-batch-id repeat is skipped
            batch_id = (change_log_extra or {}).get("batch_id")
            last = (
                change_log_sink.props.get("last_batch_id")
                if batch_id is not None
                else None
            )
            if batch_id is None or last is None or batch_id != last:
                change_log_sink.append(
                    attr_changes,
                    operation="attr_change_log",
                    props={"last_batch_id": batch_id} if batch_id is not None else None,
                )

        # --- row-level before/after images (same shape as merge()'s
        # change_log) so rollup maintenance is mode-agnostic
        atomic_cols = [
            c
            for c in payload_cols
            if not isinstance(table_schema[c].dataType, (ArrayType, MapType, StructType))
        ]
        row_op = (
            F.when(~changed, F.lit("skipped_stale"))
            .when(~t_alive_before & alive, F.lit("insert"))
            .when(t_alive_before & alive, F.lit("update"))
            .when(t_alive_before & ~alive, F.lit("delete"))
            .otherwise(F.lit("delete_noop"))
        )
        row_images = j.filter(in_batch).select(
            F.coalesce(F.col("_t_key"), F.col("_s_key")).alias(key),
            row_lsn.alias("lsn"),
            row_op.alias("op_applied"),
            *[
                F.when(t_alive_before, F.col(f"_t_{c}")).alias(f"before_{c}")
                for c in atomic_cols
            ],
            *[F.when(alive, res[c][0]).alias(f"after_{c}") for c in atomic_cols],
        )
        # exhaustive + disjoint over in_batch rows: ~changed →
        # skipped_stale; changed × (alive_before, alive_after) → the
        # four outcome buckets (delete of an absent/tombstoned key that
        # advances the watermark counts as delete_noop, matching the
        # whole-row merge's semantics)
        try:
            stats_row = dict(obs.get)
        except Exception:
            stats_row = j.agg(
                *[e.alias(k) for k, e in stat_exprs.items()]
            ).collect()[0].asDict()
        if persist_join and not caller_owns_join:
            j.unpersist()

        summary = {
            "batch_rows": int(stats_row["batch_rows"] or 0),
            "inserted": int(stats_row["inserted"] or 0),
            "updated": int(stats_row["updated"] or 0),
            "deleted": int(stats_row["deleted"] or 0),
            "skipped_stale": int(stats_row["skipped_stale"] or 0),
            "rewritten_files": len(rewrite_files),
            "rewritten_rows": sum(int(f.rows or 0) for f in rewrite_files),
            "carried_files": len(carry_files),
        }
        self._bucket_policy_advice(snap, files, summary)
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in files],
                "operation": "merge_attrs",
                "summary": summary,
            },
        )
        return {
            "version": version,
            "inserted": int(stats_row["inserted"] or 0),
            "updated": int(stats_row["updated"] or 0),
            "deleted": int(stats_row["deleted"] or 0),
            "delete_noop": int(stats_row["delete_noop"] or 0),
            "skipped_stale": int(stats_row["skipped_stale"] or 0),
            "applied": int(
                (stats_row["inserted"] or 0)
                + (stats_row["updated"] or 0)
                + (stats_row["deleted"] or 0)
            ),
            "rewritten_files": len(rewrite_files),
            "carried_files": len(carry_files),
            "change_log": row_images,
            # see merge(): caller-owned cache handle when persist_join
            # was explicitly requested
            "persisted_join": j if caller_owns_join else None,
        }

    # ------------------------------------------------------------ overwrite
    def overwrite(
        self,
        df: DataFrame,
        operation: str = "overwrite",
        props: dict[str, Any] | None = None,
        cluster_files: int | None = None,
    ) -> int:
        """Replace all data (used by compaction and bulk loads).

        ``props`` entries are merged into the snapshot's props — e.g.
        derived tables record the source-table version they reflect, so
        a crash between source commit and derived commit is detectable.
        ``cluster_files`` (keyed tables only) range-clusters the output
        by (bucket, key) into that many sorted file splits — see
        :meth:`compact`'s ``cluster_by_key``.
        """
        snap = self.snapshot()
        version = snap["version"] + 1
        schema = StructType.fromJson(snap["schema"])
        key = snap["key_col"]
        if key is not None:
            df = df.withColumn(BUCKET_COL, bucket_expr(key, snap["bucket_count"]))
            ordered = [f.name for f in schema.fields]
            new_files = self._write_data(
            df.select(BUCKET_COL, *ordered),
            version,
            bucketed=True,
            with_blooms=self._bloom_enabled(snap),
            cluster_files=cluster_files,
        )
        else:
            if cluster_files:
                raise ValueError("cluster_files requires a keyed table")
            new_files = self._write_data(df.select([f.name for f in schema.fields]), version, bucketed=False)
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in new_files],
                "props": {**snap.get("props", {}), **(props or {})},
                "operation": operation,
                "summary": {},
            },
        )
        return version

    @property
    def props(self) -> dict[str, Any]:
        return self.snapshot().get("props", {})

    def set_props(self, props: dict[str, Any]) -> int:
        """Metadata-only commit merging ``props`` into the table props —
        the ALTER TABLE SET TBLPROPERTIES analogue (e.g. tune
        ``target_rows_per_bucket`` on a live table so the next merge's
        bucket advisory uses the new policy).  The file set is
        unchanged, so the commit qualifies for ``read_appends``."""
        snap = self.snapshot()
        version = snap["version"] + 1
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "props": {**snap.get("props", {}), **props},
                "operation": "set_props",
                "summary": {"set": sorted(props)},
            },
        )
        return version

    def vacuum(
        self, keep_versions: int = 2, min_age_seconds: float = 3600.0
    ) -> dict[str, int]:
        """Expire old snapshots and physically delete data files no
        retained snapshot references — the Iceberg
        expire_snapshots/remove_orphan_files analogue.  Keeps the last
        ``keep_versions`` snapshots (bounding time travel); never
        touches files any retained snapshot references.

        ``min_age_seconds`` is the concurrent-writer guard (Iceberg's
        remove_orphan_files ``older_than``): an in-flight merge writes
        its data files *before* committing its snapshot, so an
        unreferenced-but-young file may belong to a commit about to
        happen — deleting it would publish a snapshot referencing
        missing files.  Only unreferenced files whose mtime is older
        than the cutoff are removed; pass 0 only when the caller holds
        exclusive writer access.

        Safe relative to readers of retained versions only; like any
        lakehouse vacuum, concurrent readers of expired versions fail
        afterwards."""
        import time

        if keep_versions < 1:
            raise ValueError("vacuum keep_versions must be >= 1")
        cutoff = time.time() - min_age_seconds
        versions = sorted(
            int(fn[1:-5])
            for fn in os.listdir(self._snap_dir)
            if fn.startswith("v") and fn.endswith(".json")
        )
        retained = versions[-keep_versions:]
        expired = versions[: -keep_versions]
        referenced: set[str] = set()
        ref_blooms: set[str] = set()
        for v in retained:
            for f in self.snapshot(v)["files"]:
                referenced.add(f["path"])
                if f.get("bloom"):
                    ref_blooms.add(f["bloom"]["ref"])

        removed_snapshots = 0
        for v in expired:
            os.unlink(self._snap_path(v))
            removed_snapshots += 1

        removed_files = 0
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for commit in sorted(os.listdir(data_root)):
                cdir = os.path.join(data_root, commit)
                refs_in_dir = False
                young_in_dir = False
                unref: list[str] = []
                for dirpath, _dirs, files in os.walk(cdir):
                    for fn in files:
                        full = os.path.join(dirpath, fn)
                        rel = os.path.relpath(full, self.path)
                        if rel in referenced:
                            refs_in_dir = True
                        elif os.path.getmtime(full) > cutoff:
                            young_in_dir = True
                        elif fn.endswith(".parquet"):
                            unref.append(full)
                if not refs_in_dir and not young_in_dir:
                    removed_files += sum(
                        len(files) for _p, _d, files in os.walk(cdir)
                    )
                    shutil.rmtree(cdir)
                else:
                    for full in unref:
                        os.unlink(full)
                        removed_files += 1
        # bloom sidecars are snapshot metadata, not data files — sweep
        # the ones no retained snapshot references (same age guard: an
        # in-flight write creates sidecars before its commit)
        removed_blooms = 0
        blooms_root = os.path.join(self.path, "_meta", "blooms")
        if os.path.isdir(blooms_root):
            for fn in sorted(os.listdir(blooms_root)):
                rel = os.path.join("_meta", "blooms", fn)
                full = os.path.join(blooms_root, fn)
                if rel not in ref_blooms and os.path.getmtime(full) <= cutoff:
                    os.unlink(full)
                    _bloom_cache_evict(full)
                    removed_blooms += 1

        return {
            "removed_snapshots": removed_snapshots,
            "removed_files": removed_files,
            "removed_blooms": removed_blooms,
            "retained_versions": retained,
        }

    def rebucket(
        self,
        spark: SparkSession,
        new_bucket_count: int,
        cluster_by_key: bool = False,
        target_file_rows: int | None = None,
    ) -> int:
        """Rewrite the table into ``new_bucket_count`` hash buckets in
        ONE atomic commit (data files + the new bucket_count land in the
        same snapshot, so per-file bucket/min-max pruning is never
        inconsistent with the layout).  This is the rebucket path the
        merge-time policy check points at; like Iceberg's
        rewrite_data_files after a partition-spec change, it's an
        O(table) job the operator schedules, never an implicit side
        effect of a merge.

        ``cluster_by_key`` sort-orders the SAME rewrite (see
        :meth:`compact`): when both layout advisories are pending the
        one O(table) pass this job already is produces the clustered
        layout too — without it, a rebucket emits one full-range file
        per bucket and a following clustered sweep would rewrite the
        whole table a second time."""
        snap = self.snapshot()
        key = snap["key_col"]
        if key is None:
            raise ValueError("rebucket requires a keyed table")
        schema = StructType.fromJson(snap["schema"])
        df = self.read(spark, include_meta=True).withColumn(
            BUCKET_COL, bucket_expr(key, new_bucket_count)
        )
        version = snap["version"] + 1
        ordered = [f.name for f in schema.fields]
        new_files = self._write_data(
            df.select(BUCKET_COL, *ordered),
            version,
            bucketed=True,
            with_blooms=self._bloom_enabled(snap),
            cluster_files=(
                self._cluster_split_count(snap, target_file_rows)
                if cluster_by_key
                else None
            ),
        )
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "bucket_count": new_bucket_count,
                "files": [f.to_json() for f in new_files],
                "operation": "rebucket",
                "summary": {"from_buckets": snap["bucket_count"], "to_buckets": new_bucket_count},
            },
        )
        return version

    def compact_buckets(
        self,
        spark: SparkSession,
        max_files_per_bucket: int = 8,
        drop_tombstones: bool = False,
        cluster_by_key: bool = False,
        target_file_rows: int | None = None,
    ) -> dict[str, int]:
        """Selective small-file compaction: rewrite ONLY buckets whose
        file count exceeds ``max_files_per_bucket`` (copy-on-write
        merges append one file set per touched bucket per commit, so a
        hot bucket accumulates files); untouched buckets carry forward.
        This is the Iceberg rewrite_data_files(bin-pack) analogue — at
        100 TB a full-table compact() is an O(table) job, while this is
        O(hot buckets) and safe to run between merges.

        ``drop_tombstones`` defaults OFF here (unlike compact()):
        per-bucket GC of tombstones is only safe under the same
        no-more-stale-events watermark contract, and a routine
        small-file pass shouldn't silently change delete semantics.

        ``cluster_by_key`` key-sorts and range-splits the REWRITTEN
        buckets into ~``target_file_rows``-row disjoint-range files
        (see :meth:`compact`) — the natural pairing, since the hot
        buckets this pass touches are exactly the ones whose file
        ranges interleave.  In cluster mode a bucket also counts as hot
        when it holds an OVERSIZED file (rows > 2× the target): those
        fat full-range files are what the clustering advisory fires on,
        and they never trip the file-count test (often 1 file/bucket) —
        so the sweep stays O(offending buckets), never O(table)."""
        snap = self.snapshot()
        key = snap["key_col"]
        if key is None:
            raise ValueError("compact_buckets requires a keyed table")
        schema = StructType.fromJson(snap["schema"])
        all_files = [FileEntry.from_json(f) for f in snap["files"]]
        per_bucket: dict[int, int] = {}
        for f in all_files:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        hot = {b for b, n in per_bucket.items() if n > max_files_per_bucket}
        if cluster_by_key:
            fat = 2 * self._target_file_rows(snap, target_file_rows)
            hot |= {f.bucket for f in all_files if f.bucket != -1 and (f.rows or 0) > fat}
        if not hot:
            return {"compacted_buckets": 0, "rewritten_files": 0, "carried_files": len(all_files)}
        rewrite = [f for f in all_files if f.bucket in hot]
        carry = [f for f in all_files if f.bucket not in hot]
        cluster_files = (
            self._cluster_split_count(snap, target_file_rows, files=rewrite)
            if cluster_by_key
            else None
        )
        df = self._scan(spark, rewrite, schema).withColumn(
            BUCKET_COL, bucket_expr(key, snap["bucket_count"])
        )
        if drop_tombstones and TOMBSTONE_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        version = snap["version"] + 1
        ordered = [f.name for f in schema.fields]
        new_files = self._write_data(
            df.select(BUCKET_COL, *ordered),
            version,
            bucketed=True,
            with_blooms=self._bloom_enabled(snap),
            cluster_files=cluster_files,
        )
        self._commit(
            version,
            {
                **snap,
                "version": version,
                "parent": snap["version"],
                "files": [f.to_json() for f in carry + new_files],
                "operation": "compact_buckets",
                "summary": {
                    "compacted_buckets": len(hot),
                    "rewritten_files": len(rewrite),
                    "new_files": len(new_files),
                    "carried_files": len(carry),
                },
            },
        )
        return {
            "compacted_buckets": len(hot),
            "rewritten_files": len(rewrite),
            "carried_files": len(carry),
        }

    def compact(
        self,
        spark: SparkSession,
        drop_tombstones: bool = True,
        cluster_by_key: bool = False,
        target_file_rows: int | None = None,
    ) -> int:
        """Rewrite the table into one file-set per bucket; optionally GC
        tombstones (safe once no stale events older than any tombstone
        can still arrive — the stream's lsn high-watermark governs).

        ``cluster_by_key`` additionally key-sorts and range-splits the
        rewrite into ~``target_file_rows``-row files (default: the
        ``target_file_rows`` table prop, else 4,000,000) whose
        per-bucket key ranges are pairwise DISJOINT.  A 100 TB bucket
        is tens of GB — one file per bucket is both an oversized object
        and a full-bucket rewrite on every point-key merge; clustered,
        the range pruner touches ~1 file per key with no bloom
        sidecars needed (and where blooms ARE on, both tests tighten).
        The split count is sized driver-side from the manifest's footer
        row counts — no extra Spark job beyond repartitionByRange's
        sampling pass."""
        cluster_files = (
            self._cluster_split_count(self.snapshot(), target_file_rows)
            if cluster_by_key
            else None
        )
        df = self.read(spark, include_meta=True)
        if drop_tombstones and TOMBSTONE_COL in df.columns:
            df = df.filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        return self.overwrite(
            df.drop(BUCKET_COL), operation="compact", cluster_files=cluster_files
        )

    def _cluster_split_count(
        self,
        snap: dict[str, Any],
        target_file_rows: int | None,
        files: list[FileEntry] | None = None,
    ) -> int:
        """Range-split count for a clustered rewrite of ``files``
        (default: the whole snapshot), from manifest footer row counts.
        Tombstoned rows inflate the estimate slightly when the caller
        drops them — harmless (marginally smaller files)."""
        if snap["key_col"] is None:
            raise ValueError("cluster_by_key requires a keyed table")
        entries = (
            files
            if files is not None
            else [FileEntry.from_json(f) for f in snap["files"]]
        )
        total = sum(int(f.rows or 0) for f in entries)
        target = self._target_file_rows(snap, target_file_rows)
        return max(1, -(-total // target))

    @staticmethod
    def _target_file_rows(
        snap: dict[str, Any], override: int | None = None
    ) -> int:
        """Clustered-split sizing: explicit override, else the table's
        ``target_file_rows`` prop, else DEFAULT_TARGET_FILE_ROWS."""
        target = (
            int(override)
            if override is not None
            else int(
                snap.get("props", {}).get("target_file_rows", DEFAULT_TARGET_FILE_ROWS)
            )
        )
        if target <= 0:
            raise ValueError("target_file_rows must be positive")
        return target
