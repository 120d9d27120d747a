"""Export jobs — the read-path artifacts the reference ships: a
denormalized JSON export plus a zstd-Parquet mirror with column
sidecars, written atomically.

Reference semantics reproduced:
  * exporters read canonical state, scrub PII, serialize, and write
    ATOMICALLY (temp + fsync + rename)
    (/root/reference/src/core/logic/canonical_exporter.py:2003-2056;
    /root/reference/src/core/logic/atomic_io.py:16-41);
  * the Parquet mirror uses zstd compression and writes a
    ``.cols.json`` column sidecar per table
    (/root/reference/src/scripts/export_parquet.py:31-80);
  * PII scrubbing is an always-on projection hook applied before any
    sink (/root/reference/src/core/logic/pii_session_hook.py:21-44).

Spark shape: one DataFrame job per export; atomicity via the staging-
directory + atomic-rename pattern (the distributed analogue of the
reference's temp-file rename — Spark tasks write into the staging dir,
the driver renames it into place only after everything, including the
manifest, is durable).  The export pins the source table VERSION
(snapshot isolation): concurrent merges never tear an export."""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from horizon_etl_spark.tables.lake import LakeTable

_GC_AGE_SECONDS = 3600.0


def _gc_artifacts(art_root: str, out_dir: str, name: str) -> None:
    """Age-gated GC of crash leftovers and superseded artifacts.

    Safety rails (each closes a real deletion bug):
      * EXACT name match — ``^<name>-(legacy-)?[0-9a-f]{8}$`` or a
        ``.stage-`` dir — never the prefix-sharing artifacts of another
        export (exporting 'foo' must not sweep 'foo-bar-<hex>');
      * every CURRENT artifact is protected by realpath: the realpath
        of every symlink in ``out_dir`` is exempt, and candidates are
        compared by realpath too (symlinked out_dirs);
      * the mtime age gate (default 1h) protects a concurrently RUNNING
        exporter's stage AND gives readers that resolved the previous
        symlink a grace window before the superseded artifact goes away
        (no eager delete at publish time)."""
    cutoff = time.time() - _GC_AGE_SECONDS
    protected = set()
    for entry in os.listdir(out_dir):
        p = os.path.join(out_dir, entry)
        if os.path.islink(p):
            protected.add(os.path.realpath(p))
    pat = re.compile(r"^(?:\.stage-.+|%s-(?:legacy-)?[0-9a-f]{8})$" % re.escape(name))
    for d in os.listdir(art_root):
        full = os.path.join(art_root, d)
        if os.path.realpath(full) in protected:
            continue
        if pat.match(d) and os.path.getmtime(full) < cutoff:
            shutil.rmtree(full, ignore_errors=True)


def _publish(art_root: str, out_dir: str, name: str, stage: str) -> str:
    """Atomically publish a fully-written stage dir: rename it into the
    artifact container, then replace the ``out_dir/<name>`` SYMLINK in
    one os.rename — at every instant readers resolve either the
    complete old artifact or the complete new one.  The superseded
    artifact is intentionally left on disk for the next run's age-gated
    GC (readers mid-scan keep a grace window)."""
    artifact = os.path.join(art_root, f"{name}-{uuid.uuid4().hex[:8]}")
    os.rename(stage, artifact)
    link = os.path.join(out_dir, name)
    if os.path.exists(link) and not os.path.islink(link):
        # legacy plain-dir artifact from an older layout: move it aside
        os.rename(link, os.path.join(art_root, f"{name}-legacy-{uuid.uuid4().hex[:8]}"))
    tmp_link = os.path.join(out_dir, f".link-{uuid.uuid4().hex[:8]}")
    os.symlink(os.path.relpath(artifact, out_dir), tmp_link)
    os.rename(tmp_link, link)  # atomic replace of the previous symlink
    return link


def export_table(
    spark: SparkSession,
    table: LakeTable,
    out_dir: str,
    name: str,
    formats: tuple[str, ...] = ("json", "parquet"),
    scrub: Callable[[DataFrame], DataFrame] | None = None,
    version: int | None = None,
    sort_by: str | None = None,
) -> dict:
    """Write one export artifact set for ``table`` under
    ``out_dir/<name>``: JSONL (``json/``), zstd Parquet (``parquet/``),
    a ``<name>.cols.json`` column sidecar, and a ``manifest.json``
    recording the exported source version and row count.

    Atomic publish via symlink swap: the artifact is staged, renamed
    into the hidden ``.artifacts/`` container, and then the
    ``out_dir/<name>`` SYMLINK is replaced in one ``os.rename`` — at
    every instant readers resolve either the complete old artifact or
    the complete new one, never a torn or missing export (the previous
    two-rename scheme had a window with NO artifact present).  Crash
    leftovers (stage dirs, superseded artifacts) are GC'd by later
    runs with an mtime age gate so a concurrently RUNNING exporter's
    stage is never swept.

    ``sort_by``: deterministic file ordering for stable diffs (O1,
    canonical_exporter.py:989 ORDER BY id) — sorted WITHIN partitions
    (cheap) since the equality contract is order-insensitive.
    """
    v = table.current_version() if version is None else version
    df = table.read(spark, version=v)
    if scrub is not None:
        df = scrub(df)
    if sort_by is not None:
        df = df.sortWithinPartitions(sort_by)

    art_root = os.path.join(out_dir, ".artifacts")
    os.makedirs(art_root, exist_ok=True)
    _gc_artifacts(art_root, out_dir, name)

    stage = os.path.join(art_root, f".stage-{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    try:
        n_rows = _stage_write(
            spark,
            df,
            stage,
            name,
            formats,
            {"source_path": table.path, "source_version": v},
        )
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise

    link = _publish(art_root, out_dir, name, stage)
    return {"path": link, "version": v, "n_rows": n_rows}


def _stage_write(
    spark: SparkSession,
    df: DataFrame,
    stage: str,
    name: str,
    formats: tuple[str, ...],
    manifest_extra: dict,
) -> int:
    """Write one artifact set (data files + column sidecar + fsync'd
    manifest) into an already-created stage dir; returns the row count
    of the WRITTEN artifact (never a second run of the export pipeline,
    which doubles the job for json-only exports)."""
    if "parquet" in formats:
        df.write.option("compression", "zstd").parquet(os.path.join(stage, "parquet"))
    if "json" in formats:
        df.write.option("compression", "gzip").json(os.path.join(stage, "json"))
    # column sidecar (export_parquet.py .cols.json)
    cols = [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]
    with open(os.path.join(stage, f"{name}.cols.json"), "w") as fh:
        json.dump(cols, fh, indent=2)
    if "parquet" in formats:
        n_rows = spark.read.parquet(os.path.join(stage, "parquet")).count()
    else:
        n_rows = spark.read.json(os.path.join(stage, "json")).count()
    manifest = {
        "name": name,
        "formats": sorted(formats),
        "n_rows": n_rows,
        "columns": [c["name"] for c in cols],
        **manifest_extra,
    }
    mpath = os.path.join(stage, "manifest.json")
    with open(mpath, "w") as fh:
        json.dump(manifest, fh, indent=2)
        fh.flush()
        os.fsync(fh.fileno())
    return n_rows


def export_changes(
    spark: SparkSession,
    change_log: LakeTable,
    out_dir: str,
    name: str,
    formats: tuple[str, ...] = ("parquet",),
    scrub: Callable[[DataFrame], DataFrame] | None = None,
    target: LakeTable | None = None,
) -> dict:
    """Incremental (outbox) export of the change-log table: each run
    publishes exactly the change rows appended since the previous run's
    cursor as a NEW immutable artifact — the 100 TB answer to
    re-exporting a full table every cycle (the full export is O(table);
    this is O(new changes), file-set-derived via ``read_appends``, no
    full scan and no row diffing).

    Layout under ``out_dir``:
      * ``<name>_<from>_<to>`` — one immutable symlink per delta
        (underscored so the base name's GC pattern ``<name>-<hex8>``
        can never match it); consumers tail these in name order and may
        remove a link once consumed (the artifact then ages out).
      * ``<name>`` — cursor symlink to the LATEST delta; its manifest's
        ``to_version`` is the next run's ``from_version``.

    A run with no new appends publishes nothing and returns
    ``rows == 0`` with the cursor unchanged — so the job is safe on any
    schedule.  The authoritative cursor is the DELTA LINK SET itself
    (max ``to`` among ``<name>_<from>_<to>`` links), not the
    convenience symlink: a crash between delta publish and cursor
    update therefore cannot produce an overlapping next delta (the new
    delta is visible, so the next run starts after it), and re-running
    is idempotent.  If the change-log history was rewritten
    (``rollback_to_batch``), ``read_appends`` refuses the range and
    consumers must resync from a full export.

    Pass ``target`` (the primary table the change log describes) to
    embed its CURRENT schema in the delta manifest (``target_schema``)
    — the outbox's schema registry, same role as a Debezium envelope's
    schema block.  A replica consumer uses it to type and auto-evolve
    columns the primary added after the replica was created; without it
    the consumer hard-fails on assertions for unknown columns rather
    than dropping them silently (cdc/replicate.py).  The schema at
    export time always covers every column logged up to ``to_version``
    because the primary evolves its schema before logging the first
    assertion of a new column.

    Reference analogue: the weekly run re-exports canonical state in
    full (canonical_exporter.py:2003-2056); the outbox delta is the
    scale-path replacement this engine adds."""
    to_v = change_log.current_version()
    from_v = 1  # the table's "create" commit (empty file set)
    if os.path.isdir(out_dir):
        deltas = list_change_exports(out_dir, name)
        if deltas:
            from_v = max(int(d.rsplit("_", 1)[1]) for d in deltas)
    if to_v <= from_v:
        return {"path": None, "from_version": from_v, "to_version": from_v, "n_rows": 0}

    df = change_log.read_appends(spark, from_v, to_v)
    if scrub is not None:
        df = scrub(df)

    art_root = os.path.join(out_dir, ".artifacts")
    os.makedirs(art_root, exist_ok=True)
    delta_name = f"{name}_{from_v:08d}_{to_v:08d}"
    _gc_artifacts(art_root, out_dir, delta_name)

    stage = os.path.join(art_root, f".stage-{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    try:
        n_rows = _stage_write(
            spark,
            df,
            stage,
            delta_name,
            formats,
            {
                "kind": "changes",
                "source_path": change_log.path,
                "from_version": from_v,
                "to_version": to_v,
                **(
                    {"target_schema": target.schema().jsonValue()}
                    if target is not None
                    else {}
                ),
            },
        )
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise

    link = _publish(art_root, out_dir, delta_name, stage)
    # advance the cursor: point the base-name symlink at the same
    # artifact (atomic replace, same pattern as _publish)
    cursor = os.path.join(out_dir, name)
    tmp_link = os.path.join(out_dir, f".link-{uuid.uuid4().hex[:8]}")
    os.symlink(os.path.relpath(os.path.realpath(link), out_dir), tmp_link)
    os.rename(tmp_link, cursor)
    return {"path": link, "from_version": from_v, "to_version": to_v, "n_rows": n_rows}


def list_change_exports(out_dir: str, name: str) -> list[str]:
    """Delta artifact names under ``out_dir`` for ``name``, in
    version order (the consumer's tail order)."""
    pat = re.compile(r"^%s_\d{8}_\d{8}$" % re.escape(name))
    return sorted(d for d in os.listdir(out_dir) if pat.match(d))


def export_filtered_views(
    spark: SparkSession,
    table: LakeTable,
    out_dir: str,
    base_name: str,
    column: str,
    values: list,
    **kwargs,
) -> dict:
    """P7 classification-filter views: one export artifact per
    classification value (the reference ships 4 filtered exports by
    ``classification``, /root/reference/src/core/logic/
    canonical_exporter.py:378-392,65-70).  Every view pins the SAME
    source version, so the view set is a consistent partition of one
    snapshot even while merges land concurrently."""
    from pyspark.sql import functions as F

    v = table.current_version()
    scrub = kwargs.pop("scrub", None)
    results = {}
    for val in values:

        def view_filter(df, _val=val, _scrub=scrub):
            out = df.filter(F.col(column) == _val)
            return _scrub(out) if _scrub is not None else out

        results[val] = export_table(
            spark,
            table,
            out_dir,
            f"{base_name}_{val}",
            scrub=view_filter,
            version=v,
            **kwargs,
        )
    return results


def export_graph(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    name: str,
    source_version: int | None = None,
    extra_manifest: dict | None = None,
) -> dict:
    """Graph-shaped export artifact: the graph split into ``nodes/``
    and ``edges/`` zstd-Parquet tables with per-table ``.cols.json``
    sidecars and one manifest — the reference's graph export splits
    each NetworkX graph into exactly this nodes/edges Parquet pair
    (/root/reference/src/scripts/export_parquet.py:31-80).

    Published with the same staged-artifact + symlink-swap atomicity as
    ``export_table``: readers always see a CONSISTENT (nodes, edges)
    pair — never nodes from one version with edges from another.
    ``source_version`` pins the snapshot the caller derived the graph
    from (recorded in the manifest for lineage)."""
    art_root = os.path.join(out_dir, ".artifacts")
    os.makedirs(art_root, exist_ok=True)
    _gc_artifacts(art_root, out_dir, name)

    stage = os.path.join(art_root, f".stage-{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    try:
        counts = {}
        for part, df in (("nodes", nodes), ("edges", edges)):
            df.write.option("compression", "zstd").parquet(os.path.join(stage, part))
            cols = [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in df.schema.fields
            ]
            with open(os.path.join(stage, f"{part}.cols.json"), "w") as fh:
                json.dump(cols, fh, indent=2)
            counts[part] = spark.read.parquet(os.path.join(stage, part)).count()
        manifest = {
            "name": name,
            "kind": "graph",
            "source_version": source_version,
            "n_nodes": counts["nodes"],
            "n_edges": counts["edges"],
            "node_columns": nodes.columns,
            "edge_columns": edges.columns,
            **(extra_manifest or {}),
        }
        with open(os.path.join(stage, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
            fh.flush()
            os.fsync(fh.fileno())
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise

    link = _publish(art_root, out_dir, name, stage)
    return {"path": link, "n_nodes": counts["nodes"], "n_edges": counts["edges"]}


def _copy_stream(src, dest, chunk: int = 1 << 20) -> int:
    """shutil.copyfileobj with a byte count (for the bundle manifest)."""
    n = 0
    while True:
        buf = src.read(chunk)
        if not buf:
            return n
        dest.write(buf)
        n += len(buf)


def bundle_exports(
    out_dir: str,
    zip_name: str = "exports_bundle.zip",
    include_names: list[str] | None = None,
) -> dict:
    """K4 zip bundler: one download-style .zip of the PUBLISHED export
    artifacts under ``out_dir`` (reference: the export flow ends by
    zipping the whole export dir atomically —
    /root/reference/src/flows/exports/canonical_data.py:273-295 tmp-zip
    + os.replace, self-skip; plus the standalone bundler
    /root/reference/src/scripts/zip_exports.py:46-50).

    Engine specifics: only the published artifact names are walked
    (symlinks resolve to the live artifact — ``.artifacts`` internals,
    stage dirs, and superseded generations never leak into the bundle),
    entries are sorted and timestamps pinned, so the bundle is
    BYTE-REPRODUCIBLE for identical artifact content (same trick as
    tools/make_pyfiles.py); the write is atomic (tmp + rename) and the
    bundle skips itself.  This is a driver-side consumer convenience —
    O(artifact bytes), never a Spark job."""
    import zipfile

    fixed = (1980, 1, 1, 0, 0, 0)
    names = include_names or sorted(
        n
        for n in os.listdir(out_dir)
        if not n.startswith(".") and n != zip_name and n != f"{zip_name}.tmp"
        and os.path.isdir(os.path.join(out_dir, n))
    )
    zip_path = os.path.join(out_dir, zip_name)
    tmp = zip_path + ".tmp"
    n_files, total = 0, 0
    try:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as zf:
            for name in names:
                base = os.path.join(out_dir, name)
                for root, dirs, files in os.walk(base, followlinks=True):
                    dirs.sort()
                    for fn in sorted(files):
                        if fn.startswith("."):  # hadoop .crc noise
                            continue
                        fpath = os.path.join(root, fn)
                        arc = os.path.join(name, os.path.relpath(fpath, base))
                        info = zipfile.ZipInfo(
                            arc.replace(os.sep, "/"), date_time=fixed
                        )
                        info.compress_type = zipfile.ZIP_DEFLATED
                        info.external_attr = 0o644 << 16
                        # stream, don't slurp: driver memory stays
                        # O(1 MiB chunk) however large the biggest
                        # artifact is; ZipInfo is pre-pinned so the
                        # bundle stays byte-reproducible.  file_size is
                        # declared so members > ZIP64_LIMIT (2 GiB) get
                        # zip64 headers (zf.open computes the flag from
                        # it; leaving it unset raises at member close)
                        info.file_size = os.path.getsize(fpath)
                        with open(fpath, "rb") as fh, zf.open(info, "w") as dest:
                            total += _copy_stream(fh, dest)
                        n_files += 1
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    os.replace(tmp, zip_path)
    return {
        "path": zip_path,
        "names": names,
        "n_files": n_files,
        "bytes_in": total,
        "bytes_zip": os.path.getsize(zip_path),
    }


def read_export(spark: SparkSession, out_dir: str, name: str, fmt: str = "parquet") -> DataFrame:
    path = os.path.join(out_dir, name, fmt)
    return spark.read.parquet(path) if fmt == "parquet" else spark.read.json(path)


def export_manifest(out_dir: str, name: str) -> dict:
    with open(os.path.join(out_dir, name, "manifest.json")) as fh:
        return json.load(fh)
