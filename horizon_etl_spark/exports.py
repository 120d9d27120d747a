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
        # count the WRITTEN artifact (never a second run of the export
        # pipeline, which doubles the job for json-only exports)
        if "parquet" in formats:
            n_rows = spark.read.parquet(os.path.join(stage, "parquet")).count()
        else:
            n_rows = spark.read.json(os.path.join(stage, "json")).count()
        manifest = {
            "name": name,
            "source_path": table.path,
            "source_version": v,
            "formats": sorted(formats),
            "n_rows": n_rows,
            "columns": [c["name"] for c in cols],
        }
        mpath = os.path.join(stage, "manifest.json")
        with open(mpath, "w") as fh:
            json.dump(manifest, fh, indent=2)
            fh.flush()
            os.fsync(fh.fileno())
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise

    link = _publish(art_root, out_dir, name, stage)
    return {"path": link, "version": v, "n_rows": n_rows}


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


def read_export(spark: SparkSession, out_dir: str, name: str, fmt: str = "parquet") -> DataFrame:
    path = os.path.join(out_dir, name, fmt)
    return spark.read.parquet(path) if fmt == "parquet" else spark.read.json(path)


def export_manifest(out_dir: str, name: str) -> dict:
    with open(os.path.join(out_dir, name, "manifest.json")) as fh:
        return json.load(fh)
