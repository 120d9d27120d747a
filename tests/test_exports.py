"""Export job (K1/K3): atomic artifact set round-trips table state."""

import json
import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, replay
from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.exports import export_manifest, export_table, read_export


def _sorted_rows(df, cols=("doc_id", "n_tok", "source")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_export_round_trips_table_state(spark, tmp_table_dir):
    feed = change_feed(spark, 2000, 150, seed=21, num_batches=2, max_len=16)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    replay(pipe, feed)
    out = os.path.join(tmp_table_dir, "exports")

    res = export_table(spark, pipe.target, out, "target", sort_by="doc_id")
    assert res["version"] == pipe.target.current_version()

    state = pipe.target.read(spark)
    pq = read_export(spark, out, "target", "parquet")
    js = read_export(spark, out, "target", "json")
    assert _sorted_rows(pq) == _sorted_rows(state)
    # json round-trip: tokens survive as arrays (compare full payload)
    assert sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"]) for r in js.collect()
    ) == sorted((r["doc_id"], tuple(r["tokens"] or []), r["n_tok"]) for r in state.collect())

    man = export_manifest(out, "target")
    assert man["source_version"] == res["version"]
    assert man["n_rows"] == state.count()
    sidecar = json.load(open(os.path.join(out, "target", "target.cols.json")))
    assert [c["name"] for c in sidecar] == state.columns


def test_filtered_views_partition_one_snapshot(spark, tmp_table_dir):
    """P7: per-classification view exports are a consistent partition
    of a single pinned snapshot."""
    from horizon_etl_spark.exports import export_filtered_views

    feed = change_feed(spark, 1500, 120, seed=23, num_batches=1, max_len=8)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    replay(pipe, feed)
    out = os.path.join(tmp_table_dir, "exports")
    sources = [r["source"] for r in pipe.target.read(spark).select("source").distinct().collect()]

    res = export_filtered_views(
        spark, pipe.target, out, "by_source", "source", sources, formats=("parquet",)
    )
    assert set(res) == set(sources)
    total = 0
    for s in sources:
        df = read_export(spark, out, f"by_source_{s}", "parquet")
        assert df.filter(F.col("source") != s).count() == 0
        total += df.count()
    assert total == pipe.target.read(spark).count()


def test_export_scrub_hook_and_atomic_replace(spark, tmp_table_dir):
    feed = change_feed(spark, 1000, 80, seed=22, num_batches=1, max_len=8)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    replay(pipe, feed)
    out = os.path.join(tmp_table_dir, "exports")

    def scrub(df):  # always-on PII projection before any sink
        return df.withColumn(
            "doc_id",
            F.concat(F.lit("LGPD-"), F.substring(F.sha2(F.col("doc_id"), 256), 1, 16)),
        )

    export_table(spark, pipe.target, out, "target", scrub=scrub)
    pq = read_export(spark, out, "target", "parquet")
    assert pq.filter(~F.col("doc_id").startswith("LGPD-")).count() == 0
    assert os.path.islink(os.path.join(out, "target")), "publish is a symlink swap"

    # abandoned stage dirs from a "crashed" exporter: a YOUNG one (a
    # possibly-live concurrent exporter) must survive GC; an OLD one is
    # swept. Re-export atomically replaces the artifact either way.
    art = os.path.join(out, ".artifacts")
    young = os.path.join(art, ".stage-young")
    old_stage = os.path.join(art, ".stage-old")
    os.makedirs(young)
    os.makedirs(old_stage)
    os.utime(old_stage, (1, 1))
    prev_target = os.path.realpath(os.path.join(out, "target"))
    export_table(spark, pipe.target, out, "target")  # unscrubbed now
    pq2 = read_export(spark, out, "target", "parquet")
    assert pq2.filter(F.col("doc_id").startswith("LGPD-")).count() == 0
    assert os.path.isdir(young), "age gate must protect live stages"
    assert not os.path.isdir(old_stage), "old crashed stages are swept"
    # the SUPERSEDED artifact survives the publish (grace window for
    # readers that resolved the old symlink moments earlier) ...
    assert os.path.isdir(prev_target), "no eager delete of the old artifact"
    targets = [d for d in os.listdir(art) if d.startswith("target-")]
    assert len(targets) == 2
    # ... and is swept by the NEXT run once past the age gate
    os.utime(prev_target, (1, 1))
    export_table(spark, pipe.target, out, "target")
    assert not os.path.isdir(prev_target), "aged superseded artifact is GC'd"


def test_gc_never_sweeps_prefix_sharing_or_current_artifacts(spark, tmp_table_dir):
    """Exporting 'foo' must never sweep artifacts of 'foo-bar' (exact
    name-regex match) nor any artifact a symlink currently points to
    (realpath protection), however old they are."""
    feed = change_feed(spark, 500, 40, seed=25, num_batches=1, max_len=8)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    replay(pipe, feed)
    out = os.path.join(tmp_table_dir, "exports")
    export_table(spark, pipe.target, out, "foo-bar", formats=("parquet",))
    export_table(spark, pipe.target, out, "foo", formats=("parquet",))
    art = os.path.join(out, ".artifacts")
    other = os.path.realpath(os.path.join(out, "foo-bar"))
    mine = os.path.realpath(os.path.join(out, "foo"))
    os.utime(other, (1, 1))
    os.utime(mine, (1, 1))
    export_table(spark, pipe.target, out, "foo", formats=("parquet",))
    assert os.path.isdir(other), "prefix-sharing export must survive GC"
    assert read_export(spark, out, "foo-bar", "parquet").count() > 0
    # 'mine' was current at GC time (symlink realpath) → protected even aged
    assert os.path.isdir(mine)


def test_graph_export_round_trips_nodes_and_edges(spark, tmp_table_dir):
    """Graph artifact (reference export_parquet.py:31-80 nodes/edges
    split): the published pair round-trips the query output and the
    manifest pins counts + source version."""
    from horizon_etl_spark.exports import export_graph, export_manifest
    from horizon_etl_spark.queries.relational import cosupply_edges

    sf_dir = "/root/testdata/sf0.001"
    edges = cosupply_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("sa").alias("supp"), "w")
        .unionByName(edges.select(F.col("sb").alias("supp"), "w"))
        .groupBy("supp")
        .agg(F.count(F.lit(1)).alias("degree"), F.sum("w").alias("weighted_degree"))
    )
    out = os.path.join(tmp_table_dir, "exports")
    res = export_graph(spark, nodes, edges, out, "cosupply", source_version=7)

    link = os.path.join(out, "cosupply")
    assert os.path.islink(link), "graph publish is the same symlink swap"
    got_nodes = spark.read.parquet(os.path.join(link, "nodes"))
    got_edges = spark.read.parquet(os.path.join(link, "edges"))
    assert sorted(map(tuple, got_edges.collect())) == sorted(map(tuple, edges.collect()))
    assert sorted(map(tuple, got_nodes.collect())) == sorted(map(tuple, nodes.collect()))
    man = export_manifest(out, "cosupply")
    assert man["kind"] == "graph" and man["source_version"] == 7
    assert man["n_nodes"] == res["n_nodes"] == nodes.count()
    assert man["n_edges"] == res["n_edges"] == edges.count()
    # edge endpoints all resolve to exported nodes (consistent pair)
    sa = got_edges.select(F.col("sa").alias("supp")).unionByName(
        got_edges.select(F.col("sb").alias("supp"))
    )
    assert sa.join(got_nodes, "supp", "left_anti").count() == 0


def test_incremental_change_export_outbox(spark, tmp_table_dir):
    """export_changes publishes exactly the change rows appended since
    the previous cursor; deltas are immutable, union == full log,
    no-new-appends runs are no-ops."""
    from horizon_etl_spark.cdc.apply import apply_batch
    from horizon_etl_spark.exports import export_changes, list_change_exports

    feed = change_feed(spark, 2000, 150, seed=29, num_batches=3, max_len=8)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    out = os.path.join(tmp_table_dir, "exports")

    apply_batch(pipe, feed.filter(F.col("batch") == 0).drop("batch"), batch_id=0)
    d1 = export_changes(spark, pipe.change_log, out, "changes", formats=("parquet",))
    assert d1["from_version"] == 1 and d1["n_rows"] > 0
    log_rows_1 = pipe.change_log.read(spark).count()
    assert d1["n_rows"] == log_rows_1

    # no new appends → no-op, cursor unchanged, nothing published
    noop = export_changes(spark, pipe.change_log, out, "changes")
    assert noop["n_rows"] == 0 and noop["path"] is None
    assert noop["from_version"] == d1["to_version"]

    apply_batch(pipe, feed.filter(F.col("batch") == 1).drop("batch"), batch_id=1)
    apply_batch(pipe, feed.filter(F.col("batch") == 2).drop("batch"), batch_id=2)
    d2 = export_changes(spark, pipe.change_log, out, "changes", formats=("parquet",))
    assert d2["from_version"] == d1["to_version"]
    full = pipe.change_log.read(spark).count()
    assert d1["n_rows"] + d2["n_rows"] == full

    # deltas are separately listed, individually readable, and their
    # union is the full change log
    deltas = list_change_exports(out, "changes")
    assert len(deltas) == 2
    got = None
    for name in deltas:
        part = read_export(spark, out, name, "parquet")
        got = part if got is None else got.unionByName(part)
    assert got.count() == full
    assert got.exceptAll(pipe.change_log.read(spark)).count() == 0

    # cursor symlink resolves to the latest delta's manifest
    man = export_manifest(out, "changes")
    assert man["kind"] == "changes"
    assert man["to_version"] == d2["to_version"]


def test_change_export_cursor_survives_lost_cursor_link(spark, tmp_table_dir):
    """Crash window between delta publish and cursor-symlink update:
    the authoritative cursor is the delta link set, so the next run
    starts AFTER the published delta — never an overlapping range."""
    from horizon_etl_spark.cdc.apply import apply_batch
    from horizon_etl_spark.exports import export_changes, list_change_exports

    feed = change_feed(spark, 1500, 120, seed=37, num_batches=2, max_len=8)
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    out = os.path.join(tmp_table_dir, "exports")

    apply_batch(pipe, feed.filter(F.col("batch") == 0).drop("batch"), batch_id=0)
    d1 = export_changes(spark, pipe.change_log, out, "changes")
    # simulate the crash: delta link published, cursor link lost
    os.unlink(os.path.join(out, "changes"))

    apply_batch(pipe, feed.filter(F.col("batch") == 1).drop("batch"), batch_id=1)
    d2 = export_changes(spark, pipe.change_log, out, "changes")
    assert d2["from_version"] == d1["to_version"]  # no overlap
    assert d1["n_rows"] + d2["n_rows"] == pipe.change_log.read(spark).count()
    assert len(list_change_exports(out, "changes")) == 2


def test_bundle_exports_zip(spark, tmp_table_dir):
    """K4 zip bundler: one atomic .zip of the published artifacts —
    symlinks resolve to live content, .artifacts internals never leak,
    the bundle skips itself, members read back byte-equal, and a
    rebuild over unchanged artifacts is BYTE-IDENTICAL (pinned
    timestamps + sorted entries)."""
    import hashlib
    import os
    import zipfile

    from pyspark.sql import functions as F

    from horizon_etl_spark.cdc import schema as S
    from horizon_etl_spark.cdc.generator import change_feed
    from horizon_etl_spark.cdc.lww import lww_reduce
    from horizon_etl_spark.exports import bundle_exports, export_table
    from horizon_etl_spark.tables.lake import LakeTable

    t = LakeTable.create(
        os.path.join(tmp_table_dir, "t"), S.TARGET_SCHEMA, key_col="doc_id", bucket_count=4
    )
    feed = change_feed(spark, 1500, 100, seed=11, num_batches=1, max_len=8)
    t.merge(lww_reduce(feed.drop("batch", "ts")))
    out = os.path.join(tmp_table_dir, "exports")
    export_table(spark, t, out, "target", formats=("parquet", "json"))

    b1 = bundle_exports(out)
    assert b1["names"] == ["target"] and b1["n_files"] > 0
    with zipfile.ZipFile(b1["path"]) as zf:
        members = zf.namelist()
        assert any(m.startswith("target/parquet/") for m in members)
        assert all(".artifacts" not in m for m in members)
        assert "exports_bundle.zip" not in members
        # spot-check byte equality through the symlink
        probe = next(m for m in members if m.endswith("manifest.json"))
        on_disk = open(os.path.join(out, probe), "rb").read()
        assert zf.read(probe) == on_disk

    h1 = hashlib.sha256(open(b1["path"], "rb").read()).hexdigest()
    b2 = bundle_exports(out)
    h2 = hashlib.sha256(open(b2["path"], "rb").read()).hexdigest()
    assert h1 == h2  # byte-reproducible rebuild

    # a second artifact generation changes the bundle
    t.merge(lww_reduce(feed.drop("batch", "ts").withColumn("lsn", F.col("lsn") + 10_000)))
    export_table(spark, t, out, "target", formats=("parquet",))
    b3 = bundle_exports(out)
    h3 = hashlib.sha256(open(b3["path"], "rb").read()).hexdigest()
    assert h3 != h1
