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
    export_table(spark, pipe.target, out, "target")  # unscrubbed now
    pq2 = read_export(spark, out, "target", "parquet")
    assert pq2.filter(F.col("doc_id").startswith("LGPD-")).count() == 0
    assert os.path.isdir(young), "age gate must protect live stages"
    assert not os.path.isdir(old_stage), "old crashed stages are swept"
    # superseded artifact was GC'd: only the current target (+ young stage) remain
    targets = [d for d in os.listdir(art) if d.startswith("target-")]
    assert len(targets) == 1
