"""Quarantine reprocess/repair path: after an operator fix, quarantined
rows re-validate and apply; still-invalid rows stay quarantined."""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline, apply_batch, reprocess_quarantine


def _feed(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, doc_id string, lsn long, tokens array<int>, n_tok int, "
        "source string, ts timestamp",
    )


def test_reprocess_after_whitelist_widening(spark, tmp_table_dir):
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    rows = [
        ("insert", "a", 1, [1], 1, "wiki", None),       # valid
        ("insert", "b", 2, [2], 1, "forum", None),      # bad_source (for now)
        ("insert", "c", 3, [3], 1, "forum", None),      # bad_source
        ("insert", "d", None, [4], 1, "wiki", None),    # null_lsn — unfixable
    ]
    apply_batch(pipe, _feed(spark, rows), batch_id=0)
    assert {r["doc_id"] for r in pipe.target.read(spark).collect()} == {"a"}
    assert pipe.quarantine.read(spark).count() == 3

    # operator adds 'forum' to the whitelist and reprocesses
    run = reprocess_quarantine(
        pipe, spark, batch_id=100,
        whitelist=("books", "code", "crawl", "wiki", "forum"),
    )
    assert run["applied"] == 2 and run["quarantined"] == 1
    assert {r["doc_id"] for r in pipe.target.read(spark).collect()} == {"a", "b", "c"}
    q = pipe.quarantine.read(spark).collect()
    assert len(q) == 1 and q[0]["doc_id"] == "d" and q[0]["reason"] == "null_lsn"
    assert q[0]["batch_id"] == 100  # consumed rows dropped, residue re-tagged

    # crash-window idempotence: re-running the same reprocess is a no-op
    run2 = reprocess_quarantine(
        pipe, spark, batch_id=101,
        whitelist=("books", "code", "crawl", "wiki", "forum"),
    )
    assert run2["applied"] == 0 and run2["quarantined"] == 1
    assert pipe.quarantine.read(spark).count() == 1
    assert pipe.target.read(spark).count() == 3


def test_reprocess_crash_residue_does_not_duplicate(spark, tmp_table_dir):
    """Crash window between the reprocess apply (which appends residue
    under the fresh batch_id) and the quarantine overwrite: the table
    briefly holds old rows + residue copies.  The next reprocess must
    NOT double the residue — the feed is deduped on (doc_id, lsn)."""
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    rows = [
        ("insert", "d", None, [4], 1, "wiki", None),  # null_lsn — unfixable
        ("insert", "e", 5, [5], 1, "forum", None),    # bad_source — unfixable here
    ]
    apply_batch(pipe, _feed(spark, rows), batch_id=0)
    assert pipe.quarantine.read(spark).count() == 2

    # simulate the crash: run the apply stage of a reprocess (residue
    # re-appended under batch 100) but SKIP the overwrite — exactly the
    # state reprocess_quarantine leaves if it dies mid-way
    feed = pipe.quarantine.read(spark).drop("reason", "batch_id")
    apply_batch(pipe, feed, batch_id=100, collect_metrics=False, with_change_log=False)
    assert pipe.quarantine.read(spark).count() == 4, "crash residue present"

    run = reprocess_quarantine(pipe, spark, batch_id=101)
    assert run["quarantined"] == 2, "deduped feed re-quarantines each row once"
    q = pipe.quarantine.read(spark).collect()
    assert len(q) == 2
    assert {r["doc_id"] for r in q} == {"d", "e"}
    assert all(r["batch_id"] == 101 for r in q)


def test_reprocess_empty_quarantine_is_noop(spark, tmp_table_dir):
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=4)
    v = pipe.quarantine.current_version()
    assert reprocess_quarantine(pipe, spark, batch_id=1) is None
    assert pipe.quarantine.current_version() == v
