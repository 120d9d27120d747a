"""Binary .xlsx ingestion (SURVEY §2 S1) — stdlib OOXML reader,
distributed via binaryFile + mapInPandas.

The reference ingests uploaded Excel workbooks row-by-row with
``pd.read_excel`` (project_loader.py:79-93); these tests prove the
engine does the same over REAL binary workbooks end-to-end: writer →
zip-of-XML on disk → streaming ingest → CDC kernel → oracle-equal
final state.
"""

import os

from pyspark.sql import functions as F

from horizon_etl_spark.cdc.apply import CdcPipeline
from horizon_etl_spark.cdc.schema import CHANGE_FEED_SCHEMA
from horizon_etl_spark.cdc.generator import change_feed
from horizon_etl_spark.cdc.oracle import assert_frames_equal, expected_final
from horizon_etl_spark.sources.xlsx import iter_records, parse_xlsx, write_xlsx, xlsx_feed
from horizon_etl_spark.streaming.runner import run_stream


# ------------------------------------------------------------- parser unit


def test_parser_handles_cell_types_and_gaps(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["name", "qty", "ok", "note"],
        [
            ["wid<g&et>", 3, True, "a b"],   # escaping + int + bool
            [None, 1.5, False, None],        # leading gap + float
            [None, None, None, None],        # blank spacer row dropped
            ["tail", None, None, "end"],     # interior gaps
        ],
    )
    recs = list(iter_records(open(p, "rb").read()))
    assert recs == [
        {"name": "wid<g&et>", "qty": "3", "ok": "true", "note": "a b"},
        {"name": None, "qty": "1.5", "ok": "false", "note": None},
        {"name": "tail", "qty": None, "ok": None, "note": "end"},
    ]


def test_parser_shared_strings_variant(tmp_path):
    """t="s" cells resolve through xl/sharedStrings.xml — the layout
    real Excel/openpyxl produce (the inline-string writer default is
    the layout pandas/xlsxwriter produce; both must read back)."""
    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["a", "b"], [["x", "y"], ["y", "x"]], use_shared_strings=True)
    rows = parse_xlsx(open(p, "rb").read())
    assert rows == [["a", "b"], ["x", "y"], ["y", "x"]]


def test_parser_empty_sheet(tmp_path):
    p = str(tmp_path / "e.xlsx")
    write_xlsx(p, ["a"], [])
    assert list(iter_records(open(p, "rb").read())) == []


# ----------------------------------------------------------- spark decode


def test_batch_feed_decodes_types_and_serial_dates(spark, tmp_path):
    """Header-name column matching (file may reorder columns), arrays
    from space-joined text, timestamps from ISO strings OR Excel serial
    day numbers, malformed cells -> null (not an ANSI abort)."""
    # columns deliberately NOT in feed-schema order; extra col ignored
    write_xlsx(
        str(tmp_path / "a.xlsx"),
        ["doc_id", "lsn", "op", "source", "tokens_txt", "n_tok", "ts", "junk"],
        [
            ["a", 1, "insert", "wiki", "1 2 3", 3, "2024-01-02T03:04:05", "x"],
            ["b", 2, "update", "books", None, None, 45292.5, None],  # serial noon
            ["c", "NaN", "delete", None, None, None, "not-a-date", None],
        ],
    )
    out = {
        r["doc_id"]: r
        for r in xlsx_feed(
            spark, str(tmp_path), CHANGE_FEED_SCHEMA, streaming=False
        ).collect()
    }
    assert out["a"]["tokens"] == [1, 2, 3] and out["a"]["n_tok"] == 3
    assert str(out["a"]["ts"]) == "2024-01-02 03:04:05"
    # 45292 days after 1899-12-30 = 2024-01-01; .5 = 12:00
    assert str(out["b"]["ts"]) == "2024-01-01 12:00:00"
    assert out["b"]["tokens"] is None
    # malformed lsn / ts -> null, row survives for the quarantine path
    assert out["c"]["lsn"] is None and out["c"]["ts"] is None


# ------------------------------------------------------------- end-to-end


def test_stream_xlsx_workbook_drops_match_oracle(spark, tmp_table_dir):
    """Real binary workbooks dropped into a directory, tailed by the
    stream, applied by the CDC kernel — final state oracle-equal (the
    reference's upload-a-spreadsheet batch model, project_loader.py)."""
    feed = change_feed(spark, 1500, 80, seed=29, num_batches=2, min_len=2, max_len=8)
    rows = feed.withColumn("tokens_txt", F.array_join("tokens", " ")).select(
        "op", "doc_id", "lsn", "tokens_txt", "n_tok", "source",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"), "batch",
    ).collect()
    src = os.path.join(tmp_table_dir, "drops")
    os.makedirs(src)
    header = ["op", "doc_id", "lsn", "tokens_txt", "n_tok", "source", "ts"]
    for b in [0, 1]:
        write_xlsx(
            os.path.join(src, f"batch{b}.xlsx"),
            header,
            [[r[h] for h in header] for r in rows if r["batch"] == b],
            use_shared_strings=(b == 1),  # exercise both layouts
        )
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    run_stream(
        spark, pipe, src, os.path.join(tmp_table_dir, "ckpt"),
        max_files_per_trigger=1, feed_format="xlsx",
    )
    assert_frames_equal(pipe.target.read(spark), expected_final(feed))


def test_stream_contains_corrupt_workbook_drop(spark, tmp_table_dir):
    """T9 at the FILE level: a truncated/non-zip drop must not wedge the
    stream (checkpoint redelivery would re-fail the same batch forever).
    The corrupt file is skipped, a dead-letter marker is written under
    the checkpoint, and the good workbooks still apply oracle-equal."""
    import glob
    import json

    feed = change_feed(spark, 800, 50, seed=41, num_batches=2, min_len=2, max_len=6)
    rows = feed.withColumn("tokens_txt", F.array_join("tokens", " ")).select(
        "op", "doc_id", "lsn", "tokens_txt", "n_tok", "source",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts"), "batch",
    ).collect()
    src = os.path.join(tmp_table_dir, "drops")
    os.makedirs(src)
    header = ["op", "doc_id", "lsn", "tokens_txt", "n_tok", "source", "ts"]
    for b in [0, 1]:
        write_xlsx(
            os.path.join(src, f"batch{b}.xlsx"),
            header,
            [[r[h] for h in header] for r in rows if r["batch"] == b],
        )
    # two poison pills: not-a-zip bytes, and a zip with no workbook parts
    with open(os.path.join(src, "truncated.xlsx"), "wb") as fh:
        fh.write(b"PK\x03\x04 this is not a real workbook")
    import zipfile as _zf
    with _zf.ZipFile(os.path.join(src, "emptyzip.xlsx"), "w") as zf:
        zf.writestr("readme.txt", "renamed zip, no sheets")

    ckpt = os.path.join(tmp_table_dir, "ckpt")
    pipe = CdcPipeline.create(os.path.join(tmp_table_dir, "p"), bucket_count=8)
    run_stream(spark, pipe, src, ckpt, feed_format="xlsx")
    assert_frames_equal(pipe.target.read(spark), expected_final(feed))

    markers = sorted(glob.glob(os.path.join(ckpt, "_corrupt_xlsx", "*.json")))
    assert len(markers) == 2
    recorded = {json.load(open(m))["path"].rsplit("/", 1)[-1] for m in markers}
    assert recorded == {"truncated.xlsx", "emptyzip.xlsx"}


def test_serial_timestamp_fallback_is_range_gated(spark):
    """A producer that writes unix EPOCH SECONDS (or millis) into a
    timestamp column must decode to null → quarantine, NOT hit
    timestamp_seconds' Math.multiplyExact long overflow (which is
    ANSI-independent and would abort the stream forever on checkpoint
    redelivery).  In-range Excel serials and ISO strings still decode."""
    from pyspark.sql.types import StructType, StructField, TimestampType

    from horizon_etl_spark.sources.xlsx import decoded_cols

    logical = StructType([StructField("ts", TimestampType(), True)])
    wire = spark.createDataFrame(
        [("2024-01-01 12:00:00",),  # ISO → parsed directly
         ("45292.5",),              # Excel serial 2024-01-01 12:00 UTC
         ("1704067200",),           # epoch SECONDS → out of serial range
         ("1704067200000",),        # epoch MILLIS → would overflow long µs
         ("-7",),                   # pre-epoch serial → not a date
         ("nonsense",)],            # malformed → null
        "ts string",
    )
    rows = wire.select(*decoded_cols(logical)).collect()  # must not raise
    assert rows[0]["ts"].year == 2024 and rows[0]["ts"].hour == 12
    assert rows[1]["ts"].year == 2024 and rows[1]["ts"].hour == 12
    assert rows[2]["ts"] is None
    assert rows[3]["ts"] is None
    assert rows[4]["ts"] is None
    assert rows[5]["ts"] is None
