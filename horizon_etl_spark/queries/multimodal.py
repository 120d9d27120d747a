"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the pattern for
image/audio/video columns in a training-data lake.

The decode step is STUBBED (no image/audio libs in this container) with
a deterministic fake "decoder"; everything Spark-side — schema, batch
iteration, partitioning, output shape — is real and tested
(tests/test_multimodal.py).

``binary_meta`` is the oracle-checked slice: it synthesizes the binary
column from documents.text (utf-8 encode) and computes metadata with
JVM builtins only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from horizon_etl_spark.queries.registry import register, table

# typed metadata travelling beside the opaque payload — the multimodal
# analogue of the reference's JSON `metadata` side-channel for unknown
# source columns (/root/reference/src/core/logic/initiative_handlers.py:64-66)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("checksum", LongType(), True),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: text bytes stand in for encoded frames."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias(
            "media_type"
        ),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: derives (w, h,
    checksum) from the bytes.  A real deployment swaps this for
    PIL/libav inside the same mapInPandas kernel — the Spark plumbing
    (Arrow batches in, typed rows out) is unchanged."""
    if payload is None:
        raise NotImplementedError("real decoder not available in this container")
    checksum = 0
    for by in payload[:64]:
        checksum = (checksum * 131 + by) % (1 << 31)
    return (checksum % 640) + 1, (checksum % 480) + 1, checksum


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas — the multimodal decode/resize/frame-sample slot)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("orig_bytes", LongType(), True),
        StructField("resized_bytes", LongType(), True),
        StructField("resized_md5", StringType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_md5", StringType(), True),
    ]
)


def resize_media(media: DataFrame, step: int = 4) -> DataFrame:
    """Resize/downsample kernel slot (images: bicubic resize; here the
    deterministic stand-in keeps every ``step``-th byte).  Same
    Arrow-batched mapInPandas shape a real decoder drops into —
    payload bytes in, transformed payload summary out."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                small = bytes(payload)[::step]
                out_rows.append(
                    (int(mid), len(payload), len(small), hashlib.md5(small).hexdigest())
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "orig_bytes", "resized_bytes", "resized_md5"]
            )

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 16, every_k: int = 3) -> DataFrame:
    """Frame-sampling kernel slot (video/audio: decode + keep every
    k-th frame).  The 1→N row shape is the real thing: one media row
    yields one output row per sampled fixed-size block, exactly how a
    frame extractor fans out inside mapInPandas."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for j in range(0, len(b), frame_bytes * every_k):
                    frame = b[j : j + frame_bytes]
                    rows.append(
                        (int(mid), j // frame_bytes, hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


@register(
    "media_resize",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(length(text) AS BIGINT) AS orig_bytes,
           CAST(len(generate_series(1, length(text), 4)) AS BIGINT) AS resized_bytes,
           md5(coalesce(list_aggregate(
             list_transform(generate_series(1, length(text), 4),
                            i -> substring(text, i, 1)),
             'string_agg', ''), '')) AS resized_md5
    FROM documents
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every synthesized media payload through the
    mapInPandas resize kernel; the oracle reproduces the byte
    subsampling character-wise (testdata text is ASCII, so bytes ==
    code points)."""
    return resize_media(media_from_documents(spark, sf_dir))


@register(
    "frame_sample",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST((j - 1) / 16 AS BIGINT) AS frame_idx,
           md5(substring(text, j, 16)) AS frame_md5
    FROM documents, unnest(generate_series(1, length(text), 48)) AS t(j)
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 3rd 16-byte 'frame' of each payload through the
    mapInPandas fan-out kernel (1 media row → N frame rows)."""
    return sample_frames(media_from_documents(spark, sf_dir))


@register(
    "binary_meta",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type
    FROM documents
    """,
)
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction with JVM builtins (byte length
    + content hash) — the cheap pre-filter that runs before any decode."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.when(F.col("doc_id") % 2 == 0, "image/fake")
        .otherwise("audio/fake")
        .alias("media_type"),
    )


@register(
    "media_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST((cs % 640) + 1 AS BIGINT) AS width,
           CAST((cs % 480) + 1 AS BIGINT) AS height,
           CAST(cs AS BIGINT) AS checksum
    FROM (
      SELECT doc_id, text,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), list_transform(
                 generate_series(1, least(64, length(text))),
                 i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 2147483648) AS cs
      FROM documents
    )
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: synthesize binary media → Arrow-batched
    fake decode → typed feature rows.  The decode stub is deterministic
    byte arithmetic, so the whole pipeline — including the mapInPandas
    kernel's output — is exactly oracle-checkable (the oracle folds the
    same 131-multiplier checksum over the first 64 bytes; testdata text
    is ASCII so code points == bytes)."""
    return extract_features(media_from_documents(spark, sf_dir))
