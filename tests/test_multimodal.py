"""Multimodal binary-column plumbing: schema, Arrow batch iteration,
deterministic fake decode, and partition-safety of mapInPandas."""

from __future__ import annotations

from tests.conftest import SF_DIR

from horizon_etl_spark.queries.multimodal import (
    FEATURE_SCHEMA,
    _fake_decode,
    extract_features,
    media_from_documents,
)


def test_media_schema_and_bytes(spark):
    media = media_from_documents(spark, SF_DIR)
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_feature_extraction_deterministic(spark):
    media = media_from_documents(spark, SF_DIR)
    f1 = extract_features(media).orderBy("media_id").collect()
    f2 = extract_features(media.repartition(7)).orderBy("media_id").collect()
    assert [r.asDict() for r in f1] == [r.asDict() for r in f2]
    assert extract_features(media).schema == FEATURE_SCHEMA
    for r in f1[:10]:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480


def test_fake_decode_matches_python():
    w, h, c = _fake_decode(b"hello world")
    checksum = 0
    for by in b"hello world":
        checksum = (checksum * 131 + by) % (1 << 31)
    assert (w, h, c) == ((checksum % 640) + 1, (checksum % 480) + 1, checksum)


def test_resize_and_frame_sample_kernels(spark):
    from horizon_etl_spark.queries.multimodal import resize_media, sample_frames

    media = media_from_documents(spark, SF_DIR)
    rs = resize_media(media, step=4)
    row = rs.orderBy("media_id").first()
    assert row["resized_bytes"] == -(-row["orig_bytes"] // 4)  # ceil(n/4)

    # fan-out shape: one media row -> ceil(n_blocks / k) frame rows,
    # frame indices are the sampled block indices, partition-invariant
    fr = sample_frames(media, frame_bytes=16, every_k=3)
    agg = {r["media_id"]: r for r in fr.groupBy("media_id").count().collect()}
    sizes = {r["media_id"]: r["n_bytes"] for r in media.collect()}
    for mid, n in sizes.items():
        expected = -(-(-(-n // 16)) // 3) if n else 0  # ceil(ceil(n/16)/3)
        assert agg[mid]["count"] == expected
    a = sorted(tuple(r) for r in fr.collect())
    b = sorted(tuple(r) for r in sample_frames(media.repartition(5)).collect())
    assert a == b
