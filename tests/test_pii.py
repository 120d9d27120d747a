"""Deep-recursive PII scrub (reference scrub_pii_deep /
scrub_source_record_payload, pii_anonymizer.py:66-97): nested payloads
come back schema-identical with every string leaf scrubbed, phones
nulled, CPF keys rewritten; the whole thing idempotent."""

import hashlib
import os
from functools import partial

from pyspark.sql import functions as F

from horizon_etl_spark.pii import deep_scrub, deep_scrub_udf
from horizon_etl_spark.queries.scalars import PII_SALT


def _email_hash(addr: str) -> str:
    return hashlib.sha256((addr + PII_SALT).encode()).hexdigest()[:12] + "@anon.lgpd"


def test_struct_roundtrip_preserves_schema_and_scrubs_leaves(spark):
    df = spark.createDataFrame(
        [
            (1, ("x@y.com inline", "555-1234", ["mail a@b.co now", "ok"])),
            (2, (None, None, None)),
        ],
        "id int, payload struct<note:string, phone:string, tags:array<string>>",
    )
    out = deep_scrub(df, ["payload"], phone_keys=("phone",))
    assert out.schema == df.schema, "typed round trip must preserve the schema"
    rows = {r["id"]: r["payload"] for r in out.collect()}
    assert rows[1]["note"] == _email_hash("x@y.com") + " inline"
    assert rows[1]["phone"] is None, "phone key nulled at any depth"
    assert rows[1]["tags"][0] == "mail " + _email_hash("a@b.co") + " now"
    assert rows[1]["tags"][1] == "ok"
    assert rows[2] == (None, None, None)
    # idempotent: scrubbing the scrubbed frame changes nothing
    again = deep_scrub(out, ["payload"], phone_keys=("phone",))
    assert sorted(map(str, again.collect())) == sorted(map(str, out.collect()))


def test_string_column_json_and_freetext(spark):
    scrub = deep_scrub_udf(cpf_keys=("cpf",))
    df = spark.createDataFrame(
        [
            ('{"a": {"b": ["deep x@y.com"]}, "cpf": 123}',),
            ("plain text x@y.com here",),
            ("{not json but has x@y.com",),
            (None,),
        ],
        "s string",
    ).select(scrub(F.col("s")).alias("s"))
    got = [r["s"] for r in df.collect()]
    h = _email_hash("x@y.com")
    assert got[0] == '{"a":{"b":["deep %s"]},"cpf":"LGPD-%s"}' % (
        h, hashlib.sha256(("123" + PII_SALT).encode()).hexdigest()[:16],
    )
    assert got[1] == f"plain text {h} here"
    assert got[2] == "{not json but has " + h  # invalid JSON → free-text scrub
    assert got[3] is None


def test_export_deep_scrub_hook(spark, tmp_table_dir):
    """The deep scrub plugs into the export pipeline's always-on scrub
    slot (pii_session_hook semantics): a nested JSON props column with
    an embedded email is exported hashed."""
    from pyspark.sql.types import StringType, StructField, StructType

    from horizon_etl_spark.exports import export_table, read_export
    from horizon_etl_spark.tables.lake import LakeTable

    t = LakeTable.create(
        os.path.join(tmp_table_dir, "t"),
        StructType(
            [
                StructField("id", StringType(), False),
                StructField("props", StringType(), True),
            ]
        ),
    )
    t.append(
        spark.createDataFrame(
            [("a", '{"owner": {"email": "real@corp.com"}, "n": 1}')], "id string, props string"
        )
    )
    out = os.path.join(tmp_table_dir, "exports")
    export_table(
        spark, t, out, "props", formats=("parquet",),
        scrub=partial(deep_scrub, cols=["props"]),
    )
    row = read_export(spark, out, "props", "parquet").collect()[0]
    assert "real@corp.com" not in row["props"]
    assert _email_hash("real@corp.com") in row["props"]
