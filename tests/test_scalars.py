"""F-family scalar semantics (SURVEY.md §2.8): edge cases the oracle
queries can't exercise directly."""

from pyspark.sql import functions as F

from horizon_etl_spark.queries.scalars import (
    coerce_bool,
    parse_pt_date,
    scrub_emails_udf,
)


def test_email_scrub_idempotent_and_multi_match(spark):
    scrub = scrub_emails_udf()
    df = spark.createDataFrame(
        [
            ("two a@x.com and b@y.org here",),
            ("none here",),
            (None,),
        ],
        "txt string",
    ).select(scrub(F.col("txt")).alias("once"))
    rows = df.withColumn("twice", scrub(F.col("once"))).collect()
    # both addresses replaced, hash form, no raw emails remain
    assert "@x.com" not in rows[0]["once"] and "@y.org" not in rows[0]["once"]
    assert rows[0]["once"].count("@anon.lgpd") == 2
    # idempotent: the negative lookahead skips already-anonymized addrs
    assert rows[0]["twice"] == rows[0]["once"]
    assert rows[1]["once"] == "none here"
    assert rows[2]["once"] is None


def test_parse_pt_date_edges(spark):
    df = spark.createDataFrame(
        [
            ("05/04/2014",),
            ("Anterior a abril de 2014",),
            ("anterior a MARÇO de 2020",),  # case-insensitive, accent
            ("Anterior a plutão de 2001",),  # unknown month → January
            ("não informada",),
            ("N/A",),
            ("garbage",),
            (None,),
        ],
        "ds string",
    )
    out = [r["p"] and str(r["p"]) for r in df.select(parse_pt_date(F.col("ds")).alias("p")).collect()]
    assert out == [
        "2014-04-05",
        "2014-04-01",
        "2020-03-01",
        "2001-01-01",
        None,
        None,
        None,
        None,
    ]


def test_coerce_bool_sets(spark):
    cases = [
        ("sim", True), ("S", True), ("  yes ", True), ("1", True),
        ("não", False), ("NAO", False), ("0", False), ("", False),
        ("f", False), ("talvez", True),  # unknown non-empty → truthy
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "v string")
    got = [r["b"] for r in df.select(coerce_bool(F.col("v")).alias("b")).collect()]
    assert got == [e for _, e in cases]
