"""Query/oracle parity tests (driver-contract mirror) at sf0.001.

Mimics the driver's correctness gate: run each registered query on
Spark, its oracle on DuckDB over the same parquet, compare sorted-
column stringified row multisets exactly.  The full sweep lives in
tools/verify_oracles.py (sf0.01); here a representative subset keeps
the suite fast.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# one per operator family: join chain+agg, window argmax, anti-join,
# LWW, validation counts, text dedup, n-gram pairs, ANN, binary, and
# the full CDC kernel
SUBSET = [
    "region_revenue",
    "top_customer_per_nation",
    "orders_without_lineitems",
    "cdc_lww_state",
    "events_quarantine_counts",
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "knn_bruteforce",
    "knn_lsh_recall",
    "binary_meta",
    "cdc_apply_events",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    from decimal import Decimal

    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    from horizon_etl_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](spark, SF_DIR)
    s_rows = [tuple(r) for r in df.collect()]
    res = duck.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _rows(df.columns, s_rows) == _rows(d_cols, d_rows)
    assert len(s_rows) > 0, "trivially-empty result is not a meaningful check"


def test_rows_only_queries_nonempty(spark):
    from horizon_etl_spark.queries import ORACLES, QUERIES

    for name in QUERIES:
        if name in ORACLES or name in ("minhash_dedup",):  # minhash may be empty at tiny sf
            continue
        assert QUERIES[name](spark, SF_DIR).count() > 0, name


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}
    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_minhash_short_doc_guard(spark):
    """Docs with <3 words produce no shingles (sequence(1, n<1) would
    generate a DESCENDING range — guarded explicitly)."""
    from horizon_etl_spark.queries.text import minhash_signatures

    d = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, "")], "doc_id long, text string"
    )
    sigs = minhash_signatures(d)
    ids = {r["doc_id"] for r in sigs.collect()}
    assert ids == {2}
    assert len(sigs.first()["sig"]) == 16
