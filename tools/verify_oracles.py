"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf, compare row count, column names, and an order-insensitive
exact value comparison (strict: stringified cell equality).

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


# Spark simpleString → acceptable DuckDB type names: flags int/bigint
# and decimal/double drift BEFORE the driver's stricter schema compare.
_DTYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE", "FLOAT"},
    "float": {"FLOAT"},
    "string": {"VARCHAR", "STRING"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP"},
    "boolean": {"BOOLEAN"},
}


def dtype_mismatches(spark_fields, con, sql):
    """Compare column dtypes by name (exact DuckDB types via DESCRIBE);
    returns [(col, spark_type, duck_type)]."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # DESCRIBE unsupported for this statement shape
    duck_types = {r[0]: (r[1] or "").upper() for r in desc}
    bad = []
    for f in spark_fields:
        st = f.dataType.simpleString()
        dt = duck_types.get(f.name, "")
        ok = dt in _DTYPE_MAP.get(st, {st.upper()}) or (
            st.startswith("decimal") and dt.startswith("DECIMAL")
        )
        if not ok:
            bad.append((f.name, st, dt))
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from horizon_etl_spark.session import build_session

    spark = build_session("verify-oracles", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = sorted(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows, cols={s_cols} "
                  f"({time.time()-t0:.1f}s)")
            if len(s_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            d_names = [c[0] for c in res.description]
            d_cols = sorted(d_names)
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            continue
        ok = True
        if s_cols != d_cols:
            failures.append((name, f"cols mismatch spark={s_cols} duck={d_cols}"))
            ok = False
        elif bad_types := dtype_mismatches(df.schema.fields, con.cursor(), oracles[name]):
            failures.append((name, f"dtype mismatch {bad_types}"))
            ok = False
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount spark={len(s_rows)} duck={len(d_rows)}"))
            ok = False
        else:
            # canonical compare: sort columns by name on both sides
            a = rows_canon(df.columns, s_rows)
            b = rows_canon(d_names, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                failures.append((name, f"value mismatch, first diffs: {diff}"))
                ok = False
        print(f"[{'OK' if ok else 'FAIL'}] {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:500]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
