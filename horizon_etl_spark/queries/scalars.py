"""Scalar-function parity queries (SURVEY.md §2.8 F-family).

Each query synthesizes a deterministic dirty input column from a
testdata table, runs the engine's cleansing scalar over it, and is
oracle-checked against DuckDB — for the date parser the oracle computes
the expected output directly from the clean source column, so the test
is against ground truth, not a reimplementation.

Reference behaviors reproduced (cited per query):
  F4  first-digit-run code normalization
  F7  email scrub inside free text (hash-preserving, idempotent)
  F9  Portuguese month-name date parse ("Anterior a abril de 2014")
  F10 Portuguese currency comma→dot parse with 0.0 fallback
  F12 pt/en truthy-string boolean coercion
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from horizon_etl_spark.queries.registry import register, table

# Reference email regex (/root/reference/src/core/logic/pii_anonymizer.py:19-21):
# negative lookahead keeps already-anonymized addresses stable.
EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@(?!anon\.lgpd)[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
PII_SALT = "|pepper"

PT_MONTHS = [
    "janeiro", "fevereiro", "março", "abril", "maio", "junho",
    "julho", "agosto", "setembro", "outubro", "novembro", "dezembro",
]


# Each F-family scalar keeps its own function + oracle SQL; the DRIVER
# row is the single ``scalar_suite`` union at the bottom of this module
# (one green row witnesses all six, freeing registry slots for the
# vector/multimodal family under the driver's 50-query cap).

# ------------------------------------------------------------------ F4
_DIGIT_SQL = """
    SELECT p_partkey,
           regexp_extract(
             CASE WHEN p_partkey % 5 = 0 THEN p_name
                  ELSE 'SIG-' || CAST(p_partkey AS VARCHAR) || '/r'
                       || CAST(p_partkey % 7 AS VARCHAR) END,
             '[0-9]+', 0) AS sig_code
    FROM part
    """


def digit_run_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit-run code normalization (F4):
    normalize_sigpesq_code (/root/reference/src/core/logic/
    initiative_identity.py:22-27) — re.search(r"\\d+") first match,
    empty string when the code carries no digits."""
    p = table(spark, sf_dir, "part")
    code = F.when(F.col("p_partkey") % 5 == 0, F.col("p_name")).otherwise(
        F.concat(
            F.lit("SIG-"),
            F.col("p_partkey").cast("string"),
            F.lit("/r"),
            (F.col("p_partkey") % 7).cast("string"),
        )
    )
    return p.select(
        "p_partkey", F.regexp_extract(code, "[0-9]+", 0).alias("sig_code")
    )


# ------------------------------------------------------------------ F7
def scrub_emails_udf():
    """Vectorized email scrub (F7): every real address in free text is
    replaced by ``sha256(addr+salt)[:12]@anon.lgpd`` — the reference's
    scrub_emails_from_text (/root/reference/src/core/logic/
    pii_anonymizer.py:19-21,60-64), idempotent via the negative
    lookahead (re-scrubbing scrubbed text is a no-op).  Needs Python
    because each *match* is hashed, so this is the sanctioned
    Arrow-batched pandas-UDF slot, never per-row Python."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    rx = re.compile(EMAIL_RE)

    def anon(m):
        digest = hashlib.sha256((m.group(0) + PII_SALT).encode()).hexdigest()
        return f"{digest[:12]}@anon.lgpd"

    @pandas_udf("string")
    def scrub(s):
        return s.map(lambda t: rx.sub(anon, t) if t is not None else None)

    return scrub


_EMAIL_SQL = """
    SELECT c_custkey,
           replace(
             replace(
               'Reach ' || c_name || ' at a' || CAST(c_custkey AS VARCHAR)
                 || '@example.com or b' || CAST(c_custkey AS VARCHAR)
                 || '@sub.example.org today',
               'a' || CAST(c_custkey AS VARCHAR) || '@example.com',
               substring(sha256('a' || CAST(c_custkey AS VARCHAR)
                                || '@example.com' || '|pepper'), 1, 12)
                 || '@anon.lgpd'),
             'b' || CAST(c_custkey AS VARCHAR) || '@sub.example.org',
             substring(sha256('b' || CAST(c_custkey AS VARCHAR)
                              || '@sub.example.org' || '|pepper'), 1, 12)
               || '@anon.lgpd') AS scrubbed
    FROM customer
    """


def email_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email scrub in free text (F7): the Spark side runs the general
    regex-substitution pandas UDF over a synthesized two-email text;
    the oracle reconstructs the expected result with plain replaces of
    the two known addresses."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    txt = F.concat(
        F.lit("Reach "), F.col("c_name"), F.lit(" at a"), k,
        F.lit("@example.com or b"), k, F.lit("@sub.example.org today"),
    )
    scrub = scrub_emails_udf()
    return c.select("c_custkey", scrub(txt).alias("scrubbed"))


# ------------------------------------------------------------------ F9
def parse_pt_date(col: F.Column) -> F.Column:
    """Portuguese date parse (F9): 'DD/MM/YYYY', or
    'Anterior a <month> de <year>' → first of that month (unknown month
    name defaults to January), or the not-informed markers → null
    (/root/reference/src/core/logic/strategies/cnpq_sync.py:34-83).
    Pure JVM expressions — no UDF."""
    low = F.lower(F.trim(col))
    std = F.try_to_timestamp(col, F.lit("dd/MM/yyyy")).cast("date")
    mname = F.regexp_extract(low, r"^anterior a (.+) de (\d{4})$", 1)
    myear = F.regexp_extract(low, r"^anterior a (.+) de (\d{4})$", 2)
    month_map = F.create_map(
        *[x for i, n in enumerate(PT_MONTHS) for x in (F.lit(n), F.lit(i + 1))]
    )
    anterior = F.when(
        mname != "",
        F.make_date(
            myear.cast("int"),
            F.coalesce(F.element_at(month_map, mname), F.lit(1)),
            F.lit(1),
        ),
    )
    return F.coalesce(std, anterior)


_PT_DATE_SQL = """
    SELECT o_orderkey,
           CASE CAST(o_orderkey % 4 AS INT)
             WHEN 0 THEN CAST(o_orderdate AS DATE)
             WHEN 1 THEN CAST(date_trunc('month', o_orderdate) AS DATE)
             ELSE NULL END AS parsed
    FROM orders
    """


def pt_month_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 end-to-end against ground truth: the dirty string is built
    from o_orderdate (standard form, 'Anterior a <mês> de <year>' form,
    or a not-informed marker), parsed back WITHOUT looking at
    o_orderdate; the oracle derives the expected date directly from the
    clean column."""
    o = table(spark, sf_dir, "orders")
    month_name = F.element_at(
        F.array(*[F.lit(n) for n in PT_MONTHS]), F.month("o_orderdate")
    )
    ds = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat(
                F.lit("Anterior a "), month_name, F.lit(" de "),
                F.year("o_orderdate").cast("string"),
            ),
        )
        .when(F.col("o_orderkey") % 4 == 2, F.lit("não informada"))
        .otherwise(F.lit("N/A"))
    )
    return o.select("o_orderkey", ds.alias("ds")).select(
        "o_orderkey", parse_pt_date(F.col("ds")).alias("parsed")
    )


# ----------------------------------------------------------------- F10
_CURRENCY_SQL = """
    SELECT c_custkey,
           CAST(coalesce(
             TRY_CAST(replace(
               CASE WHEN c_custkey % 7 = 0 THEN 'n/d'
                    ELSE replace(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR), '.', ',')
               END, ',', '.') AS DECIMAL(18,2)),
             0) * 100 AS BIGINT) AS cents
    FROM customer
    """


def currency_comma_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portuguese currency parse (F10): comma→dot then float, 0.0 on
    unparseable input (/root/reference/src/core/logic/strategies/
    base.py:108-116).  Emitted as BIGINT cents."""
    c = table(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 7 == 0, F.lit("n/d")).otherwise(
        F.replace(
            F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
            F.lit("."),
            F.lit(","),
        )
    )
    parsed = F.coalesce(
        F.expr("try_cast(replace(_raw, ',', '.') AS DECIMAL(18,2))"),
        F.lit(0).cast("decimal(18,2)"),
    )
    return (
        c.select("c_custkey", raw.alias("_raw"))
        .select("c_custkey", (parsed * 100).cast("long").alias("cents"))
    )


# ----------------------------------------------------------------- F17
def coerce_text(col: F.Column) -> F.Column:
    """Nested-value → plain-text coercion (F17): heterogeneous crawler
    payloads arrive as a plain string, a dict with one of the preferred
    text keys, or a list of fragments
    (/root/reference/src/core/logic/strategies/cnpq_sync.py:85-109).
    Dict → first non-null of descricao/texto/value; list → fragments
    joined with newlines; else the trimmed string itself."""
    is_obj = F.trim(col).startswith("{")
    is_arr = F.trim(col).startswith("[")
    obj_text = F.coalesce(
        F.get_json_object(col, "$.descricao"),
        F.get_json_object(col, "$.texto"),
        F.get_json_object(col, "$.value"),
    )
    arr_text = F.array_join(F.from_json(col, "array<string>"), "\n")
    return (
        F.when(is_obj, obj_text).when(is_arr, arr_text).otherwise(F.trim(col))
    )


_NESTED_TEXT_SQL = """
    SELECT o_orderkey,
           CASE
             WHEN raw LIKE '{%' THEN coalesce(
               json_extract_string(raw, '$.descricao'),
               json_extract_string(raw, '$.texto'),
               json_extract_string(raw, '$.value'))
             WHEN raw LIKE '[%' THEN
               list_aggregate(CAST(raw::JSON AS VARCHAR[]), 'string_agg', chr(10))
             ELSE trim(raw)
           END AS coerced
    FROM (
      SELECT o_orderkey,
             CASE CAST(o_orderkey % 4 AS INT)
               WHEN 0 THEN 'plain ' || o_orderpriority
               WHEN 1 THEN '{"descricao": "' || o_orderpriority || '"}'
               WHEN 2 THEN '{"ignored": 1, "texto": "' || o_orderpriority || '"}'
               ELSE '["' || o_orderpriority || '", "extra line"]'
             END AS raw
      FROM orders
    )
    """


def nested_text_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = (F.col("o_orderkey") % 4).cast("int")
    p = F.col("o_orderpriority")
    raw = (
        F.when(m == 0, F.concat(F.lit("plain "), p))
        .when(m == 1, F.concat(F.lit('{"descricao": "'), p, F.lit('"}')))
        .when(m == 2, F.concat(F.lit('{"ignored": 1, "texto": "'), p, F.lit('"}')))
        .otherwise(F.concat(F.lit('["'), p, F.lit('", "extra line"]')))
    )
    return o.select("o_orderkey", raw.alias("raw")).select(
        "o_orderkey", coerce_text(F.col("raw")).alias("coerced")
    )


# ----------------------------------------------------------------- F12
BOOL_FALSE = ("", "0", "false", "f", "nao", "não", "n", "no")
BOOL_TRUE = ("1", "true", "t", "sim", "s", "yes", "y")
_BOOL_SAMPLES = [
    "sim", "S", "1", "true", "YES", "y",
    "não", "nao", "0", "False", "no", "talvez",
]


def coerce_bool(col: F.Column) -> F.Column:
    """pt/en truthy-string coercion (F12): the reference's
    _parse_cancelled (/root/reference/src/core/logic/strategies/
    sigpesq_advisorships.py:123-144) — known false set → false, known
    true set → true, anything else truthy-nonempty."""
    norm = F.lower(F.trim(col))
    return (
        F.when(norm.isin(*BOOL_FALSE), F.lit(False))
        .when(norm.isin(*BOOL_TRUE), F.lit(True))
        .otherwise(norm != "")
    )


_BOOL_SQL = """
    SELECT c_custkey,
           CAST(CASE
             WHEN lower(trim(raw)) IN ('', '0', 'false', 'f', 'nao', 'não', 'n', 'no') THEN 0
             WHEN lower(trim(raw)) IN ('1', 'true', 't', 'sim', 's', 'yes', 'y') THEN 1
             ELSE CASE WHEN lower(trim(raw)) <> '' THEN 1 ELSE 0 END
           END AS BIGINT) AS flag
    FROM (
      SELECT c_custkey,
             ['sim','S','1','true','YES','y','não','nao','0','False','no','talvez']
               [CAST(c_custkey % 12 AS INT) + 1] AS raw
      FROM customer
    )
    """


def boolean_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    raw = F.element_at(
        F.array(*[F.lit(s) for s in _BOOL_SAMPLES]),
        (F.col("c_custkey") % 12).cast("int") + 1,
    )
    return c.select(
        "c_custkey", coerce_bool(raw).cast("long").alias("flag")
    )


# -------------------------------------------------------- deep PII scrub
@register(
    "pii_deep_scrub",
    oracle="""
    SELECT c_custkey,
           substring(sha256('a' || k || '@example.com' || '|pepper'), 1, 12)
             || '@anon.lgpd' AS email,
           CAST(NULL AS VARCHAR) AS phone,
           'ping ' || substring(sha256('a' || k || '@example.com' || '|pepper'), 1, 12)
             || '@anon.lgpd at work' AS note0,
           'LGPD-' || substring(sha256(k || '|pepper'), 1, 16) AS cpf
    FROM (SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS k FROM customer)
    """,
)
def pii_deep_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep-recursive PII scrub of a NESTED payload (reference
    scrub_pii_deep / scrub_source_record_payload,
    /root/reference/src/core/logic/pii_anonymizer.py:66-97): a JSON
    document with an email inside a nested object, the same address
    embedded in free text inside an array, a phone field, and a CPF
    field is deep-scrubbed; the oracle derives every expected value
    directly from the clean inputs (hash formats shared with the flat
    scrubs — same salt, so depth never changes an identity)."""
    from horizon_etl_spark.pii import deep_scrub_udf

    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    js = F.concat(
        F.lit('{"contact": {"email": "a'), k,
        F.lit('@example.com", "phone": "555-'), k,
        F.lit('"}, "notes": ["ping a'), k,
        F.lit('@example.com at work", "clean"], "cpf": "'), k, F.lit('"}'),
    )
    scrub = deep_scrub_udf(phone_keys=("phone",), cpf_keys=("cpf",))
    s = c.select("c_custkey", scrub(js).alias("js"))
    return s.select(
        "c_custkey",
        F.get_json_object("js", "$.contact.email").alias("email"),
        F.get_json_object("js", "$.contact.phone").alias("phone"),
        F.get_json_object("js", "$.notes[0]").alias("note0"),
        F.get_json_object("js", "$.cpf").alias("cpf"),
    )


# ------------------------------------------------------- combined driver row
_SUITE = [
    # (family tag, query fn, its oracle SQL, key column, value column)
    ("digit_run", digit_run_extract, _DIGIT_SQL, "p_partkey", "sig_code"),
    ("email_scrub", email_scrub_text, _EMAIL_SQL, "c_custkey", "scrubbed"),
    ("pt_date", pt_month_date_parse, _PT_DATE_SQL, "o_orderkey", "parsed"),
    ("currency", currency_comma_parse, _CURRENCY_SQL, "c_custkey", "cents"),
    ("nested_text", nested_text_coercion, _NESTED_TEXT_SQL, "o_orderkey", "coerced"),
    ("boolean", boolean_coercion, _BOOL_SQL, "c_custkey", "flag"),
]

_SUITE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{fam}' AS family, CAST({key} AS BIGINT) AS rec_id, "
    f"CAST({val} AS VARCHAR) AS val FROM ({sql})"
    for fam, _, sql, key, val in _SUITE
)


@register("scalar_suite", oracle=_SUITE_ORACLE)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six F-family scalar parity checks (F4/F7/F9/F10/F12/F17) as
    one long-format union (family, rec_id, val) — every row of every
    sub-check still hash-compared exactly; values normalized to strings
    on both engines (date → 'YYYY-MM-DD', bigint → digits)."""
    out = None
    for fam, fn, _, key, val in _SUITE:
        d = fn(spark, sf_dir).select(
            F.lit(fam).alias("family"),
            F.col(key).cast("long").alias("rec_id"),
            F.col(val).cast("string").alias("val"),
        )
        out = d if out is None else out.unionByName(d)
    return out
