"""Validation / quarantine split — all JVM-side expressions, no per-row
Python (BASELINE.json input_hint).

Re-expresses the reference's hexagonal-port validation rules as
DataFrame predicates with a dead-letter path instead of skip-and-log:
  * approval predicate / row skip   /root/reference/src/core/logic/project_loader.py:524-529
  * null/empty guards               /root/reference/src/core/logic/strategies/sigpesq_advisorships.py:38-39
  * placeholder/source whitelist    /root/reference/src/core/logic/etl_flow_reporter.py:190-225
  * consistency invariants          /root/reference/src/core/logic/etl_flow_reporter.py:108-134
    → here: n_tok == size(tokens)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from horizon_etl_spark.cdc.schema import SOURCE_WHITELIST

VALID_OPS = ("insert", "update", "delete")
SOURCE_WHITELIST_DEFAULT = SOURCE_WHITELIST


def _rules(
    whitelist: tuple[str, ...],
    fields_col: str | None = None,
    vocab_size: int | None = None,
) -> list[tuple[str, Column]]:
    """Ordered (reason, violation-predicate) pairs; first hit wins.

    With ``fields_col`` (per-attribute feeds), the payload-content
    rules only apply when the event actually ASSERTS the column —
    a partial update that doesn't carry tokens is not an
    empty-tokens violation.

    ``vocab_size`` (opt-in) adds the token-range invariant from SURVEY
    §2.10: every token id must sit in ``[0, vocab_size)``.  SURVEY
    sketched this as a pandas UDF; ``F.exists`` with a scalar lambda is
    the better answer — it stays inside whole-stage codegen with
    short-circuit evaluation, no Arrow round trip per batch."""
    is_del = F.col("op") == "delete"

    def asserts(c: str) -> Column:
        if fields_col is None:
            return F.lit(True)
        return F.col(fields_col).isNull() | F.array_contains(F.col(fields_col), c)

    rules = [
        ("null_doc_id", F.col("doc_id").isNull() | (F.length("doc_id") == 0)),
        ("null_lsn", F.col("lsn").isNull()),
        ("bad_op", ~F.col("op").isin(*VALID_OPS) | F.col("op").isNull()),
        ("empty_tokens", ~is_del & asserts("tokens") & (F.col("tokens").isNull() | (F.size("tokens") == 0))),
        ("n_tok_mismatch", ~is_del & asserts("tokens") & asserts("n_tok") & (F.col("n_tok").isNull() | (F.col("n_tok") != F.size("tokens")))),
        # a null ELEMENT inside tokens is never a valid token id — it is
        # the signature of a malformed wire cell surviving a lenient
        # decode (the CSV/xlsx wires try_cast each element; "1 2 x"
        # becomes [1, 2, null]).  Without this rule such a row would
        # MERGE a null into the token arrays the north-rule equality
        # invariant is defined over.  F.exists short-circuits JVM-side.
        ("null_token", ~is_del & asserts("tokens") & F.exists("tokens", lambda x: x.isNull())),
        # explicit isNull arm: `~null.isin(...)` is NULL, and a NULL
        # predicate falls through the reason CASE — without it a
        # null-source insert would silently pass the whitelist
        ("bad_source", ~is_del & asserts("source") & (F.col("source").isNull() | ~F.col("source").isin(*whitelist))),
    ]
    if vocab_size is not None:
        hi = int(vocab_size)
        rules.append(
            (
                "token_out_of_vocab",
                ~is_del
                & asserts("tokens")
                & F.exists(
                    "tokens", lambda x: x.isNull() | (x < 0) | (x >= F.lit(hi))
                ),
            )
        )
    return rules


def reason_column(
    whitelist: tuple[str, ...] = SOURCE_WHITELIST,
    fields_col: str | None = None,
    vocab_size: int | None = None,
) -> Column:
    """NULL when the row is valid, else the first violated rule name."""
    expr = F.lit(None).cast("string")
    for name, pred in reversed(_rules(whitelist, fields_col, vocab_size)):
        expr = F.when(pred, F.lit(name)).otherwise(expr)
    return expr


def split_valid(
    df: DataFrame,
    whitelist: tuple[str, ...] = SOURCE_WHITELIST,
    fields_col: str | None = None,
    vocab_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, quarantined-with-reason).

    The reason column is computed once; the two outputs are the two
    sides of the same filter so Catalyst can reuse the scan.
    """
    tagged = df.withColumn("reason", reason_column(whitelist, fields_col, vocab_size))
    valid = tagged.filter(F.col("reason").isNull()).drop("reason")
    quarantined = tagged.filter(F.col("reason").isNotNull())
    return valid, quarantined
