"""Deep-recursive PII scrubbing of nested payloads.

Reference semantics reproduced
(/root/reference/src/core/logic/pii_anonymizer.py:66-97
``scrub_pii_deep`` / ``scrub_source_record_payload``):
  * every string ANYWHERE in a nested dict/list payload gets its email
    addresses replaced by salted-hash addresses (idempotent via the
    negative-lookahead regex);
  * configured phone keys are nulled wherever they appear;
  * configured CPF/identifier keys are rewritten to ``LGPD-<hash16>``
    (idempotent: already-anonymized values pass through);
  * non-dict payloads are scrubbed as plain values.

Spark shape: ONE Arrow-batched pandas UDF over the JSON-serialized
payload (the sanctioned Python slot — each regex match is hashed, which
no JVM builtin can do).  Typed ``struct``/``array``/``map`` columns are
round-tripped ``to_json → scrub → from_json(original schema)`` — the
scrub only rewrites string leaves and nulls configured keys, so the
round trip is schema-preserving.  Flat string columns use the same UDF
directly (a JSON-looking string is walked, anything else is scrubbed as
free text), matching the flat-column scrub in
``horizon_etl_spark.queries.scalars.scrub_emails_udf``.

Hash formats match the engine's flat scrubs (same salt) so a value
scrubbed at any depth equals the same value scrubbed flat:
  email → ``sha256(addr + salt)[:12]@anon.lgpd``
  cpf   → ``LGPD-`` + ``sha256(value + salt)[:16]``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from horizon_etl_spark.queries.scalars import EMAIL_RE, PII_SALT


def deep_scrub_udf(
    phone_keys: tuple[str, ...] = (),
    cpf_keys: tuple[str, ...] = (),
):
    """Pandas UDF string → string: JSON payloads are parsed and walked
    recursively; non-JSON strings are scrubbed as free text.  Key order
    is preserved (dict insertion order survives loads/dumps), so
    scrubbing is stable and idempotent byte-for-byte."""
    import hashlib
    import json
    import re

    from pyspark.sql.functions import pandas_udf

    rx = re.compile(EMAIL_RE)
    phones = frozenset(phone_keys)
    cpfs = frozenset(cpf_keys)

    def anon_email(m):
        digest = hashlib.sha256((m.group(0) + PII_SALT).encode()).hexdigest()
        return f"{digest[:12]}@anon.lgpd"

    def anon_cpf(v):
        s = str(v)
        if s.startswith("LGPD-"):  # idempotent (pii_anonymizer.py:24-32)
            return s
        digest = hashlib.sha256((s + PII_SALT).encode()).hexdigest()
        return f"LGPD-{digest[:16]}"

    def walk(v):
        if isinstance(v, str):
            return rx.sub(anon_email, v)
        if isinstance(v, dict):
            out = {}
            for k, x in v.items():
                if k in phones:
                    out[k] = None
                elif k in cpfs and x is not None:
                    out[k] = anon_cpf(x)
                else:
                    out[k] = walk(x)
            return out
        if isinstance(v, list):
            return [walk(x) for x in v]
        return v

    def scrub_one(s):
        if s is None:
            return None
        t = s.lstrip()
        if t.startswith("{") or t.startswith("["):
            try:
                return json.dumps(
                    walk(json.loads(s)), ensure_ascii=False, separators=(",", ":")
                )
            except ValueError:
                pass  # JSON-looking but invalid → plain-text scrub
        return rx.sub(anon_email, s)

    @pandas_udf("string")
    def scrub(s):
        return s.map(scrub_one)

    return scrub


def deep_scrub_col(
    df: DataFrame,
    col: str,
    phone_keys: tuple[str, ...] = (),
    cpf_keys: tuple[str, ...] = (),
) -> Column:
    """Deep-scrubbed replacement expression for ``df[col]``:
    string columns go through the UDF directly; struct/array/map
    columns round-trip through JSON and come back in their ORIGINAL
    Spark type (nulled phones / rewritten strings only)."""
    scrub = deep_scrub_udf(phone_keys, cpf_keys)
    dt = df.schema[col].dataType
    if dt.simpleString() == "string":
        return scrub(F.col(col))
    return F.from_json(scrub(F.to_json(F.col(col))), dt)


def deep_scrub(
    df: DataFrame,
    cols: list[str],
    phone_keys: tuple[str, ...] = (),
    cpf_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Projection applying the deep scrub to each named column — the
    always-on-before-sink hook shape (pii_session_hook.py:21-44); pass
    ``functools.partial(deep_scrub, cols=[...])`` as an export's
    ``scrub=`` argument."""
    out = df
    for c in cols:
        out = out.withColumn(c, deep_scrub_col(df, c, phone_keys, cpf_keys))
    return out
