"""Multi-family nested-document parsing (S3 breadth): one nested JSON
document column → MANY typed child-record DataFrames, declaratively.

The reference's Lattes parser takes one deeply nested CV document and
emits seven typed record families from it — personal info, projects,
articles, conference papers, academic education, awards, languages,
professional activities — each a list of flat dicts
(/root/reference/src/adapters/sources/lattes_parser.py:41-602).  This
module is the Spark-first equivalent: a :class:`Family` declares the
explode chain (zero, one, or nested arrays) and the output projection;
:func:`family_frame` compiles it to ``from_json`` → ``explode``* →
``select``.

Scale story — why per-family parses, not one shared parse: Catalyst's
JSON expression pruning rewrites each family's ``from_json`` to read
ONLY the subtree that family projects (visible as a pruned schema in
the plan), so six family jobs over a 100 TB document table each decode
a fraction of every document instead of six full parses.  When all
families are materialized in ONE job (a backfill), parse once yourself:
``docs.select(from_json(...).alias("doc")).persist()`` and pass
``pre_parsed=True`` — the explode/select machinery is identical.

Levels are addressable in the projection as ``doc`` (the document
root), ``l0`` (element of the first exploded array), ``l1`` (element of
an array nested inside ``l0``), and so on — the same parent-context
capture the reference does imperatively when it copies the person id
onto every child record.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Family:
    """One typed record family extracted from a nested document.

    ``explode``: successive array fields, each RELATIVE to the previous
    level (``["orders", "items"]`` explodes ``doc.orders`` then
    ``l0.items``).  Empty = document-level family (one row per doc).
    ``select``: output column name → dotted source path rooted at a
    level alias (``"doc.cust_id"``, ``"l0.status"``, ``"l1.qty"``).
    """

    explode: tuple[str, ...] = ()
    select: dict[str, str] = field(default_factory=dict)


def family_frame(
    docs: DataFrame,
    json_col: str,
    schema: str,
    fam: Family,
    pre_parsed: bool = False,
) -> DataFrame:
    """Compile one :class:`Family` over ``docs[json_col]``.

    ``schema`` is the FULL document schema (DDL string or StructType);
    per-family subtree pruning is Catalyst's job, not the caller's.
    With ``pre_parsed=True``, ``json_col`` must already be the parsed
    document struct column (shared-parse mode)."""
    if pre_parsed:
        cur = docs.withColumn("doc", F.col(json_col))
    else:
        cur = docs.select(F.from_json(F.col(json_col), schema).alias("doc"))
    for i, arr in enumerate(fam.explode):
        parent = "doc" if i == 0 else f"l{i - 1}"
        cur = cur.select("*", F.explode(F.col(f"{parent}.{arr}")).alias(f"l{i}"))
    return cur.select(
        *[F.col(path).alias(name) for name, path in fam.select.items()]
    )


class FamilyFrames(dict):
    """dict of family-name → DataFrame, plus ``unpersist()`` for the
    shared-parse intermediate (no-op in independent-parse mode).  The
    persisted parse of the FULL corpus would otherwise pin executor
    memory/disk for the rest of the application with no public handle
    to release it."""

    def __init__(self, frames: dict[str, DataFrame], parsed: DataFrame | None = None):
        super().__init__(frames)
        self.parsed = parsed

    def unpersist(self, blocking: bool = False) -> "FamilyFrames":
        if self.parsed is not None:
            self.parsed.unpersist(blocking)
        return self


def family_frames(
    docs: DataFrame,
    json_col: str,
    schema: str,
    families: dict[str, Family],
    shared_parse: bool = False,
) -> FamilyFrames:
    """All families of one document table.  Default: independent
    pruned parses (the 100 TB shape — each family's scan decodes only
    its subtree).  ``shared_parse=True``: parse once into a persisted
    intermediate every family selects from (the one-job backfill
    shape); call ``.unpersist()`` on the returned mapping when the
    backfill job is done."""
    if not shared_parse:
        return FamilyFrames(
            {
                name: family_frame(docs, json_col, schema, fam)
                for name, fam in families.items()
            }
        )
    parsed = docs.select(F.from_json(F.col(json_col), schema).alias("_doc")).persist()
    return FamilyFrames(
        {
            name: family_frame(parsed, "_doc", schema, fam, pre_parsed=True)
            for name, fam in families.items()
        },
        parsed=parsed,
    )
