"""Binary .xlsx ingestion with no third-party reader (SURVEY §2 S1).

The reference scans Excel workbooks row-by-row via ``pd.read_excel``
(/root/reference/src/core/logic/project_loader.py:79-93,
research_group_loader.py:124-152).  This container has no
openpyxl/xlrd, but a .xlsx file is only a ZIP of SpreadsheetML XML
parts — so the reader below parses them with stdlib ``zipfile`` +
``xml.etree``, and Spark distributes that work: the ``binaryFile``
source streams whole files as ``(path, content)`` rows, and parsing
runs inside ``mapInPandas`` (one Arrow batch of files in, wire rows
out).  No driver-side file loop, no per-row Python UDF — per-FILE
Python, which is the correct granularity for an opaque binary format
(same shape as the multimodal decode kernels).

Scale note: parallelism is per file (a workbook is not splittable,
like gzip text).  Thousands of dropped workbooks spread across
executors; one giant workbook does not.  That matches the reference's
unit of work (one uploaded spreadsheet = one batch).

Wire contract: every sheet is header-row + data rows, all cell values
surfaced as strings; ``decoded_feed`` then casts to the logical feed
schema JVM-side (arrays ride as space-joined text exactly like the CSV
wire; Excel serial date-times are converted with the 1899-12-30 epoch).
Columns are matched by HEADER NAME, not position, so producers may
reorder columns freely; missing columns read as null (additive
schema-evolution handoff works unchanged).
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType, TimestampType

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

# days from the Excel serial epoch (1899-12-30) to the unix epoch
EXCEL_EPOCH_DAYS = 25569
# largest serial Excel itself can represent (9999-12-31); anything
# bigger is NOT an Excel date (epoch seconds/millis, a stray id, ...)
EXCEL_MAX_SERIAL_DAYS = 2958465


def _col_index(ref: str) -> int:
    """'B7' -> 1 (0-based column index from an A1-style cell ref)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _text(el) -> str:
    """Concatenated text of all <t> runs under ``el`` (rich-text safe)."""
    return "".join(t.text or "" for t in el.iter(f"{_NS}t"))


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the first workbook sheet via the OPC relationship parts
    (robust to non-default part names); fall back to the conventional
    ``xl/worksheets/sheet1.xml``."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        first = wb.find(f"{_NS}sheets/{_NS}sheet")
        rid = first.get(f"{_REL_NS}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target")
                if target.startswith("/"):
                    return target.lstrip("/")
                return posixpath.normpath(posixpath.join("xl", target))
    except (KeyError, ET.ParseError, AttributeError):
        pass
    return "xl/worksheets/sheet1.xml"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_text(si) for si in root.iter(f"{_NS}si")]


def parse_xlsx(data: bytes) -> list[list[str | None]]:
    """Parse one workbook's first sheet into dense rows of cell strings
    (``None`` for gap cells — SpreadsheetML rows are sparse).  Handles
    shared strings (t="s"), inline strings (t="inlineStr"), cached
    formula strings (t="str"), booleans (t="b") and raw numerics."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
        out: list[list[str | None]] = []
        for row in sheet.iter(f"{_NS}row"):
            cells: list[str | None] = []
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                t = c.get("t")
                if t == "s":
                    v = c.find(f"{_NS}v")
                    val = shared[int(v.text)] if v is not None else None
                elif t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = _text(is_el) if is_el is not None else None
                elif t == "b":
                    v = c.find(f"{_NS}v")
                    val = None if v is None else ("true" if v.text == "1" else "false")
                else:  # "n", "str", "e" or untyped numeric
                    v = c.find(f"{_NS}v")
                    val = v.text if v is not None else None
                cells.append(val)
            out.append(cells)
        return out


def iter_records(data: bytes) -> Iterator[dict[str, str | None]]:
    """Header-keyed records from the first sheet (reference contract:
    first row is the column-name header, project_loader.py:79-93)."""
    rows = parse_xlsx(data)
    if not rows:
        return
    header = [h if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    for cells in rows[1:]:
        if all(v is None for v in cells):
            continue  # blank spacer rows Excel users leave behind
        yield {
            h: (cells[i] if i < len(cells) else None) for i, h in enumerate(header)
        }


# --------------------------------------------------------------- spark side


def wire_schema(logical: StructType) -> StructType:
    """All-string wire schema: array<T> columns ride as ``<name>_txt``
    space-joined text (same convention as the CSV wire in
    streaming/runner.py), everything else keeps its name."""
    fields = []
    for f in logical.fields:
        name = f"{f.name}_txt" if isinstance(f.dataType, ArrayType) else f.name
        fields.append(StructField(name, StringType(), True))
    return StructType(fields)


def decoded_cols(logical: StructType) -> list:
    """JVM-side wire→logical decode expressions.  ``try_cast``
    throughout (ANSI mode is on in Spark 4; a malformed producer cell
    must surface as null → quarantined by the validators, not abort the
    stream — P-family contract).  Timestamps accept ISO strings OR
    Excel serial day numbers (1899-12-30 epoch)."""

    def _caster(t):
        return lambda x: x.try_cast(t)

    cols = []
    for f in logical.fields:
        if isinstance(f.dataType, ArrayType):
            wire = f"{f.name}_txt"
            elem = f.dataType.elementType.simpleString()
            cols.append(
                F.when(
                    F.col(wire).isNotNull() & (F.length(wire) > 0),
                    F.transform(F.split(wire, " "), _caster(elem)),
                ).alias(f.name)
            )
        elif isinstance(f.dataType, TimestampType):
            # Serial fallback is range-gated to the representable Excel
            # day span (0 .. 9999-12-31).  Outside it — e.g. a producer
            # writing unix EPOCH SECONDS (1.7e9) — timestamp_seconds
            # would hit Math.multiplyExact long overflow (an
            # ANSI-independent java.lang.ArithmeticException) and abort
            # the stream forever on checkpoint redelivery; gated, such
            # cells decode to null and land in quarantine instead.
            serial_days = F.expr(f"try_cast({f.name} as double)")
            serial = F.when(
                serial_days.between(0.0, float(EXCEL_MAX_SERIAL_DAYS)),
                (serial_days - F.lit(EXCEL_EPOCH_DAYS)) * 86400.0,
            )
            cols.append(
                F.coalesce(
                    F.expr(f"try_cast({f.name} as timestamp)"),
                    F.timestamp_seconds(serial.try_cast("long")),
                ).alias(f.name)
            )
        else:
            cols.append(
                F.expr(f"try_cast({f.name} as {f.dataType.simpleString()})").alias(
                    f.name
                )
            )
    return cols


def _record_corrupt(corrupt_dir: str | None, path: str, err: Exception) -> None:
    """Executor-side corrupt-file marker: one small JSON per bad drop,
    named by a hash of the source path so checkpoint REDELIVERY of the
    same batch rewrites the same marker (idempotent, like the kernel's
    MERGE).  ``corrupt_dir`` is on the same shared filesystem as the
    lake/checkpoint, so no driver round-trip is needed."""
    import hashlib
    import json
    import os
    import sys

    print(f"xlsx_feed: skipping corrupt drop {path}: {err!r}", file=sys.stderr)
    if not corrupt_dir:
        return
    # Best-effort only: this runs INSIDE the per-file except handler,
    # so a marker-write failure (unwritable dir, disk full, URI-style
    # checkpoint path the local os module can't create) escaping here
    # would re-wedge the stream — the exact poison pill the handler
    # exists to contain.  The stderr line above is the fallback record.
    try:
        os.makedirs(corrupt_dir, exist_ok=True)
        name = hashlib.sha256(path.encode()).hexdigest()[:24]
        tmp = os.path.join(corrupt_dir, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"path": path, "error": repr(err)}, fh)
        os.replace(tmp, os.path.join(corrupt_dir, f"{name}.json"))
    except OSError as marker_err:  # pragma: no cover - env-dependent
        print(
            f"xlsx_feed: could not record corrupt marker for {path}: "
            f"{marker_err!r}",
            file=sys.stderr,
        )


def xlsx_feed(
    spark: SparkSession,
    input_dir: str,
    logical_schema: StructType,
    max_files_per_trigger: int | None = None,
    streaming: bool = True,
    corrupt_dir: str | None = None,
) -> DataFrame:
    """Change-feed DataFrame over ``*.xlsx`` drops in ``input_dir``.

    ``binaryFile`` source (streaming or batch) → ``mapInPandas`` parse
    (per-file Python, Arrow-batched) → JVM-side cast to the logical
    schema.  Header names select columns, so column order in the
    workbook is free and unknown extra columns are ignored.

    Per-FILE error containment (T9, quarantine-not-abort): a truncated
    upload or renamed non-zip raises inside the parse; without
    containment the micro-batch fails and checkpoint redelivery re-fails
    on the same file forever — a permanent poison pill.  Instead each
    corrupt drop is skipped, logged to executor stderr, and (when
    ``corrupt_dir`` is set — ``run_stream`` points it inside the
    checkpoint dir) recorded as a dead-letter marker an operator can
    sweep."""
    import pandas as pd

    wire = wire_schema(logical_schema)
    wire_names = [f.name for f in wire.fields]

    def _parse(batches):
        for pdf in batches:
            recs = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    for rec in iter_records(bytes(content)):
                        recs.append([rec.get(n) for n in wire_names])
                except Exception as err:  # malformed drop: contain, don't wedge
                    _record_corrupt(corrupt_dir, str(path), err)
            yield pd.DataFrame(recs, columns=wire_names, dtype=object)

    reader = (spark.readStream if streaming else spark.read).format("binaryFile")
    reader = reader.option("pathGlobFilter", "*.xlsx")
    if streaming:
        # binaryFile's schema is fixed, but a STREAMING file source
        # still demands it be stated explicitly
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(input_dir)
    return (
        raw.select("path", "content")
        .mapInPandas(_parse, schema=wire)
        .select(*decoded_cols(logical_schema))
    )


# ------------------------------------------------------------------ writer

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
{shared}</Types>"""

_SHARED_OVERRIDE = '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>\n'

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
{shared}</Relationships>"""

_SHARED_REL = '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>\n'


def _col_letter(idx: int) -> str:
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_xlsx(
    path: str,
    header: list[str],
    rows: list[list],
    use_shared_strings: bool = False,
) -> None:
    """Minimal valid .xlsx writer (stdlib zipfile) — the test-fixture
    twin of the reader: numbers as numeric cells, strings as inline or
    shared-string cells, None as a GAP (cell omitted, exercising the
    sparse-row path).  Not a general sink — the engine's sinks are
    parquet/JSON (K1/K3); this exists so binary-ingest tests and the
    streaming drive can produce real workbooks."""
    shared: dict[str, int] = {}
    ws = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    ws.append(f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>')
    for r, cells in enumerate([header] + rows, start=1):
        ws.append(f'<row r="{r}">')
        for i, v in enumerate(cells):
            if v is None:
                continue
            ref = f"{_col_letter(i)}{r}"
            if isinstance(v, bool):
                ws.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            elif isinstance(v, (int, float)):
                ws.append(f'<c r="{ref}"><v>{v}</v></c>')
            elif use_shared_strings:
                idx = shared.setdefault(str(v), len(shared))
                ws.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
            else:
                ws.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{_esc(str(v))}</t></is></c>"
                )
        ws.append("</row>")
    ws.append("</sheetData></worksheet>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(shared=_SHARED_OVERRIDE if use_shared_strings else ""),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _WORKBOOK_RELS.format(shared=_SHARED_REL if use_shared_strings else ""),
        )
        zf.writestr("xl/worksheets/sheet1.xml", "".join(ws))
        if use_shared_strings:
            items = sorted(shared, key=shared.get)
            ss = [
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
                f'<sst xmlns="{_NS[1:-1]}" count="{len(items)}" uniqueCount="{len(items)}">',
            ]
            for s in items:
                ss.append(f'<si><t xml:space="preserve">{_esc(s)}</t></si>')
            ss.append("</sst>")
            zf.writestr("xl/sharedStrings.xml", "".join(ss))
