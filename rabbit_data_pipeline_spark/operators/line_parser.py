"""LineParser (reference src/Transforms/LineParser.php) — delimited
file/text parsing with the reference's knobs:

  fileType csv|txt(tsv)|xls* · delimiter/explode · headLine (header
  row) · dataLine (first data row) · endLine · columns (explicit
  names) · include/exclude (column indices) · map (rename) · addField
  (constant columns) · idKey (generated id)

Spark-first: the fast path is the native CSV reader (whole-stage
codegen, no Python). Line-range knobs (dataLine/endLine beyond a
header) need PER-FILE line numbers, which the csv reader doesn't
expose — those go binaryFile → mapInPandas with in-file numbering
(one Arrow batch per file, no Python-RDD round-trip; the reference
reads each file serially line-by-line, LineParser.php:150, so
file-level parallelism is the faithful distributed spelling).

xlsx and legacy .xls: parsed natively — an xlsx is a zip of XML
(zipfile + ElementTree) and a .xls is BIFF8 in a CFB container
(operators/xls.py, pure struct) — no excel dependency either way (the
reference gates both on ext-xlswriter, LineParser.php:118). Scale
shape: `binaryFile` scan → mapInPandas, so N workbook files parse on
N executor slots — a workbook can't be split, but file-level
parallelism is exactly how the reference's FindFiles→LineParser
fan-out behaves.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin

SUPPORT_EXT = ("csv", "txt", "tsv", "xls", "xlsx")  # reference SUPPORT_EXT

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def parse_xlsx_bytes(content: bytes, sheet_name: str | None = None) -> list[tuple[int, list[str]]]:
    """Decode the first worksheet of an xlsx workbook into (row_number,
    cells) pairs using only the stdlib (zipfile + ElementTree):
    resolves sharedStrings and inline strings, places cells by their
    A1-style column reference (so sparse rows keep their gaps), and
    keeps the sheet's own 1-based row numbers from the row `r`
    attribute — real producers OMIT empty rows from the XML (ECMA-376),
    so positional numbering would silently shift headLine/dataLine
    addressing. "First worksheet" = the first <sheet> in
    xl/workbook.xml resolved through the workbook rels (sheet ORDER is
    defined there, not by member filename — a reordered workbook can
    have sheet2.xml first); lowest-numbered sheetN.xml is the fallback
    when the workbook/rels members are absent or unresolvable. Cells
    lacking an `r` reference are placed at prev_col+1 per ECMA-376
    §18.3.1.4 (placing at len(cells) would collide after a sparse
    referenced cell). Runs on executors inside the mapInPandas batch
    below."""
    import io
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(io.BytesIO(content)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        first_sheet = (
            _resolve_sheet_by_name(z, sheet_name) if sheet_name is not None else _resolve_first_sheet(z)
        )
        if first_sheet is None:
            target = f"sheet {sheet_name!r}" if sheet_name is not None else "xl/worksheets/sheet*.xml member"
            raise ValueError(f"xlsx has no {target}")
        root = ET.fromstring(z.read(first_sheet))

    rows: list[tuple[int, list[str]]] = []
    for row in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, str] = {}
        prev_col = -1
        for c in row.iter(f"{_XLSX_NS}c"):
            col = 0
            for ch in c.get("r", ""):
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            col = col - 1 if col else prev_col + 1
            prev_col = col
            if c.get("t") == "inlineStr":
                v = "".join(t.text or "" for t in c.iter(f"{_XLSX_NS}t"))
            else:
                ve = c.find(f"{_XLSX_NS}v")
                v = ve.text if ve is not None and ve.text is not None else ""
                if c.get("t") == "s":
                    v = shared[int(v)]
            cells[col] = v
        width = max(cells) + 1 if cells else 0
        r_attr = row.get("r")
        line = int(r_attr) if r_attr else (rows[-1][0] + 1 if rows else 1)
        rows.append((line, [cells.get(i, "") for i in range(width)]))
    return rows


def _resolve_first_sheet(z: "zipfile.ZipFile") -> str | None:
    """Workbook member path of the first sheet in display order:
    xl/workbook.xml's <sheets> order + xl/_rels/workbook.xml.rels
    r:id → Target mapping (ECMA-376 §18.2.20); numeric sheetN.xml sort
    as fallback."""
    import posixpath
    import re
    import xml.etree.ElementTree as ET

    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    rid_attr = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")}
        for sheet in wb.iter(f"{_XLSX_NS}sheet"):
            target = targets.get(sheet.get(rid_attr))
            if not target:
                continue
            member = target if target.startswith("/") else posixpath.normpath(f"xl/{target}")
            member = member.lstrip("/")
            # Only WORKsheets: a workbook whose first display tab is a
            # chartsheet (xl/chartsheets/…) has no row grid — taking it
            # would silently yield zero rows.
            if member.startswith("xl/worksheets/") and member in z.namelist():
                return member
    except (KeyError, ET.ParseError):
        pass
    sheets = sorted(
        (n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    return sheets[0] if sheets else None


def _resolve_sheet_by_name(z: "zipfile.ZipFile", name: str) -> str | None:
    """Member path of the worksheet whose display NAME matches —
    reference LineParser's `sheet` knob (LineParser.php `sheet`,
    doc/LineParser.md): sheets are addressed by tab name, never by
    member filename."""
    import posixpath
    import xml.etree.ElementTree as ET

    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    rid_attr = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    except (KeyError, ET.ParseError):
        return None
    targets = {r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")}
    for sheet in wb.iter(f"{_XLSX_NS}sheet"):
        if sheet.get("name") != name:
            continue
        target = targets.get(sheet.get(rid_attr))
        if not target:
            return None
        member = target if target.startswith("/") else posixpath.normpath(f"xl/{target}")
        member = member.lstrip("/")
        return member if member in z.namelist() else None
    return None


def _read_grid_indexed(
    spark: SparkSession, path: str | list[str], parse_fn, reader_options: dict | None = None
) -> DataFrame:
    """(__line, cells) per worksheet row, 1-based per file. binaryFile →
    mapInPandas: each workbook is one Arrow row, parsed where it lands
    by `parse_fn` (parse_xlsx_bytes or parse_xls_bytes)."""
    import pandas as pd

    binf = spark.read.format("binaryFile").options(**(reader_options or {})).load(path)
    schema = StructType(
        [StructField("__line", LongType()), StructField("cells", ArrayType(StringType()))]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            lines: list[int] = []
            cell_rows: list[list[str]] = []
            for content in pdf["content"]:
                for line, r in parse_fn(bytes(content)):
                    lines.append(line)
                    cell_rows.append(r)
            yield pd.DataFrame({"__line": lines, "cells": cell_rows})

    return binf.select("content").mapInPandas(gen, schema)


def _read_xlsx_indexed(
    spark: SparkSession, path: str | list[str], reader_options: dict | None = None
) -> DataFrame:
    return _read_grid_indexed(spark, path, parse_xlsx_bytes, reader_options)


def _read_text_indexed(
    spark: SparkSession,
    path: str | list[str],
    reader_options: dict | None = None,
    line_sep: str | None = None,
) -> DataFrame:
    """(__line, value) per text line, 1-based PER FILE — the text twin
    of _read_xlsx_indexed. binaryFile → mapInPandas: each file's bytes
    split on newlines where they land, no Python-RDD round-trip (the
    old zipWithIndex spelling pickled every line through the driver's
    RDD path and numbered lines across the concatenation of all files,
    which is not the reference's per-file semantics,
    LineParser.php:88-110). A single file can't split across tasks —
    matching the serial reference — but N files parse on N slots.

    Memory shape: binaryFile materializes each file's raw bytes in one
    task (hard cap ~2 GB from the JVM byte array; guarded below with a
    clear error), and the decode emits bounded 64k-line pandas chunks
    so peak memory is ~file bytes + one chunk, not bytes + full decode
    + full frame. Line-RANGE parsing of a single >1 GB file is the
    wrong tool regardless — at that size use the native csv reader
    (head_line∈{None,1}) which splits the file across tasks."""
    import pandas as pd

    binf = spark.read.format("binaryFile").options(**(reader_options or {})).load(path)
    schema = StructType(
        [StructField("__line", LongType()), StructField("value", StringType())]
    )
    max_bytes = 1 << 30
    chunk_lines = 65536
    # Custom record separator (reference LineParser `split` knob,
    # default PHP_EOL): split on its exact bytes, no \r stripping —
    # with an explicit separator a \r is content, not line ending.
    sep_bytes = line_sep.encode("utf-8") if line_sep is not None else None

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                raw = bytes(content)
                if raw[:2] == b"\x1f\x8b":
                    # transparent gzip, matching the native csv fast
                    # path (Spark decompresses .gz at scan time); the
                    # size cap applies to the DECOMPRESSED text
                    import gzip as _gzip

                    raw = _gzip.decompress(raw)
                if len(raw) > max_bytes:
                    raise ValueError(
                        f"line-range parsing loads whole files per task; this file is "
                        f"{len(raw)>>20} MiB (cap 1024). Split the file or use the "
                        "native csv fast path (head_line=1/None, no end_line)."
                    )
                line_no = 0
                lines_iter = raw.split(sep_bytes if sep_bytes is not None else b"\n")
                if lines_iter and lines_iter[-1] == b"":
                    lines_iter.pop()
                for off in range(0, len(lines_iter), chunk_lines):
                    chunk = lines_iter[off : off + chunk_lines]
                    if sep_bytes is None:
                        vals = [
                            (ln[:-1] if ln.endswith(b"\r") else ln).decode("utf-8", "replace")
                            for ln in chunk
                        ]
                    else:
                        vals = [ln.decode("utf-8", "replace") for ln in chunk]
                    yield pd.DataFrame(
                        {
                            "__line": range(line_no + 1, line_no + len(vals) + 1),
                            "value": vals,
                        }
                    )
                    line_no += len(vals)

    return binf.select("content").mapInPandas(gen, schema)


def _sniff_header(df_idx: DataFrame, head_line: int, value_col: str) -> list | None:
    """Header cells at head_line. With multiple input files the filter
    returns one row PER FILE; headers must agree (distinct) or the
    choice would be nondeterministic — reference semantics are
    per-file serial reads, so differing headers are a caller error.
    Cell arrays are compared with trailing empties stripped: Excel
    routinely emits touched-but-empty styled cells, and ['k','v'] vs
    ['k','v',''] is the same logical header."""
    col = F.col(value_col)
    if value_col == "cells":
        # slice to the last non-empty cell (0-length when all empty;
        # sequence(1,0) is DESCENDING in Spark, hence the size guard)
        col = F.expr(
            f"IF(size({value_col}) = 0, {value_col},"
            f" slice({value_col}, 1, aggregate(sequence(1, size({value_col})), 0,"
            f" (acc, i) -> IF(element_at({value_col}, i) <> '', i, acc))))"
        )
    rows = df_idx.filter(F.col("__line") == head_line).select(col.alias(value_col)).distinct().take(2)
    if len(rows) > 1:
        raise ValueError(
            f"input files disagree on the header at line {head_line}; "
            "pass columns= explicitly to parse heterogeneous files"
        )
    return rows[0][0] if rows else None


def parse_lines(
    spark: SparkSession,
    path: str,
    file_type: str = "csv",
    delimiter: str | None = None,
    head_line: int | None = 1,
    data_line: int | list[int] = 2,
    end_line: int | None = None,
    columns: list[str] | None = None,
    include: list[int] | dict[int, str | None] | None = None,
    exclude: list[int] | None = None,
    rename: dict[str, str] | None = None,
    add_fields: dict[str, Any] | None = None,
    id_key: str | None = None,
    reader_options: dict | None = None,
    sheet: str | None = None,
    field: dict[str, int] | None = None,
    field_line: int | None = None,
    split: str | None = None,
    enclosure: str | None = None,
    escape: str | None = None,
) -> DataFrame:
    """`reader_options` are extra Spark reader options (pathGlobFilter,
    recursiveFileLookup, …) applied to whichever source reads `path` —
    this is how a FindFiles listing spec flows through without
    collecting the matched paths to the driver.

    Reference LineParser knob parity (doc/LineParser.md):
    - `sheet` selects the Excel worksheet by TAB NAME (the reference
      makes it mandatory for xls/xlsx; here default = first sheet).
    - `data_line` may be a LIST: rows in the list PLUS everything from
      max(list) on are data (LineParser.php run loop:
      ``in_array($i, dataLine) || $i >= max(dataLine)``); header and
      field rows are excluded from data either way.
    - `field` + `field_line`: some producers hoist constant columns
      into one shared row to shrink the file; `field` maps new column
      name → cell index in row `field_line`, and the extracted values
      attach to EVERY data row (as named columns — the reference
      splices them positionally, same information).
    - `include` may be a DICT {index: None | SQL expr}: the reference
      evals PHP per cell with ``$col`` bound (LineParser.php
      dealInclude); here the expr is a Spark SQL expression over the
      same ``$col`` placeholder — JVM-side, no eval.
    - `split` is the RECORD separator (LineParser.php:22 ``split``,
      default PHP_EOL — here default newline): the fast path maps it
      to the csv reader's ``lineSep`` (must be one character there, a
      Spark reader limit), the line-range path splits file bytes on it
      directly (any string).
    - `enclosure` / `escape` are the csv quote and escape characters
      (LineParser.php:31-33, fgetcsv defaults ``"`` and ``\\``) —
      mapped to the reader/from_csv ``quote``/``escape`` options, and
      honored when sniffing the header row.  All three are ignored for
      xlsx/xls, as in the reference (cell grids have no separators)."""
    if file_type not in SUPPORT_EXT:
        raise ValueError(f"fileType only support ({' & '.join(SUPPORT_EXT)})")  # LineParser.php:115
    sep = delimiter or ("\t" if file_type in ("txt", "tsv") else ",")

    if file_type in ("xlsx", "xls"):
        # Cache scoped to the sniff phase: header + width inference
        # share one parse, then the cache is released — holding it for
        # the caller's action would pin every workbook's rows in
        # executor memory across parse_lines calls (the caller's single
        # action re-parses once; bounded memory beats one saved scan).
        if file_type == "xls":
            from rabbit_data_pipeline_spark.operators.xls import parse_xls_bytes

            parse_fn = (
                (lambda b, _s=sheet: parse_xls_bytes(b, sheet_name=_s))
                if sheet is not None
                else parse_xls_bytes
            )
            df_idx = _read_grid_indexed(spark, path, parse_fn, reader_options)
        else:
            parse_fn = (
                (lambda b, _s=sheet: parse_xlsx_bytes(b, sheet_name=_s))
                if sheet is not None
                else parse_xlsx_bytes
            )
            df_idx = _read_grid_indexed(spark, path, parse_fn, reader_options)
        header_names = columns
        if not columns:
            df_idx = df_idx.cache()
        try:
            if head_line is not None and not columns:
                h = _sniff_header(df_idx, head_line, "cells")
                header_names = list(h) if h is not None else None
            body = df_idx.filter(_data_line_filter(data_line, head_line, field_line))
            if end_line is not None:
                body = body.filter(F.col("__line") < end_line)
            if field and field_line is not None:
                add_fields = {**_field_values(df_idx, field, field_line, None), **(add_fields or {})}
            if header_names:
                n_cols = len(header_names)
            else:
                # max width over the whole body (rows are trimmed to their
                # last non-empty cell, so first() would undercount; an
                # empty body yields 0 columns instead of crashing).
                n_cols = (body.agg(F.max(F.size("cells"))).first()[0]) or 0
            names = header_names or [f"_c{i}" for i in range(n_cols)]
            df = body.select(*[F.col("cells").getItem(i).alias(n) for i, n in enumerate(names)])
        finally:
            df_idx.unpersist()
        return _apply_column_opts(df, include, exclude, rename, add_fields, id_key)

    simple = (
        head_line in (None, 1)
        and isinstance(data_line, int)
        and data_line == (2 if head_line == 1 else 1)
        and end_line is None
        and not field
    )
    csv_opts: dict[str, str] = {}
    if enclosure is not None:
        csv_opts["quote"] = enclosure
    if escape is not None:
        csv_opts["escape"] = escape
    if simple:
        # Fast path: native csv reader, fully JVM-side.
        reader = (
            spark.read.format("csv")
            .option("header", "true" if head_line == 1 else "false")
            .option("sep", sep)
            .options(**csv_opts)
            .options(**(reader_options or {}))
        )
        if split is not None:
            reader = reader.option("lineSep", split)
        df = reader.load(path)
        if columns:
            df = df.toDF(*columns)
    else:
        # Line-range path: explicit per-file line numbers via
        # binaryFile → mapInPandas (no Python-RDD round-trip), then
        # from_csv stays JVM-side for the actual parsing.
        df_idx = _read_text_indexed(spark, path, reader_options, line_sep=split)
        header_names = columns
        if not columns:
            df_idx = df_idx.cache()
        try:
            if head_line is not None and not columns:
                h = _sniff_header(df_idx, head_line, "value")
                header_names = _split_cells(h, sep, enclosure, escape) if h is not None else None
            body = df_idx.filter(_data_line_filter(data_line, head_line, field_line))
            if end_line is not None:
                body = body.filter(F.col("__line") < end_line)  # reference: i >= endLine stops BEFORE endLine
            if field and field_line is not None:
                add_fields = {
                    **_field_values(df_idx, field, field_line, sep, enclosure, escape),
                    **(add_fields or {}),
                }
            if header_names:
                n_cols = len(header_names)
            else:
                first_row = body.first()
                if first_row is None:
                    raise ValueError(
                        "no data rows in the requested line range; pass columns= "
                        "to parse a possibly-empty range"
                    )
                n_cols = len(_split_cells(first_row["value"], sep, enclosure, escape))
            names = header_names or [f"_c{i}" for i in range(n_cols)]
            schema = ", ".join(f"`{n}` string" for n in names)
            df = body.select(
                F.from_csv("value", schema, {"sep": sep, **csv_opts}).alias("r")
            ).select("r.*")
        finally:
            df_idx.unpersist()

    return _apply_column_opts(df, include, exclude, rename, add_fields, id_key)


def _split_cells(line: str, sep: str, enclosure: str | None, escape: str | None) -> list[str]:
    """Split ONE driver-side line (header / field row / width probe)
    into cells honoring the csv quote+escape knobs — the body rows are
    parsed JVM-side by from_csv with the same options.  Plain split
    when no quoting is in play (bit-compatible with the pre-knob
    behavior, and str.split keeps empty trailing cells that csv.reader
    also keeps)."""
    if (enclosure is None and escape is None) or (sep not in line):
        return line.split(sep)
    import csv as _csv
    import io as _io

    rows = list(
        _csv.reader(
            _io.StringIO(line),
            delimiter=sep,
            quotechar=enclosure or '"',
            escapechar=escape,
            doublequote=escape is None,
        )
    )
    return rows[0] if rows else [""]


def _data_line_filter(data_line, head_line, field_line):
    """Data-row predicate: reference semantics are ``i in dataLine or
    i >= max(dataLine)`` with header/field rows never data."""
    col = F.col("__line")
    if isinstance(data_line, (list, tuple)):
        lines = [int(x) for x in data_line]
        cond = (col >= max(lines)) | col.isin(lines)
    else:
        cond = col >= int(data_line)
    for special in (head_line, field_line):
        if special is not None:
            cond = cond & (col != int(special))
    return cond


def _field_values(
    df_idx,
    field: dict[str, int],
    field_line: int,
    sep: str | None,
    enclosure: str | None = None,
    escape: str | None = None,
) -> dict[str, Any]:
    """Extract the shared-value row once (a single tiny row to the
    driver — the field row is one line by definition) and map it to
    {new_column: literal}. With multiple input files the filter yields
    one row PER FILE; like the header sniff, the field rows must AGREE
    or the attached constants would be nondeterministic."""
    col = "cells" if sep is None else "value"
    rows = df_idx.filter(F.col("__line") == int(field_line)).select(col).distinct().take(2)
    if not rows:
        raise ValueError(f"field_line {field_line} not present in input")
    if len(rows) > 1:
        raise ValueError(
            f"input files disagree on the field row at line {field_line}; "
            "parse heterogeneous files separately"
        )
    row = rows[0]
    cells = list(row["cells"]) if sep is None else _split_cells(row["value"], sep, enclosure, escape)
    out: dict[str, Any] = {}
    for name, idx in field.items():
        out[name] = cells[int(idx)] if 0 <= int(idx) < len(cells) else None
    return out


def _apply_column_opts(
    df: DataFrame,
    include: list[int] | dict[int, str | None] | None,
    exclude: list[int] | None,
    rename: dict[str, str] | None,
    add_fields: dict[str, Any] | None,
    id_key: str | None,
) -> DataFrame:
    # include/exclude by position (reference uses integer indices)
    if exclude:
        keep = [c for i, c in enumerate(df.columns) if i not in set(exclude)]
        df = df.select(*keep)
    if include:
        if isinstance(include, dict):
            # {index: None | SQL expr with $col} — reference dealInclude
            # evals PHP per cell; here the transform stays JVM-side.
            cols = []
            for i, expr in include.items():
                name = df.columns[int(i)]
                if expr:
                    cols.append(F.expr(expr.replace("$col", f"`{name}`")).alias(name))
                else:
                    cols.append(F.col(name))
            df = df.select(*cols)
        else:
            df = df.select(*[df.columns[i] for i in include])
    if rename:
        df = df.withColumnsRenamed(rename)
    for name, value in (add_fields or {}).items():
        df = df.withColumn(name, F.lit(value))
    if id_key:
        df = df.withColumn(id_key, F.expr("uuid()"))
    return df


@plugin("transform.line_parser")
def _line_parser(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Pipeline plugin: parses cfg['path'], or the files produced by an
    upstream find_files node (reference FindFiles → LineParser chain).

    When the upstream listing carries its load spec
    (``__rdps_listing__``, set by sources.files.find_files), the glob
    is passed straight through — the matched paths never round-trip
    through the driver, so a millions-of-files scan stays distributed.
    Otherwise (arbitrary upstream DataFrames of paths) falls back to
    collecting the path column."""
    path = cfg.get("path")
    reader_options = cfg.get("readerOptions", cfg.get("reader_options"))
    if path is None and inputs:
        (files_df,) = inputs
        listing = getattr(files_df, "__rdps_listing__", None)
        if listing is not None:
            if files_df.isEmpty():  # limit-1 probe, not a path collect
                raise ValueError("no input files")
            path = listing["path"]
            reader_options = {
                **{k: v for k, v in listing.items() if k != "path"},
                **(reader_options or {}),
            }
        else:
            path = [r["path"].replace("file:", "") for r in files_df.select("path").collect()]
            if not path:
                raise ValueError("no input files")
    return parse_lines(
        sch.spark,
        path,
        file_type=cfg.get("fileType", cfg.get("file_type", "csv")),
        delimiter=cfg.get("delimiter") or cfg.get("explode"),
        head_line=cfg.get("headLine", cfg.get("head_line", 1)),
        data_line=cfg.get("dataLine", cfg.get("data_line", 2)),
        end_line=cfg.get("endLine", cfg.get("end_line")),
        columns=cfg.get("columns"),
        include=cfg.get("include"),
        exclude=cfg.get("exclude"),
        rename=cfg.get("map"),
        add_fields=cfg.get("addField", cfg.get("add_fields")),
        id_key=cfg.get("idKey", cfg.get("id_key")),
        reader_options=reader_options,
        sheet=cfg.get("sheet"),
        field=cfg.get("field"),
        field_line=cfg.get("fieldLine", cfg.get("field_line")),
    )
