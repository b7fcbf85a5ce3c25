"""LineParser (reference src/Transforms/LineParser.php) — delimited
file/text parsing with the reference's knobs:

  fileType csv|txt(tsv)|xls* · delimiter/explode · headLine (header
  row) · dataLine (first data row) · endLine · columns (explicit
  names) · include/exclude (column indices) · map (rename) · addField
  (constant columns) · idKey (generated id)

Spark-first: the fast path is the native CSV reader (whole-stage
codegen, no Python). Line-range knobs (dataLine/endLine beyond a
header) need per-file line numbers, which the csv reader doesn't
expose — those use text + from_csv with an explicit line index. The
index comes from zipWithIndex (one extra count job; line numbers are
inherently sequential, so this is the honest distributed spelling —
the reference reads the file serially line-by-line, LineParser.php:150).

xlsx: parsed natively — an xlsx is a zip of XML, so the stdlib
(zipfile + ElementTree) decodes it with no excel dependency (the
reference gates on ext-xlswriter, LineParser.php:118; we only gate
legacy binary .xls/BIFF). Scale shape: `binaryFile` scan →
mapInPandas, so N workbook files parse on N executor slots — a zip
member can't be split, but file-level parallelism is exactly how the
reference's FindFiles→LineParser fan-out behaves.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin

SUPPORT_EXT = ("csv", "txt", "tsv", "xls", "xlsx")  # reference SUPPORT_EXT

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def parse_xlsx_bytes(content: bytes) -> list[tuple[int, list[str]]]:
    """Decode the first worksheet of an xlsx workbook into (row_number,
    cells) pairs using only the stdlib (zipfile + ElementTree):
    resolves sharedStrings and inline strings, places cells by their
    A1-style column reference (so sparse rows keep their gaps), and
    keeps the sheet's own 1-based row numbers from the row `r`
    attribute — real producers OMIT empty rows from the XML (ECMA-376),
    so positional numbering would silently shift headLine/dataLine
    addressing. "First worksheet" = lowest sheet NUMBER (numeric, so
    sheet2 beats sheet10). Runs on executors inside the mapInPandas
    batch below."""
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
        sheets = sorted(
            (n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
        )
        if not sheets:
            raise ValueError("xlsx has no xl/worksheets/sheet*.xml member")
        root = ET.fromstring(z.read(sheets[0]))

    rows: list[tuple[int, list[str]]] = []
    for row in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, str] = {}
        for c in row.iter(f"{_XLSX_NS}c"):
            col = 0
            for ch in c.get("r", ""):
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            col = col - 1 if col else len(cells)
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


def _read_xlsx_indexed(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """(__line, cells) per worksheet row, 1-based per file — the xlsx
    twin of the text+zipWithIndex path. binaryFile → mapInPandas: each
    workbook is one Arrow row, parsed where it lands."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    schema = StructType(
        [StructField("__line", LongType()), StructField("cells", ArrayType(StringType()))]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            lines: list[int] = []
            cell_rows: list[list[str]] = []
            for content in pdf["content"]:
                for line, r in parse_xlsx_bytes(bytes(content)):
                    lines.append(line)
                    cell_rows.append(r)
            yield pd.DataFrame({"__line": lines, "cells": cell_rows})

    return binf.select("content").mapInPandas(gen, schema)


def parse_lines(
    spark: SparkSession,
    path: str,
    file_type: str = "csv",
    delimiter: str | None = None,
    head_line: int | None = 1,
    data_line: int = 2,
    end_line: int | None = None,
    columns: list[str] | None = None,
    include: list[int] | None = None,
    exclude: list[int] | None = None,
    rename: dict[str, str] | None = None,
    add_fields: dict[str, Any] | None = None,
    id_key: str | None = None,
) -> DataFrame:
    if file_type not in SUPPORT_EXT:
        raise ValueError(f"fileType only support ({' & '.join(SUPPORT_EXT)})")  # LineParser.php:115
    if file_type == "xls":
        raise NotImplementedError("legacy binary .xls (BIFF) needs an external reader; .xlsx parses natively")
    sep = delimiter or ("\t" if file_type in ("txt", "tsv") else ",")

    if file_type == "xlsx":
        # cache: header sniff, width inference, and the caller's action
        # would otherwise each re-read + re-unzip every workbook.
        df_idx = _read_xlsx_indexed(spark, path).cache()
        header_names = columns
        if head_line is not None and not columns:
            h = df_idx.filter(F.col("__line") == head_line).first()
            header_names = list(h["cells"]) if h else None
        body = df_idx.filter(F.col("__line") >= data_line)
        if end_line is not None:
            body = body.filter(F.col("__line") < end_line)
        if header_names:
            n_cols = len(header_names)
        else:
            # max width over the whole body (rows are trimmed to their
            # last non-empty cell, so first() would undercount; an
            # empty body yields 0 columns instead of crashing).
            n_cols = (body.agg(F.max(F.size("cells"))).first()[0]) or 0
        names = header_names or [f"_c{i}" for i in range(n_cols)]
        df = body.select(*[F.col("cells").getItem(i).alias(n) for i, n in enumerate(names)])
        return _apply_column_opts(df, include, exclude, rename, add_fields, id_key)

    simple = head_line in (None, 1) and data_line == (2 if head_line == 1 else 1) and end_line is None
    if simple:
        # Fast path: native csv reader, fully JVM-side.
        df = (
            spark.read.format("csv")
            .option("header", "true" if head_line == 1 else "false")
            .option("sep", sep)
            .load(path)
        )
        if columns:
            df = df.toDF(*columns)
    else:
        # Line-range path: explicit line numbers.
        lines = spark.read.text(path)
        indexed = lines.rdd.zipWithIndex().map(lambda t: (t[0][0], t[1] + 1))
        df_idx = spark.createDataFrame(
            indexed, StructType([StructField("value", StringType()), StructField("__line", LongType())])
        )
        header_names = columns
        if head_line is not None and not columns:
            header = df_idx.filter(F.col("__line") == head_line).first()
            header_names = header["value"].split(sep) if header else None
        body = df_idx.filter(F.col("__line") >= data_line)
        if end_line is not None:
            body = body.filter(F.col("__line") < end_line)  # reference: i >= endLine stops BEFORE endLine
        n_cols = len(header_names) if header_names else len(body.first()["value"].split(sep))
        names = header_names or [f"_c{i}" for i in range(n_cols)]
        schema = ", ".join(f"`{n}` string" for n in names)
        df = body.select(F.from_csv("value", schema, {"sep": sep}).alias("r")).select("r.*")

    return _apply_column_opts(df, include, exclude, rename, add_fields, id_key)


def _apply_column_opts(
    df: DataFrame,
    include: list[int] | None,
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
    """Pipeline plugin: parses cfg['path'], or the paths produced by an
    upstream find_files node (reference FindFiles → LineParser chain).
    Multiple upstream paths parse as one multi-file load."""
    path = cfg.get("path")
    if path is None and inputs:
        (files_df,) = inputs
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
    )
