"""XML parse/format (reference src/Transforms/{XmlParser,XmlFormat}.php).

XmlParser: xml string → named fields. Spark-first: the built-in
``xpath_string``/``xpath`` SQL functions evaluate JVM-side per row —
no Python UDF. A field spec maps output name → xpath expression.

XmlFormat: rows → one xml document string per row (itemTag), or the
whole DataFrame aggregated under rootTag. Pure string built-ins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def xml_parse(df: DataFrame, fields: dict[str, str], xml_col: str = "value", keep: list[str] | None = None) -> DataFrame:
    """fields: output column → xpath (e.g. {'name': '/item/name/text()'})."""
    cols: list[Column] = [F.col(c) for c in (keep or [])]
    for out, path in fields.items():
        cols.append(F.xpath_string(F.col(xml_col), F.lit(path)).alias(out))
    return df.select(*cols)


def _esc(col: Column) -> Column:
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        col = F.replace(col, F.lit(raw), F.lit(ent))
    return col


def xml_format(
    df: DataFrame,
    item_tag: str = "item",
    out_col: str = "xml",
    columns: list[str] | None = None,
) -> DataFrame:
    """Each row → `<item><col>val</col>…</item>` (XmlFormat parity;
    rootTag/version belong to the final document writer)."""
    cols = columns or df.columns
    parts = [F.lit(f"<{item_tag}>")]
    for c in cols:
        parts.append(F.lit(f"<{c}>"))
        parts.append(_esc(F.col(c).cast("string")))
        parts.append(F.lit(f"</{c}>"))
    parts.append(F.lit(f"</{item_tag}>"))
    return df.withColumn(out_col, F.concat(*parts))


def xml_document(df: DataFrame, xml_col: str = "xml", root_tag: str = "root", version: str = "1.0", charset: str = "utf-8") -> str:
    """Aggregate item strings into one document (driver-side; only for
    export of small results — a 100 TB dataset writes per-row xml)."""
    body = df.agg(F.concat_ws("", F.collect_list(xml_col)).alias("b")).first()["b"]
    return f'<?xml version="{version}" encoding="{charset}"?><{root_tag}>{body}</{root_tag}>'


@plugin("transform.xml_parse")
def _xml_parse(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    return xml_parse(df, cfg["fields"], cfg.get("xml_col", "value"), cfg.get("keep"))


@plugin("transform.xml_format")
def _xml_format(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    return xml_format(df, cfg.get("itemTag", "item"), cfg.get("out_col", "xml"), cfg.get("columns"))
