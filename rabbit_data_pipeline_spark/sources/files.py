"""File sources.

Reference parity:
- FindFiles (src/Sources/FindFiles.php): scan a dir for files with
  given extensions, emit one Message per path. Here: a DataFrame of
  file metadata (path, size, mtime) — distributed listing via Spark's
  binaryFile source so a 10M-file bucket lists in parallel, not on the
  driver.
- The file formats LineParser consumes (csv/tsv/txt; xlsx gated) plus
  the columnar formats any Spark pipeline should prefer at scale
  (parquet — pushdown + pruning; json).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def find_files(
    spark: SparkSession,
    scan_dir: str | None = None,
    file_name: str | None = None,
    extensions: list[str] | None = None,
) -> DataFrame:
    """FindFiles parity: fileName XOR scanDir(+extensions).

    Returns DataFrame(path, length, modificationTime). Listing happens
    on executors (binaryFile's discovery path), so huge directories
    don't serialize through the driver.
    """
    if bool(scan_dir) == bool(file_name):
        raise ValueError("fileName or scanDir has one and only one")  # reference FindFiles.php:36
    if file_name:
        if not os.path.isfile(file_name):
            raise ValueError("fileName must be a file")
        return spark.createDataFrame([(file_name,)], "path string")
    if not extensions:
        raise ValueError("if set scanDir you must set extends too")  # FindFiles.php:44
    pattern = os.path.join(scan_dir, "**")
    load_path = pattern if "*" in scan_dir else scan_dir
    glob_filter = "*.{" + ",".join(extensions) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .load(load_path)
        .select("path", "length", "modificationTime")
    )
    # Listing provenance for downstream consumers (FindFiles →
    # LineParser chain): the EXACT load spec used above (same path
    # expression — recording scan_dir when the listing actually loaded
    # scan_dir/** would make the parser read a different file set than
    # the one listed), so the parser can read by glob instead of
    # collecting N paths through the driver — at millions of files the
    # path list itself is the bottleneck.
    df.__rdps_listing__ = {
        "path": load_path,
        "pathGlobFilter": glob_filter,
        "recursiveFileLookup": "true",
    }
    return df


def read_table(spark: SparkSession, fmt: str, path: str, options: dict[str, Any] | None = None, schema=None) -> DataFrame:
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


@plugin("source.find_files")
def _find_files_plugin(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    return find_files(
        sch.spark,
        scan_dir=cfg.get("scanDir") or cfg.get("scan_dir"),
        file_name=cfg.get("fileName") or cfg.get("file_name"),
        extensions=cfg.get("extends") or cfg.get("extensions"),
    )


@plugin("source.parquet")
def _parquet(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    return read_table(sch.spark, "parquet", cfg["path"], cfg.get("options"))


@plugin("source.csv")
def _csv(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    opts = {"header": "true", "inferSchema": "false", **cfg.get("options", {})}
    return read_table(sch.spark, "csv", cfg["path"], opts)


@plugin("source.json")
def _json(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    # `schema` (DDL string) is a reader contract, not an option:
    # explicit schemas skip the inference pre-scan — at scale JSON
    # inference reads the whole dataset once BEFORE the real read.
    opts = dict(cfg.get("options", {}))
    schema = cfg.get("schema") or opts.pop("schema", None)
    return read_table(sch.spark, "json", cfg["path"], opts, schema=schema)


@plugin("source.text")
def _text(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    return read_table(sch.spark, "text", cfg["path"], cfg.get("options"))


@plugin("source.table")
def _table(sch: Scheduler, cfg: dict, inputs: list[DataFrame]) -> DataFrame:
    """Read one of the testdata tables: {name, sf_dir}."""
    from rabbit_data_pipeline_spark.session import load_tables

    return load_tables(sch.spark, cfg["sf_dir"], (cfg["name"],))[cfg["name"]]
