"""File sink (reference src/Sinks/File.php writes one file per
Message; here `df.write` emits a directory of part files — atomic via
the Hadoop output committer, partitionable, and parallel)."""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, Any] | None = None,
) -> None:
    """At scale: partition_by on low-cardinality query keys (partition
    pruning on read); never partition_by high-cardinality columns
    (file explosion)."""
    writer = df.write.format(fmt).mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def _resolve_file_name(file_name: str | None) -> str | None:
    """Reference Sinks/File.php `fileName` templating: the literal
    values `DateTime` / `Timestamp` (doc/File.md) produce a
    run-timestamped name; anything else is taken verbatim. (The
    reference also accepts a PHP callable — a config-embedded code
    value; the Spark-side analog is `fileNameExpr`, below.)"""
    import time

    if file_name == "DateTime":
        return time.strftime("%Y%m%d%H%M%S")
    if file_name == "Timestamp":
        return str(int(time.time()))
    return file_name


def _eval_file_name_expr(spark, expr: str) -> str:
    """The declarative replacement for Sinks/File.php's CALLABLE
    `fileName` form (doc/File.md): a Spark SQL scalar expression
    evaluated once, driver-side, against a single empty row — e.g.
    `date_format(current_timestamp(), 'yyyyMMdd')` or
    `concat('run_', uuid())`. Same expressive role as the reference's
    closure with the same trust surface the pipeline spec ALREADY
    grants (T6 `sql:` transform nodes run arbitrary SQL), and none of
    the host-code execution a config-embedded PHP/Python callable
    would add — which is why the callable form itself stays
    deliberately unreproduced. Raises ValueError on an expression
    that doesn't evaluate to a usable file-name string."""
    from pyspark.sql import functions as F

    try:
        v = spark.range(1).select(F.expr(expr).cast("string").alias("v")).first()["v"]
    except Exception as e:
        raise ValueError(f"fileNameExpr {expr!r} failed to evaluate: {e}") from e
    # ADVICE r10 #3: '/' and NUL alone let backslashes, newlines and
    # other control characters through — names that break Windows-style
    # paths and garble logs/manifests. Reject every separator either
    # platform uses plus the whole control range. ADVICE r11 #2: the
    # ASCII range (0x00-0x1f, 0x7f) alone still admitted C1 controls
    # (U+0080-U+009F, incl. NEL U+0085) and the Unicode line/paragraph
    # separators U+2028/U+2029 — characters that garble exactly the
    # logs/manifests this check protects. Anything else (unicode,
    # spaces, dots) stays legal, matching the reference's
    # verbatim-fileName permissiveness (Sinks/File.php:51, doc/File.md).
    bad = {"/", "\\", "\u2028", "\u2029", os.sep, os.altsep or "/"}
    if not v or any(c in bad or ord(c) < 0x20 or 0x7F <= ord(c) <= 0x9F for c in v):
        raise ValueError(
            f"fileNameExpr {expr!r} produced {v!r} — need a non-empty name "
            "without path separators or control characters (use `path` "
            "for directories)"
        )
    return v


@plugin("sink.file")
def _file_sink(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    opts = dict(cfg.get("options", {}))
    fmt = cfg.get("format", cfg.get("ext", "parquet"))
    if fmt == "csv" and "header" not in opts:
        opts["header"] = "true"
    path = cfg["path"]
    if cfg.get("fileNameExpr"):
        fname = _eval_file_name_expr(df.sparkSession, cfg["fileNameExpr"])
    else:
        fname = _resolve_file_name(cfg.get("fileName", cfg.get("file_name")))
    if fname:
        path = os.path.join(path, f"{fname}.{fmt}")
    write_files(
        df,
        path=path,
        fmt=fmt,
        mode=cfg.get("mode", "overwrite"),
        partition_by=cfg.get("partition_by"),
        options=opts,
    )
    return df  # pass-through so a sink can still feed a downstream node (reference fan-out)
