"""Row-level error routing — the reference's per-plugin errHandler
(AbstractPlugin.php:94-132) catches a failing Message and logs/drops
it; node-level on_error=fail|skip covers the plan-level analogue
(pipeline/scheduler.py). This module covers the per-ROW analogue for
parse steps: malformed records must not kill a 100 TB job, and must
not silently vanish either — they route to a dead-letter DataFrame.

Works on batch and streaming inputs alike (pure column expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_json_with_dlq(
    df: DataFrame,
    value_col: str,
    schema: str,
    keep_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse `value_col` as JSON against `schema` (a DDL string); rows
    that fail to parse or arrive NULL route to the returned
    dead-letter DataFrame with the raw payload preserved.

    from_json's PERMISSIVE mode yields an all-NULL struct (not a NULL)
    for malformed input, so detection goes through the engine's
    columnNameOfCorruptRecord channel — the corrupt column is non-NULL
    exactly for unparseable rows.

    Returns (good, dlq). Both are lazy projections of ONE pass over
    the input — no shuffle. `keep_cols` are passthrough columns (keys,
    timestamps) carried into both outputs."""
    keep = keep_cols or []
    parsed = df.select(
        *keep,
        F.col(value_col).alias("__raw"),
        F.from_json(
            value_col, f"{schema}, __corrupt string", {"columnNameOfCorruptRecord": "__corrupt"}
        ).alias("__v"),
    )
    bad = F.col("__raw").isNull() | F.col("__v.__corrupt").isNotNull()
    good = parsed.filter(~bad).select(*keep, "__v.*").drop("__corrupt")
    dlq = (
        parsed.filter(bad)
        .select(*keep, F.col("__raw").alias("raw_value"))
        .withColumn("error", F.lit("malformed json"))
    )
    return good, dlq


def with_error_column(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Annotate rows with the first failed validation (NULL = clean).
    `checks` maps error label -> boolean Column that is True when the
    row is VALID. Split downstream with .filter("__error IS NULL")."""
    err = F.lit(None).cast("string")
    for label, ok in reversed(list(checks.items())):
        err = F.when(~ok, F.lit(label)).otherwise(err)
    return df.withColumn("__error", err)


def split_on_error(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partner of with_error_column: (clean rows sans marker, dlq)."""
    return (
        df.filter(F.col("__error").isNull()).drop("__error"),
        df.filter(F.col("__error").isNotNull()),
    )
