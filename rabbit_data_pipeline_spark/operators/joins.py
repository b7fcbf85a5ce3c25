"""Temporal joins: as-of (point-in-time) and interval (range) joins.

The reference correlates streams by foreign key only (its plugins pass
whole messages; time correlation is left to the consumer SQL).
Time-series pipelines need two stronger primitives:

- ``asof_join``: for each right row, the single most recent left row
  at-or-before it per key (market-data "last quote before trade",
  feature lookup at label time).
- ``interval_join``: all (left, right) pairs whose timestamps fall
  within a bound — the batch twin of a stream-stream join with a
  time-range condition (streaming path: ``streaming.ops
  .stream_interval_join``).

Scale design — the naive as-of formulation (range join + argmax, or a
theta-join) explodes quadratically per key. This one is the
union-window plan: tag sides, union (cheap, no shuffle), ONE shuffle
on the key, one in-partition sort, then ``last(ignorenulls)`` carries
the latest left payload forward onto each right row. Linear in rows,
no pair blowup, skew bounded by the busiest key's row count (salt
upstream if one key dominates; see operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Attach to each `right` row the latest `left` row with
    ``left_ts <= right_ts`` for the same key (backward as-of).

    `tolerance` (an INTERVAL literal body, e.g. ``"12 hours"``) drops
    matches older than ``right_ts - tolerance``. ``how="left"`` keeps
    unmatched right rows with null left payload (DuckDB spelling:
    ``ASOF LEFT JOIN``); ``"inner"`` drops them.

    Ties: several left rows sharing (key, left_ts) are resolved
    arbitrarily — pre-aggregate the left side to unique (key, ts) when
    determinism matters (the oracle query does).

    Output columns: right columns (right_ts name preserved) + left
    payload columns + ``__matched_ts`` (the matched left timestamp).
    """
    payload = [c for c in left.columns if c not in on and c != left_ts]
    r_cols = [c for c in right.columns if c not in on and c != right_ts]
    overlap = set(payload) & set(right.columns)
    if overlap:
        raise ValueError(f"left payload columns collide with right: {sorted(overlap)}")

    # The whole left row travels as ONE struct so `last(ignorenulls)`
    # carries it atomically: a NULL inside the matched row's payload
    # must stay NULL, not get back-filled from an older left row (which
    # is what per-column last() would do).
    l_struct_type = T.StructType(
        [T.StructField("__matched_ts", left.schema[left_ts].dataType)]
        + [T.StructField(c, left.schema[c].dataType) for c in payload]
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(left_ts).alias("__matched_ts"), *[F.col(c) for c in payload]
        ).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_cols],
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(l_struct_type).alias("__l"),
        *[F.col(c) for c in r_cols],
    )
    # __side orders left before right at equal ts, so ts-equal rows match.
    w = Window.partitionBy(*on).orderBy("__ts", "__side").rowsBetween(Window.unboundedPreceding, 0)
    carried = r_side.unionByName(l_side).select(
        *on,
        "__ts",
        "__side",
        *r_cols,
        F.last("__l", ignorenulls=True).over(w).alias("__l"),
    )
    out = (
        carried.filter(F.col("__side") == 1)
        .drop("__side")
        .select(
            *on,
            "__ts",
            *r_cols,
            F.col("__l.__matched_ts").alias("__matched_ts"),
            *[F.col(f"__l.{c}").alias(c) for c in payload],
        )
    )

    matched: Column = F.col("__matched_ts").isNotNull()
    if tolerance is not None:
        matched = matched & (F.col("__ts") <= F.col("__matched_ts") + F.expr(f"INTERVAL {tolerance}"))
    if how == "inner":
        out = out.filter(matched)
    elif how == "left":
        out = out.select(
            *on,
            "__ts",
            *r_cols,
            *[F.when(matched, F.col(c)).otherwise(F.lit(None)).alias(c) for c in ["__matched_ts", *payload]],
        )
    else:
        raise ValueError(f"how must be inner|left, got {how!r}")
    return out.withColumnRenamed("__ts", right_ts).select(
        *right.columns, "__matched_ts", *payload
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
) -> DataFrame:
    """All pairs with ``left_ts + lower <= right_ts < left_ts + upper``
    per key — a range join. Spark plans the equi-key part as a hash
    join and evaluates the range as a residual, so there's one shuffle
    on the key and no cartesian blowup beyond true matches. Column
    sets must be disjoint apart from the keys."""
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, on=on, how="inner").filter(cond)
