"""Approximate aggregates — the documented 100 TB swap-ins for the
exact operators the oracles gate.

Several registered queries note their scale path in passing
(q_heavy_hitters: "swap the exact groupBy for approx"); this module
makes those swaps concrete, tested code instead of a docstring
promise. Everything here is a thin, typed veneer over Spark's built-in
sketches (JVM-side, mergeable, one pass), so the exact→approx swap is
a one-line change at the call site:

- ``approx_distinct``: HyperLogLog++ `approx_count_distinct` — fixed
  ~KB state per group vs a shuffle of every distinct value.
- ``approx_quantiles``: t-digest-backed `percentile_approx` with an
  accuracy knob instead of a full sort.
- ``approx_heavy_hitters``: the two-level guard for top-k over a
  possibly-skewed key: a map-side partial count bounds the shuffled
  rows at (#partitions × key cardinality) like the exact form, but
  the final TakeOrdered keeps only k — callers that can tolerate
  under-counting cap the partial with ``per_partition_cap`` so a
  degenerate keyspace (every key unique) cannot OOM a reducer.

None of these can be value-hash-gated against DuckDB (sketch
implementations differ across engines by design), so they are NOT
registry keys; tests/test_approx.py gates them by error bound against
the exact answers instead — the same contract a production swap needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, group_cols: list[str], target: str, rsd: float = 0.05) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++, relative
    standard deviation `rsd`). State is O(1/rsd^2) bytes per group
    regardless of cardinality — the 100 TB form of COUNT(DISTINCT x)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(target, rsd).alias(f"approx_distinct_{target}")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    target: str,
    probabilities: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (`percentile_approx`): error is
    bounded by 1/accuracy of the rank, state is O(accuracy) per group
    — vs the exact percentile's per-group sort."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(target, list(probabilities), accuracy).alias(f"approx_q_{target}")
    )


def approx_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    k: int = 20,
    weight: Column | None = None,
    per_partition_cap: int | None = None,
) -> DataFrame:
    """Top-k keys by (weighted) frequency with bounded shuffle.

    Two-level: per-partition partial counts (map-side combine — the
    shuffle carries at most #partitions × #distinct-keys rows, same as
    exact groupBy) then a global merge where TakeOrderedAndProject
    keeps only k rows off the final sort. With `per_partition_cap`,
    each partition forwards only its own top-`cap` keys: the result
    can under-count a key that is globally heavy but locally light
    (the classic SpaceSaving trade), in exchange for a shuffle bounded
    at #partitions × cap rows even when every key is unique."""
    w = weight if weight is not None else F.lit(1)
    partial = df.select(*key_cols, w.alias("__w"))
    if per_partition_cap is None:
        counts = partial.groupBy(*key_cols).agg(F.sum("__w").alias("freq"))
    else:
        part = partial.withColumn("__pid", F.spark_partition_id())
        local = part.groupBy("__pid", *key_cols).agg(F.sum("__w").alias("__lw"))
        from pyspark.sql.window import Window

        rk = F.row_number().over(
            Window.partitionBy("__pid").orderBy(F.col("__lw").desc(), *key_cols)
        )
        survivors = local.withColumn("__rk", rk).filter(F.col("__rk") <= per_partition_cap)
        counts = survivors.groupBy(*key_cols).agg(F.sum("__lw").alias("freq"))
    return counts.orderBy(F.col("freq").desc(), *key_cols).limit(k)
