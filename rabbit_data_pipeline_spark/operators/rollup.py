"""Incremental materialized-rollup maintenance.

The reference keeps operational aggregates fresh by re-running SQL
syncs on a schedule (reference src/Sources/Pdo.php:70-101 +
Scheduler cron triggers); at 100 TB a nightly full recompute of a
corpus-wide rollup is the single most expensive recurring job a
pipeline runs. This operator maintains the rollup *incrementally*:
aggregate only the new batch (small), then merge it into the stored
aggregate by key — work proportional to the DELTA, not the corpus.

Exactness contract: measures are carried as (count, integer-micro-unit
sum) partials — merging is pure 64-bit integer addition, so
``merge(rollup(base), agg(batch)) == rollup(base ∪ batch)`` holds
bit-for-bit, in any merge order, across any number of batches. That
equivalence IS the registered oracle gate (queries/pipelines.py
rollup_incremental): the Spark side runs base-then-merge, the DuckDB
twin recomputes from scratch, and the value hash must agree.

Scale shape: the batch aggregation is a keyed shuffle of batch rows
only; the merge is a full-outer join on the rollup key. When the
stored rollup is written with sinks/layout.py write_bucketed on the
same key, the merge join needs NO stored-side exchange — the nightly
cost becomes O(batch + touched buckets). The finalize step is a
map-only projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def rollup_partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate to exact mergeable partials: (keys, n, sum_micro)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(F.floor(F.col(value_col) * _SCALE + F.lit(0.5)).cast("long")).alias("sum_micro"),
    )


def merge_rollups(stored: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial rollups by key — integer addition, exact in
    any order. Full-outer so brand-new keys and untouched keys both
    survive."""
    s = stored.select(*keys, F.col("n").alias("n_a"), F.col("sum_micro").alias("s_a"))
    d = delta.select(*keys, F.col("n").alias("n_b"), F.col("sum_micro").alias("s_b"))
    return s.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias("n"),
        (F.coalesce("s_a", F.lit(0)) + F.coalesce("s_b", F.lit(0))).alias("sum_micro"),
    )


def finalize_rollup(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Project partials to the user-facing rollup (count, sum, avg)."""
    return partials.select(
        *keys,
        F.col("n").alias("n_rows"),
        (F.col("sum_micro") / F.lit(float(_SCALE))).alias("total"),
        (F.col("sum_micro") / F.lit(float(_SCALE)) / F.col("n")).alias("mean"),
    )
