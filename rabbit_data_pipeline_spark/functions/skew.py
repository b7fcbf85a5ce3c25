"""Skew-mitigation idioms for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge join
skew at runtime; these helpers cover the cases AQE does not:

- `salted_agg` — a single hot group key funnels its entire group into
  one reducer during aggregation. Two-phase salted aggregation spreads
  phase 1 over `salt` reducers; works for any algebraic aggregate
  (sum/count/min/max — things with a merge step).
- `salted_join` — broadcast is the first choice for small sides; when
  the small side is too big to broadcast AND the large side has hot
  keys, replicate the small side `salt`x and scatter the large side,
  so a hot key's rows land on `salt` reducers instead of one.

Salt assignment uses a deterministic per-row hash, not rand(): results
must not depend on partition layout or retries (a recomputed task with
different rand() draws would break exactly-once semantics of shuffle
files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int) -> Column:
    # hash every column -> effectively uniform, deterministic per row
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) partial, then
    groupBy(key) merge. `aggs` maps output name -> (function, column)
    with function in {sum, count, min, max}.

    Phase-1 output is one row per (key, salt-bucket), so the phase-2
    shuffle carries at most `salt` rows per key no matter how hot the
    key is."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{name}: '{fn}' is not algebraic (sum/count/min/max)")

    salted = df.withColumn("__salt", _salt_col(df, salt))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[part_fn[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merge_fn[fn](name).alias(name) for name, (fn, _c) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the small side replicated `salt`x: large rows scatter
    across salt buckets per key, small rows exist in every bucket.
    Row-multiplicity-preserving for inner/left joins on unique small
    keys — same contract as a plain join."""
    large_s = large.withColumn("__salt", _salt_col(large, salt))
    small_s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return large_s.join(small_s, on=[*on, "__salt"], how=how).drop("__salt")
