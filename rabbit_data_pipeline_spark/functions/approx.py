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

    Uncapped: per-key partial counts (map-side combine) then a global
    merge where TakeOrderedAndProject keeps only k rows off the final
    sort — exact, shuffle carries ≤ #partitions × #distinct-keys rows.

    With `per_partition_cap`, each partition counts its OWN rows in a
    lossy in-memory counter (mapInPandas; pruned to 8×cap whenever it
    grows past that, keeping the current top keys — lossy-counting /
    SpaceSaving style) and forwards only its local top-`cap`: both the
    per-task memory AND the shuffle are bounded by a multiple of
    `cap`, even when every key is unique. The trade: a key that is
    globally heavy but below the local top-`cap` everywhere can be
    under-counted or missed. (A groupBy+window spelling would NOT
    deliver this bound — the groupBy exchange already ships every
    distinct (partition, key) row; the cap must act before any
    shuffle.)"""
    if any(c == "freq" or c.startswith("__") for c in key_cols):
        raise ValueError("key_cols may not be named 'freq' or start with '__' (reserved)")
    w = weight if weight is not None else F.lit(1)
    partial = df.select(*key_cols, w.cast("double").alias("__w"))
    if per_partition_cap is None:
        counts = partial.groupBy(*key_cols).agg(F.sum("__w").alias("freq"))
    else:
        import pandas as pd
        from pyspark.sql.types import StructType

        cap = int(per_partition_cap)
        out_schema = StructType(
            [partial.schema[c] for c in key_cols] + [partial.schema["__w"]]
        )

        def local_top(batches):
            from collections import Counter

            counts_local: Counter = Counter()
            for pdf in batches:
                grouped = pdf.groupby(key_cols, sort=False)["__w"].sum()
                counts_local.update(grouped.to_dict())
                if len(counts_local) > 8 * cap:
                    counts_local = Counter(dict(counts_local.most_common(4 * cap)))
            top = counts_local.most_common(cap)
            if not top:
                return
            keys = [t[0] if len(key_cols) > 1 else (t[0],) for t in top]
            data = {c: [kt[i] for kt in keys] for i, c in enumerate(key_cols)}
            data["__w"] = [t[1] for t in top]
            yield pd.DataFrame(data)

        survivors = partial.mapInPandas(local_top, out_schema)
        counts = survivors.groupBy(*key_cols).agg(F.sum("__w").alias("freq"))
    return counts.orderBy(F.col("freq").desc(), *key_cols).limit(k)
