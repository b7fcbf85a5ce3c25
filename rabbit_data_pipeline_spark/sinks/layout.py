"""Storage-layout operators: bucketed tables, compaction, partitioned
layouts.

At 100 TB the dominant costs are shuffles and file listings, and both
are layout problems:

- ``write_bucketed`` persists a table hash-bucketed on its join key.
  Two tables bucketed the same way join with ZERO exchange — the
  shuffle is paid once at write time and amortized over every
  subsequent join/aggregate on that key (classic fact-fact co-location:
  lineitem ⋈ orders on orderkey).
- ``compact`` rewrites a directory of too-many-small-files into
  size-targeted files. Streaming sinks and over-parallel writers
  produce kilobyte part files; at scale the NameNode/object-store
  listing and per-file open dominate read time.
- ``write_files(partition_by=...)`` (sinks/files.py) plus Spark's
  dynamic partition pruning covers the partition-layout axis; the
  plan contract is tested in tests/test_layout.py.

The reference has no notion of storage layout (its sinks append rows
to whatever the DB does); this module is where a Spark engine earns
its scale.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed (and optionally sorted) on
    `bucket_cols` as a catalog table. Readers joining or aggregating on
    the bucket key skip the exchange entirely; with sort_cols the
    sort-merge join also skips its sort. Pick num_buckets so one bucket
    ≈ 100-200 MB at the target scale (e.g. 100 TB / 2000 buckets / …);
    both join sides must use the SAME bucket count to co-locate."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite `path` into ceil(bytes / target) equally-sized files;
    returns the new file count. Reads the directory's current byte size
    from the filesystem (no data pass), rewrites in one job to a temp
    dir, then atomically swaps. The repartition is a round-robin
    exchange — one pass over the data, no key skew."""
    size = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                size += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n).write.format(fmt).mode("overwrite").save(tmp)
    bak = path.rstrip("/") + "__old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak)
    return n


# ------------------------------------------------------ Z-order clustering


def zorder_key(cols: list[str], mins: dict[str, float], maxs: dict[str, float], bits: int = 16):
    """Column expr: Morton (Z-order) key interleaving `bits` bits of
    each column, min-max normalized to [0, 2^bits). Rows close in the
    key are close in EVERY listed dimension, so after a range-
    repartition + sort on this key each output file's min/max span is
    narrow on ALL dimensions at once — multi-dimensional data skipping,
    where a plain sort only skips on its leading column.

    min/max ship as plan literals (they come from one tiny agg pass);
    the interleave is pure integer arithmetic — codegen'd, no Python,
    no shuffle beyond the final range exchange the caller asks for."""
    from pyspark.sql import functions as F

    m = len(cols)
    if bits * m > 63:
        raise ValueError(f"bits*len(cols) must fit a signed long, got {bits * m}")
    scaled = []
    for c in cols:
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        s = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(1 << bits))).cast("long"),
            ),
        )
        scaled.append(s)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * m + j)
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Range-repartition + sort by the Morton key of `cols` — the
    write-side clustering pass (Delta OPTIMIZE ZORDER BY shape) that
    makes parquet min/max stats selective on every listed column.
    Cost: one tiny min/max agg (2m values to the driver), one range
    exchange + local sort — paid once at write, amortized over every
    later selective read. At 100 TB run it per ingest partition, not
    globally: clustering within a day/hour partition is what keeps the
    sort bounded."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).first()
    mins = {c: stats[f"min_{c}"] for c in cols}
    maxs = {c: stats[f"max_{c}"] for c in cols}
    key = zorder_key(cols, mins, maxs, bits)
    return (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
