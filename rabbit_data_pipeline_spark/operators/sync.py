"""Table-sync operators — the reference's Common/ suite re-expressed
relationally.

Reference semantics being matched:
- SynToMysql (src/Common/SynToMysql.php:31-66): `INSERT INTO to
  SELECT .. FROM from [WHERE NOT EXISTS(keys match)]` and `ON
  DUPLICATE KEY UPDATE` — i.e. insert-missing and upsert.
- SynToClickhouse (src/Common/SynToClickhouse.php): incremental copy
  `WHERE f.updatedAt > (SELECT max(updatedAt) FROM to)`, plus a flag
  column bumped after sync so re-syncs dedup to the latest row.
- DelMysql (src/Common/DelMysql.php): DELETE by condition.

The reference executes these as SQL against a mutable DB. On Spark
storage is immutable, so each is a *transformation* producing the new
table state — exactly what a MERGE INTO does under Delta/Iceberg; the
shapes below are those MERGE plans spelled out, so they run on plain
parquet too.

Scale notes: upsert/insert_missing shuffle both sides on the key
(or broadcast the source if it's a small delta — the common case in
incremental sync, so `broadcast_source=True` is the default knob to
flip). sync_incremental's max() is a 1-row scalar — computed as an
aggregate and crossed in, which Spark broadcasts automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def insert_missing(target: DataFrame, source: DataFrame, keys: list[str], broadcast_source: bool = False) -> DataFrame:
    """Rows of `source` whose key is absent from `target`, appended.
    = reference SynToMysql NOT EXISTS mode (SynToMysql.php:52-55)."""
    src = F.broadcast(source) if broadcast_source else source
    new_rows = src.join(target.select(*keys), on=keys, how="left_anti")
    return target.unionByName(new_rows)


def upsert(target: DataFrame, source: DataFrame, keys: list[str], broadcast_source: bool = False) -> DataFrame:
    """Source wins on key collision; everything else kept.
    = reference SynToMysql INSERT .. ON DUPLICATE KEY UPDATE (:64)."""
    src = F.broadcast(source) if broadcast_source else source
    kept = target.join(src.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(source)


def sync_incremental(source: DataFrame, target: DataFrame, updated_at: str) -> DataFrame:
    """New-rows-only increment: source rows newer than target's max
    watermark (SynToClickhouse.php updatedAt mode). Returns the rows to
    append. The max() aggregate is one number — cross-joined (Spark
    broadcasts single-row relations), so the source scan stays one pass
    with the comparison pushed into it."""
    max_w = target.agg(F.max(updated_at).alias("__max_w"))
    return (
        source.crossJoin(F.broadcast(max_w))
        .filter(F.col("__max_w").isNull() | (F.col(updated_at) > F.col("__max_w")))
        .drop("__max_w")
    )


def keep_latest_by_flag(df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None) -> DataFrame:
    """Collapse to the highest-`order_col` row per key — the read-side
    dedup the reference's CH flag column exists for (flag bumped on
    each sync, consumers pick max-flag). One shuffle on the keys."""
    order = [F.col(order_col).desc()] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def delete_where(df: DataFrame, condition: str) -> DataFrame:
    """DELETE FROM .. WHERE cond → the surviving table (DelMysql
    parity). The predicate pushes to the scan: deleting is a filter."""
    return df.filter(f"NOT ({condition})")


def bump_flag(df: DataFrame, keys_values: DataFrame, keys: list[str], flag_col: str = "flag") -> DataFrame:
    """Reference Clickhouse sink updateFlag (src/Sinks/Clickhouse.php:
    165-196): rows matching the just-inserted keys with flag in (0,1)
    get flag+1. keys_values is small (the batch's keys) → broadcast."""
    marked = df.join(F.broadcast(keys_values.select(*keys).distinct()), on=keys, how="left_semi")
    untouched = df.join(F.broadcast(keys_values.select(*keys).distinct()), on=keys, how="left_anti")
    bumped = marked.withColumn(
        flag_col,
        F.when(F.col(flag_col).isin(0, 1), F.col(flag_col) + 1).otherwise(F.col(flag_col)),
    )
    return untouched.unionByName(bumped)
