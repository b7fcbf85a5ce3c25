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


def sync_chunked(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    updated_at: str,
    rename: dict[str, str] | None = None,
    exclude: list[str] | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Reference SyncOtherMysql parity (src/Common/SyncOtherMysql.php:
    50-90): copy source rows whose `updated_at` exceeds the
    destination's max watermark, apply the `replace` column renames,
    drop `exclude` columns, and upsert into the destination.

    The reference pages `size × parallel` rows through the driver; on
    Spark the paging IS the partitioned read (pass the source through
    a partitioned JDBC / chunked read — sources/sql.py
    column_partition_predicates), so this operator only expresses the
    watermark filter + merge: one broadcast of the 1-row max, one
    key-shuffle (or broadcast) for the upsert, no driver loop.

    The destination watermark column is `rename[updated_at]` when the
    rename map moves it (the reference's from.max/to.max pair)."""
    t_max = (rename or {}).get(updated_at, updated_at)
    max_w = target.agg(F.max(t_max).alias("__max_w"))
    delta = (
        source.crossJoin(F.broadcast(max_w))
        .filter(F.col("__max_w").isNull() | (F.col(updated_at) > F.col("__max_w")))
        .drop("__max_w")
    )
    for old, new in (rename or {}).items():
        delta = delta.withColumnRenamed(old, new)
    for c in exclude or []:
        delta = delta.drop(c)
    return upsert(target, delta.select(*target.columns), keys=keys, broadcast_source=broadcast_source)


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


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 merge: history-preserving upsert.

    The reference's sync family overwrites in place (SynToMysql ON
    DUPLICATE KEY UPDATE, SynToMysql.php:64); warehouses that need the
    previous values keep versioned rows instead. For each update row
    whose `compare_cols` differ (null-safely) from the key's CURRENT
    dim row — or whose key is new — the current row is closed
    (`valid_to` = update's `effective_col`, current flag dropped) and a
    new open version is appended. Updates identical to the current row
    are no-ops, so re-running a delta is idempotent.

    Scale shape: updates are a delta — usually orders of magnitude
    smaller than the dim — so the default broadcasts them into BOTH the
    change-detection join and the close join, leaving the dim scanned
    once with no shuffle at all. For delta ~ dim size flip
    `broadcast_updates=False`: every join keys on `keys`, one shuffle
    each side, and AQE handles skewed keys. This is the MERGE INTO ..
    WHEN MATCHED AND <attrs changed> plan spelled out relationally, so
    it runs on plain parquet (Delta/Iceberg would execute the same
    shape)."""
    cur = dim.filter(F.col(current_col))
    hist = dim.filter(~F.col(current_col))
    upd = updates.select(*keys, *compare_cols, F.col(effective_col).alias("__eff"))
    # A delta with two rows for one key would append two OPEN versions
    # (both is_current) — corrupting the dimension. Collapse to the
    # newest row per key first (compare_cols as tiebreak so equal-
    # effective duplicates pick a DETERMINISTIC winner, not whichever
    # partition ordering produced); callers needing every intermediate
    # version apply deltas per effective-period instead.
    upd = keep_latest_by_flag(upd, keys, "__eff", tiebreak=compare_cols)
    if broadcast_updates:
        upd = F.broadcast(upd)

    cur_attrs = cur.select(
        *keys, F.lit(True).alias("__cur_exists"), *[F.col(a).alias(f"__cur_{a}") for a in compare_cols]
    )
    joined = upd.join(cur_attrs, on=keys, how="left")
    differs = F.col("__cur_exists").isNull()
    for a in compare_cols:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__cur_{a}"))
    changed = joined.filter(differs).select(*keys, *compare_cols, "__eff")
    changed_keys = changed.select(*keys, "__eff")
    if broadcast_updates:
        changed_keys = F.broadcast(changed_keys)

    vt_type = dim.schema[valid_to].dataType.simpleString()
    new_rows = changed.select(
        *keys,
        *compare_cols,
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(vt_type).alias(valid_to),
        F.lit(True).alias(current_col),
    ).select(*dim.columns)
    closed = (
        cur.drop(valid_to)
        .join(changed_keys, on=keys)
        .withColumnRenamed("__eff", valid_to)
        .withColumn(current_col, F.lit(False))
        .select(*dim.columns)
    )
    untouched = cur.join(changed_keys.select(*keys), on=keys, how="left_anti")
    return hist.unionByName(untouched).unionByName(closed).unionByName(new_rows)


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


def deleted_keys(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Delete DETECTION — the reverse of insert_missing: keys present
    in the sync TARGET but gone from the SOURCE (rows deleted upstream
    that a watermark-based incremental sync can never see — the
    classic silent-divergence bug of updatedAt pipelines). Feed the
    result into delete_where / an anti-join rewrite to propagate the
    deletes. One anti-join on the key columns; both sides project to
    keys only before the shuffle."""
    return target.select(*keys).distinct().join(
        source.select(*keys).distinct(), on=keys, how="left_anti"
    )
