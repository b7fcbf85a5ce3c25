"""Generic transform plugins: SQL-over-inputs, projection/filter/rename,
join/union — the declarative glue between sources and sinks.

The reference has no relational transforms (each plugin mutates
Message.data imperatively); this is where the Spark-first design pays:
any SQL is a node, and Catalyst fuses it with its neighbors.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


@plugin("transform.sql")
def _sql(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Run SQL over this node's inputs. The first input is registered
    as view `input` (and `input0..N` for multi-input nodes)."""
    for i, df in enumerate(inputs):
        df.createOrReplaceTempView(f"input{i}")
    if inputs:
        inputs[0].createOrReplaceTempView("input")
    return sch.spark.sql(cfg["sql"])


@plugin("transform.select")
def _select(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    return df.selectExpr(*cfg["columns"])


@plugin("transform.filter")
def _filter(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    return df.filter(cfg["condition"])


@plugin("transform.rename")
def _rename(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    return df.withColumnsRenamed(dict(cfg["map"]))


@plugin("transform.with_columns")
def _with_columns(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """addField parity (LineParser.php addField): add literal or SQL-expr
    columns."""
    (df,) = inputs
    return df.withColumns({name: F.expr(expr) for name, expr in cfg["columns"].items()})


@plugin("transform.id_key")
def _id_key(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """idKey parity (reference service('idGen')->nextId() snowflake ids):
    uuid() for global uniqueness, or monotonically_increasing_id for
    compact per-partition ids — both executor-side, no id service."""
    (df,) = inputs
    col = cfg.get("column", "id")
    kind = cfg.get("kind", "uuid")
    return df.withColumn(col, F.expr("uuid()") if kind == "uuid" else F.monotonically_increasing_id())


@plugin("transform.join")
def _join(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    left, right = inputs[0], inputs[1]
    if cfg.get("broadcast_right"):
        right = F.broadcast(right)
    # accept `keys:` as well as `on:` — YAML 1.1 parses a bare `on`
    # key as boolean True, which silently loses the join columns
    on = cfg.get("keys") or cfg.get("on") or cfg.get(True)
    if not on:
        raise ValueError("transform.join needs `keys:` (or quoted 'on':) with the join columns")
    return left.join(right, on=on, how=cfg.get("how", "inner"))


@plugin("transform.union")
def _union(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    out = inputs[0]
    for df in inputs[1:]:
        out = out.unionByName(df, allowMissingColumns=bool(cfg.get("allow_missing", False)))
    return out


@plugin("transform.repartition")
def _repartition(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Explicit partitioning control (salting/skew/bucketed-write prep)."""
    (df,) = inputs
    cols = [F.col(c) for c in cfg.get("by", [])]
    n = cfg.get("num")
    if cols and n:
        return df.repartition(int(n), *cols)
    if cols:
        return df.repartition(*cols)
    return df.repartition(int(n))


@plugin("transform.asof_join")
def _asof_join(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Point-in-time enrichment: first input is the left (state)
    stream, second the right (probe) rows; each right row gets the
    latest left row at-or-before its timestamp. See
    operators/joins.asof_join for the union-window scale design."""
    from rabbit_data_pipeline_spark.operators.joins import asof_join

    left, right = inputs[0], inputs[1]
    on = cfg.get("keys") or cfg.get(True)
    if not on:
        raise ValueError("transform.asof_join needs `keys:` with the match columns")
    return asof_join(
        left, right, on=list(on),
        left_ts=cfg.get("left_ts", "ts"), right_ts=cfg.get("right_ts", "ts"),
        tolerance=cfg.get("tolerance"), how=cfg.get("how", "inner"),
    )


@plugin("transform.interval_join")
def _interval_join(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.joins import interval_join

    left, right = inputs[0], inputs[1]
    on = cfg.get("keys") or cfg.get(True)
    if not on:
        raise ValueError("transform.interval_join needs `keys:` with the join columns")
    return interval_join(
        left, right, on=list(on),
        left_ts=cfg.get("left_ts", "ts"), right_ts=cfg.get("right_ts", "ts"),
        upper=cfg.get("upper", "1 hour"), lower=cfg.get("lower", "0 seconds"),
    )


@plugin("transform.scd2")
def _scd2(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """SCD Type-2 merge: first input is the versioned dimension, second
    the update delta. See operators/sync.scd2_merge."""
    from rabbit_data_pipeline_spark.operators.sync import scd2_merge

    dim, updates = inputs[0], inputs[1]
    return scd2_merge(
        dim, updates,
        keys=list(cfg["keys"]), compare_cols=list(cfg["compare"]),
        effective_col=cfg.get("effective_col", "updated_at"),
        valid_from=cfg.get("valid_from", "valid_from"),
        valid_to=cfg.get("valid_to", "valid_to"),
        current_col=cfg.get("current_col", "is_current"),
        broadcast_updates=bool(cfg.get("broadcast_updates", True)),
    )
