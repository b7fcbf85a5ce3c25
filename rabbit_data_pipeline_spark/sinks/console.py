"""Console sink (reference src/Sinks/Console.php: VarDumper to stdout)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


@plugin("sink.console")
def _console(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    df.show(n=int(cfg.get("rows", 20)), truncate=bool(cfg.get("truncate", True)))
    return df


@plugin("sink.memory")
def _memory(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Expose the result as a temp view + task result (test/inspection
    sink; also how one pipeline hands a table to another)."""
    (df,) = inputs
    view = cfg.get("view", cfg["_node"])
    df.createOrReplaceTempView(view)
    return df
