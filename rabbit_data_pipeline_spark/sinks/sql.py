"""SQL sinks — reference src/Sinks/Pdo.php (insert/upsert with retry)
and src/Sinks/Clickhouse.php (columnar batch insert + flag update).

Production path: `df.write.jdbc` (append) — gated, no JDBC jars in
this container. Upsert on plain JDBC has no portable spelling, so the
engine computes the post-upsert state relationally (operators/sync.py)
and writes that; on Delta/Iceberg targets the same keys feed MERGE
INTO directly.

Clickhouse's BatchInsertCsv (reference saveWithLine) is Spark's native
mode of operation — columnar part-files written in parallel — so the
"batch insert" plugin is simply a file/JDBC write; the flag-update
step is operators.sync.bump_flag.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from rabbit_data_pipeline_spark.operators.sync import upsert
from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", properties: dict | None = None, retries: int = 1) -> None:
    """Pdo-sink parity incl. its retry loop (Sinks/Pdo.php retry/sleep)."""
    last: Exception | None = None
    for _ in range(max(1, retries)):
        try:
            df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})
            return
        except Exception as e:  # retryCode semantics: retry any transient failure
            last = e
    raise last  # type: ignore[misc]


@plugin("sink.jdbc")
def _jdbc_sink(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    write_jdbc(
        df,
        url=cfg["url"],
        table=cfg["table"],
        mode=cfg.get("mode", "append"),
        properties=cfg.get("properties"),
        retries=int(cfg.get("retry", 1)),
    )
    return df


@plugin("sink.upsert")
def _upsert_sink(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Upsert into a parquet-backed table dir: read current state,
    merge, write back. inputs[0] is the source batch."""
    (src,) = inputs
    path, keys = cfg["path"], list(cfg["keys"])
    try:
        current = sch.spark.read.parquet(path)
        merged = upsert(current, src, keys, broadcast_source=bool(cfg.get("broadcast_source", True)))
    except Exception:  # first write — no current state
        merged = src
    merged.write.mode("overwrite").parquet(cfg.get("staging", path + "__new"))
    out = sch.spark.read.parquet(cfg.get("staging", path + "__new"))
    return out
