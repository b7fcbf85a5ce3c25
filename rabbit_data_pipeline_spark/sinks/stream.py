"""Streaming sinks — producer side of the reference's broker sinks
(src/Sinks/{RdKafka,Amqp,Nsq}.php).

`kafka_write_stream` is the production path (gated: needs the Kafka
package). `queue_dir` is the broker-less counterpart of
sources/stream.py: messages land as JSON-lines files which any
consumer (including another of our pipelines) tails exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rabbit_data_pipeline_spark.pipeline.triggers import Trigger


def to_message(df: DataFrame, key_col: str | None = None, value_cols: list[str] | None = None, topic: str = "default") -> DataFrame:
    """Shape any DataFrame into the canonical message schema (JSON value)."""
    value = F.to_json(F.struct(*[F.col(c) for c in (value_cols or df.columns)]))
    key = F.col(key_col).cast("string") if key_col else F.lit("")
    return df.select(
        key.alias("key"),
        value.alias("value"),
        F.lit(topic).alias("topic"),
        F.current_timestamp().alias("ts"),
    )


def queue_dir_write_stream(
    df: DataFrame, queue_dir: str, checkpoint: str, trigger: Trigger | None = None
) -> StreamingQuery:
    writer = df.writeStream.format("json").option("path", queue_dir).option("checkpointLocation", checkpoint)
    writer = writer.trigger(**(trigger.streaming_options() if trigger else {"availableNow": True}))
    return writer.start()


def kafka_write_stream(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str, trigger: Trigger | None = None
) -> StreamingQuery:
    writer = (
        df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    writer = writer.trigger(**(trigger.streaming_options() if trigger else {"availableNow": True}))
    return writer.start()


def memory_write_stream(df: DataFrame, name: str, trigger: Trigger | None = None) -> StreamingQuery:
    writer = df.writeStream.format("memory").queryName(name).outputMode("append")
    writer = writer.trigger(**(trigger.streaming_options() if trigger else {"availableNow": True}))
    return writer.start()


def upsert_write_stream(
    df: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
    trigger: Trigger | None = None,
    order_col: str | None = None,
) -> StreamingQuery:
    """Stream → keyed table via per-batch MERGE (foreachBatch upsert):
    the streaming counterpart of the reference's Pdo/Clickhouse upsert
    sinks (src/Sinks/Pdo.php ON DUPLICATE KEY, Clickhouse flag dedup).

    Exactly-once WITHOUT sink-side transactions: the source offsets
    live in the checkpoint, and the merge itself is IDEMPOTENT — a
    replayed micro-batch upserts the same keys to the same values, so
    at-least-once delivery collapses to exactly-once table state (the
    same trick the reference's CH flag column exists for). Each batch
    rewrites the table via anti-join + union (operators/sync.upsert,
    broadcast delta); on Delta/Iceberg swap the body for MERGE INTO —
    same plan, transactional commit.

    `order_col`: if batches can carry multiple versions of a key, keep
    the max-`order_col` row per key (in-batch last-writer-wins) before
    merging."""
    from rabbit_data_pipeline_spark.operators.sync import keep_latest_by_flag, upsert

    def merge_batch(batch: DataFrame, _epoch: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        delta = keep_latest_by_flag(batch, keys, order_col) if order_col else batch
        base = table_path.rstrip("/")
        tmp, old = base + "__staging", base + "__old"

        # Crash recovery from a previous interrupted swap. Invariant of
        # the swap below: a complete copy of the table always exists at
        # `table_path` or `old` — never delete the only copy.
        if os.path.exists(old):
            if os.path.exists(table_path):
                shutil.rmtree(old)  # swap completed, cleanup didn't
            else:
                os.rename(old, table_path)  # died between the renames
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # stale staging from a crashed write

        if os.path.exists(table_path):
            current = spark.read.parquet(table_path)
            merged = upsert(current, delta, keys=keys, broadcast_source=True)
        else:  # first batch: table doesn't exist yet
            merged = delta
        merged.write.mode("overwrite").parquet(tmp)
        # Atomic-enough swap: rename the live table aside, promote the
        # staging dir, then drop the old copy. A crash at any point
        # leaves a full copy on disk, and the replayed micro-batch
        # re-merges idempotently.
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(tmp, table_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    writer = df.writeStream.foreachBatch(merge_batch).option("checkpointLocation", checkpoint)
    writer = writer.trigger(**(trigger.streaming_options() if trigger else {"availableNow": True}))
    return writer.start()


def rollup_write_stream(
    df: DataFrame,
    table_path: str,
    keys: list[str],
    value_col: str,
    checkpoint: str,
    trigger: Trigger | None = None,
) -> StreamingQuery:
    """Stream → incrementally-maintained rollup table (foreachBatch +
    operators/rollup.py partials): each micro-batch is aggregated to
    exact integer partials and MERGED into the stored rollup — the
    streaming counterpart of Y10's nightly delta job, with work per
    batch O(batch + rollup keys), never O(history).

    Exactly-once despite a non-idempotent merge: unlike upsert (which
    replays harmlessly), adding partials twice double-counts, so each
    swap commits an `_EPOCH` file INSIDE the table directory recording
    the last merged batch id — data and fence move atomically in the
    same rename. A replayed batch (crash between sink write and
    checkpoint commit) sees epoch <= fence and skips. Same
    crash-recovery invariant as upsert_write_stream: a full copy of
    the table always exists at `table_path` or `__old`."""
    def merge_batch(batch: DataFrame, epoch: int) -> None:
        merge_rollup_batch(batch, epoch, table_path, keys, value_col)

    writer = df.writeStream.foreachBatch(merge_batch).option("checkpointLocation", checkpoint)
    writer = writer.trigger(**(trigger.streaming_options() if trigger else {"availableNow": True}))
    return writer.start()


def merge_rollup_batch(batch: DataFrame, epoch: int, table_path: str, keys: list[str], value_col: str) -> bool:
    """One epoch-fenced merge step (the foreachBatch body of
    rollup_write_stream, module-level so the replay fence is directly
    unit-testable). Returns False when the fence rejected a replay."""
    import json
    import os
    import shutil

    from rabbit_data_pipeline_spark.operators.rollup import merge_rollups, rollup_partials

    spark = batch.sparkSession
    base = table_path.rstrip("/")
    tmp, old = base + "__staging", base + "__old"
    if os.path.exists(old):
        if os.path.exists(base):
            shutil.rmtree(old)
        else:
            os.rename(old, base)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    fence = os.path.join(base, "_EPOCH")
    if os.path.exists(fence) and json.load(open(fence))["epoch"] >= epoch:
        return False  # replayed batch already merged — the fence makes the merge idempotent
    delta = rollup_partials(batch, keys, value_col)
    if os.path.exists(base):
        merged = merge_rollups(spark.read.parquet(base), delta, keys)
    else:
        merged = delta
    merged.write.mode("overwrite").parquet(tmp)
    json.dump({"epoch": epoch}, open(os.path.join(tmp, "_EPOCH"), "w"))
    if os.path.exists(base):
        os.rename(base, old)
    os.rename(tmp, base)
    if os.path.exists(old):
        shutil.rmtree(old)
    return True
