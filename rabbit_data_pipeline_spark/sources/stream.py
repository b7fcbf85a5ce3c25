"""Streaming message sources — the reference's broker consumers
(src/Sources/{Amqp,Nsq,RdKafka}.php) re-expressed as Structured
Streaming sources producing one canonical message schema:

    key string, value string, topic string, ts timestamp

- ``kafka_stream``: the production path, `readStream.format("kafka")`
  (needs the spark-sql-kafka package on the cluster; gated here — no
  broker or jar in this container).
- ``queue_dir_stream``: broker-less substrate with the same schema —
  producers append JSON-lines files to a directory, Spark's file
  stream source tails it exactly-once (checkpointed). This is what
  AMQP/NSQ consumers reduce to for tests, and is itself a legitimate
  landing-zone pattern at scale (S3 drop dir + file stream).
- ``rate_stream``: synthetic load for smoke tests.

The reference consumes one message per coroutine callback; Structured
Streaming micro-batches the same feed, so downstream DataFrame logic
is identical to batch — that's the point of the unified model
(Structured Streaming paper, SIGMOD 2018).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

MESSAGE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("topic", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def queue_dir_stream(spark: SparkSession, queue_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(queue_dir)


def queue_dir_publish(queue_dir: str, messages: list[dict[str, Any]], topic: str = "default") -> str:
    """Producer side of the file-queue (what an AMQP publisher becomes
    in tests). Atomic rename so the stream never reads half a file."""
    os.makedirs(queue_dir, exist_ok=True)
    tmp = os.path.join(queue_dir, f".{uuid.uuid4().hex}.tmp")
    final = tmp.replace("/.", "/").replace(".tmp", ".json")
    with open(tmp, "w") as f:
        for m in messages:
            rec = {
                "key": str(m.get("key", "")),
                "value": m["value"] if isinstance(m.get("value"), str) else json.dumps(m.get("value")),
                "topic": m.get("topic", topic),
                "ts": m.get("ts") or time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            f.write(json.dumps(rec) + "\n")
    os.rename(tmp, final)
    return final


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    **options: str,
) -> DataFrame:
    """Kafka consumer (RdKafka source parity). Casts to the canonical
    message schema. Requires org.apache.spark:spark-sql-kafka-0-10 on
    the cluster classpath. Without the jar, the broker side is still
    real: ``sources/kafka_protocol.py`` speaks the Kafka wire protocol
    natively (Metadata/ListOffsets/Produce/Fetch, RecordBatch v2 with
    CRC32C, unit-tested against scripted brokers) and its
    ``drain_to_queue_dir`` bridges fetched partitions into the
    queue-dir substrate — connect with ``kafka_protocol.connect_client``
    when a broker is reachable."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("timestamp").alias("ts"),
    )


def amqp_stream(spark: SparkSession, queue_dir: str, **_: Any) -> DataFrame:
    """AMQP consumer (reference src/Sources/Amqp.php). The broker side
    is real: ``sources/amqp_protocol.py`` speaks AMQP 0-9-1 natively
    (handshake/declare/qos/consume/deliver-reassembly/ack/publish,
    unit-tested against scripted byte streams) and its
    ``drain_to_queue_dir`` bridges a live subscription into this
    queue-dir substrate — connect with ``amqp_protocol.connect_client``
    when a RabbitMQ is reachable; without one the substrate alone
    satisfies the consumer contract."""
    return queue_dir_stream(spark, queue_dir)


def nsq_stream(spark: SparkSession, queue_dir: str, **_: Any) -> DataFrame:
    """NSQ consumer (reference src/Sources/Nsq.php) — same substrate.
    The broker side is real: ``sources/nsq_protocol.py`` speaks the
    NSQ V2 TCP protocol natively (handshake/SUB/RDY/FIN/REQ/heartbeat,
    unit-tested against scripted byte streams) and
    ``drain_to_queue_dir`` bridges a live subscription into this
    substrate — connect with ``nsq_protocol.connect_consumer`` when an
    nsqd is reachable."""
    return queue_dir_stream(spark, queue_dir)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.col("value").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            F.lit("rate").alias("topic"),
            F.col("timestamp").alias("ts"),
        )
    )
