"""Kafka connector contract (reference src/Sources/RdKafka.php,
src/Sinks/RdKafka.php).

Two layers: option-wiring tests that always run (reader/writer methods
are intercepted, so the exact options our wrappers hand to Spark's
Kafka source/sink are asserted without a broker or the connector jar),
and a real-source test that activates only when
spark-sql-kafka-0-10 is on the classpath (skips cleanly here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from rabbit_data_pipeline_spark.sources.stream import MESSAGE_SCHEMA, kafka_stream

# What Spark's kafka source actually produces (partial): key/value are
# BINARY — our wrapper must cast them to the canonical message schema.
KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
    ]
)


def _kafka_classpath_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def test_kafka_source_option_wiring(spark, monkeypatch):
    """kafka_stream must wire bootstrap servers, subscribe and
    startingOffsets (RdKafka.php consumer config parity) and cast the
    binary key/value to the canonical string message schema."""
    from pyspark.sql.streaming import readwriter as _rw

    recorded: dict[str, str] = {}
    formats: list[str] = []

    orig_format = _rw.DataStreamReader.format
    orig_option = _rw.DataStreamReader.option

    def rec_format(self, source):
        formats.append(source)
        return orig_format(self, source)

    def rec_option(self, key, value):
        recorded[key] = value
        return orig_option(self, key, value)

    def fake_load(self, path=None, format=None, schema=None, **options):
        return spark.createDataFrame([], KAFKA_SOURCE_SCHEMA)

    monkeypatch.setattr(_rw.DataStreamReader, "format", rec_format)
    monkeypatch.setattr(_rw.DataStreamReader, "option", rec_option)
    monkeypatch.setattr(_rw.DataStreamReader, "load", fake_load)

    df = kafka_stream(
        spark,
        bootstrap_servers="broker1:9092,broker2:9092",
        topics="t1,t2",
        starting_offsets="earliest",
        maxOffsetsPerTrigger="50000",
    )
    assert formats == ["kafka"]
    assert recorded["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert recorded["subscribe"] == "t1,t2"
    assert recorded["startingOffsets"] == "earliest"
    assert recorded["maxOffsetsPerTrigger"] == "50000"
    assert df.schema == MESSAGE_SCHEMA


def test_kafka_sink_option_wiring(spark, monkeypatch):
    """kafka_write_stream must wire topic, bootstrap servers and the
    checkpoint, and feed string-cast key/value (RdKafka.php producer
    parity)."""
    from pyspark.sql.streaming import readwriter as _rw

    from rabbit_data_pipeline_spark.sinks.stream import kafka_write_stream, to_message

    recorded: dict[str, str] = {}
    formats: list[str] = []
    started: list[bool] = []

    orig_format = _rw.DataStreamWriter.format
    orig_option = _rw.DataStreamWriter.option

    def rec_format(self, source):
        formats.append(source)
        return orig_format(self, source)

    def rec_option(self, key, value):
        recorded[key] = value
        return orig_option(self, key, value)

    def fake_start(self, *a, **k):
        started.append(True)
        return None

    monkeypatch.setattr(_rw.DataStreamWriter, "format", rec_format)
    monkeypatch.setattr(_rw.DataStreamWriter, "option", rec_option)
    monkeypatch.setattr(_rw.DataStreamWriter, "start", fake_start)

    msgs = to_message(
        spark.readStream.format("rate").option("rowsPerSecond", "1").load(),
        key_col="value",
        topic="ignored-by-sink",
    )
    kafka_write_stream(
        msgs, bootstrap_servers="b:9092", topic="out-topic", checkpoint="/tmp/ckpt-kafka-test"
    )
    assert "kafka" in formats
    assert recorded["kafka.bootstrap.servers"] == "b:9092"
    assert recorded["topic"] == "out-topic"
    assert recorded["checkpointLocation"] == "/tmp/ckpt-kafka-test"
    assert started == [True]


def test_kafka_source_real_classpath(spark):
    """Activates when the spark-sql-kafka jar is present: resolves the
    real source (no broker needed until a query starts) and checks the
    canonical schema comes out of the real kafka relation."""
    if not _kafka_classpath_available(spark):
        pytest.skip("spark-sql-kafka-0-10 not on classpath")
    df = kafka_stream(spark, "localhost:9092", "contract-topic", starting_offsets="earliest")
    assert df.schema == MESSAGE_SCHEMA
    assert df.isStreaming
