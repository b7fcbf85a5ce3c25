"""Streaming plugins for the YAML pipeline spec — the reference's
core use-case (a YAML task consuming a broker and sinking transformed
messages, src/Scheduler.php + src/Sources/{Amqp,Nsq,RdKafka}.php)
expressed as a Structured Streaming DAG.

A task config like

    tail_orders:
      type: source.stream.queue_dir
      path: /data/queue
      output: [parse]
    parse:
      type: transform.parse_json
      schema: "user_id string, amount long"
      output: [agg]
    agg:
      type: transform.windowed_agg
      window: "1 minute"
      watermark: "10 minutes"
      group_by: [user_id]
      aggs: {total: "sum(amount)", n: "count(*)"}
      output: [out]
    out:
      type: sink.stream.memory
      name: results
      mode: update
      cron: 30            # reference cron parity -> processingTime 30s

compiles to ONE streaming query per sink. The scheduler is unchanged —
streaming DataFrames flow through the same DAG builder; sinks start a
StreamingQuery and record it on `scheduler.streaming_queries` so the
caller can await/stop them (run-forever is the production mode; tests
use cron: -1 → availableNow)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin
from rabbit_data_pipeline_spark.pipeline.triggers import parse_trigger


def _trigger_opts(cfg: dict[str, Any]) -> dict:
    return parse_trigger(cfg.get("cron", -1)).streaming_options()


@plugin("source.stream.queue_dir")
def _src_queue(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.sources.stream import queue_dir_stream

    return queue_dir_stream(sch.spark, cfg["path"], cfg.get("max_files_per_trigger"))


@plugin("source.stream.kafka")
def _src_kafka(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.sources.stream import kafka_stream

    return kafka_stream(
        sch.spark, cfg["bootstrap_servers"], cfg["topics"], cfg.get("starting_offsets", "latest")
    )


@plugin("source.stream.rate")
def _src_rate(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.sources.stream import rate_stream

    return rate_stream(sch.spark, int(cfg.get("rows_per_second", 100)))


@plugin("transform.parse_json")
def _parse_json(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Explode the message `value` JSON into typed columns; `schema` is
    a DDL string (works on batch and streaming inputs alike)."""
    from rabbit_data_pipeline_spark.streaming.ops import parse_json_messages

    (df,) = inputs
    return parse_json_messages(df, cfg["schema"], ts_col=cfg.get("ts_col", "ts"))


@plugin("transform.windowed_agg")
def _windowed_agg(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.streaming.ops import windowed_agg

    (df,) = inputs
    aggs = [F.expr(e).alias(name) for name, e in cfg["aggs"].items()]
    return windowed_agg(
        df,
        group_cols=list(cfg.get("group_by", [])),
        aggs=aggs,
        window_duration=cfg.get("window", "1 minute"),
        slide=cfg.get("slide"),
        watermark=cfg.get("watermark", "10 minutes"),
        ts_col=cfg.get("ts_col", "ts"),
    )


@plugin("transform.session_window")
def _session_window(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.streaming.ops import session_window_agg

    (df,) = inputs
    aggs = [F.expr(e).alias(name) for name, e in cfg["aggs"].items()]
    return session_window_agg(
        df,
        key_cols=list(cfg.get("group_by", [])),
        aggs=aggs,
        gap=cfg.get("gap", "5 minutes"),
        watermark=cfg.get("watermark", "10 minutes"),
        ts_col=cfg.get("ts_col", "ts"),
    )


@plugin("transform.stream_dedup")
def _stream_dedup(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.streaming.ops import stream_dedup

    (df,) = inputs
    return stream_dedup(
        df, list(cfg["keys"]), watermark=cfg.get("watermark", "10 minutes"), ts_col=cfg.get("ts_col", "ts")
    )


def _record(sch: Scheduler, q) -> None:
    if not hasattr(sch, "streaming_queries"):
        sch.streaming_queries = []
    sch.streaming_queries.append(q)


@plugin("sink.stream.memory")
def _sink_memory(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> None:
    (df,) = inputs
    q = (
        df.writeStream.format("memory")
        .queryName(cfg["name"])
        .outputMode(cfg.get("mode", "append"))
        .trigger(**_trigger_opts(cfg))
        .start()
    )
    _record(sch, q)
    return None


@plugin("sink.stream.queue_dir")
def _sink_queue(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> None:
    from rabbit_data_pipeline_spark.sinks.stream import queue_dir_write_stream, to_message

    (df,) = inputs
    out = to_message(df, key_col=cfg.get("key_col"), topic=cfg.get("topic", "default"))
    q = queue_dir_write_stream(out, cfg["path"], cfg["checkpoint"], parse_trigger(cfg.get("cron", -1)))
    _record(sch, q)
    return None


@plugin("sink.stream.kafka")
def _sink_kafka(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> None:
    from rabbit_data_pipeline_spark.sinks.stream import kafka_write_stream, to_message

    (df,) = inputs
    out = to_message(df, key_col=cfg.get("key_col"), topic=cfg["topic"])
    q = kafka_write_stream(
        out, cfg["bootstrap_servers"], cfg["topic"], cfg["checkpoint"], parse_trigger(cfg.get("cron", -1))
    )
    _record(sch, q)
    return None
