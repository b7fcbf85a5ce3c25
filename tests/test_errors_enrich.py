"""Row-level error routing (errHandler parity) and stream-static
enrichment joins through the pipeline DAG."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F


def test_parse_json_with_dlq(spark):
    from rabbit_data_pipeline_spark.functions.errors import parse_json_with_dlq

    rows = [
        ("k1", '{"user_id": "u1", "amount": 5}'),
        ("k2", "{this is not json"),
        ("k3", '{"user_id": "u3", "amount": 7}'),
        ("k4", None),
    ]
    df = spark.createDataFrame(rows, ["key", "value"])
    good, dlq = parse_json_with_dlq(df, "value", "user_id string, amount long", keep_cols=["key"])
    assert {(r.key, r.user_id, r.amount) for r in good.collect()} == {("k1", "u1", 5), ("k3", "u3", 7)}
    assert {(r.key, r.raw_value) for r in dlq.collect()} == {("k2", "{this is not json"), ("k4", None)}


def test_with_error_column_split(spark):
    from rabbit_data_pipeline_spark.functions.errors import split_on_error, with_error_column

    df = spark.createDataFrame(
        [(1, 50, "en"), (2, -3, "en"), (3, 10, ""), (4, 7, "fr")], ["id", "qty", "lang"]
    )
    marked = with_error_column(
        df, {"negative qty": F.col("qty") >= 0, "empty lang": F.length("lang") > 0}
    )
    clean, dlq = split_on_error(marked)
    assert sorted(r.id for r in clean.collect()) == [1, 4]
    errs = {r.id: r["__error"] for r in dlq.collect()}
    assert errs == {2: "negative qty", 3: "empty lang"}


def test_stream_static_enrichment_join(spark, tmp_path):
    """A YAML task mixing a STREAMING source with a BATCH dim table in
    one DAG: the stream enriches against the static side per
    micro-batch (stream-static join) — the reference cannot express
    this at all (one Message stream per task)."""
    from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler
    from rabbit_data_pipeline_spark.sources.stream import queue_dir_publish

    qdir = str(tmp_path / "q")
    queue_dir_publish(qdir, [
        {"key": "1", "value": {"user_id": "u1", "amount": 5}, "ts": "2024-01-01T12:00:00"},
        {"key": "2", "value": {"user_id": "u2", "amount": 7}, "ts": "2024-01-01T12:00:10"},
        {"key": "3", "value": {"user_id": "zz", "amount": 1}, "ts": "2024-01-01T12:00:20"},
    ])
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame([("u1", "alpha"), ("u2", "beta")], ["user_id", "segment"]).write.parquet(dim_path)
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    yaml_cfg = f"""
enrich:
  tail:
    type: source.stream.queue_dir
    start: true
    path: {qdir}
    output: [parse]
  parse:
    type: transform.parse_json
    schema: "user_id string, amount long"
    output: [joined]
  dim:
    type: source.parquet
    start: true
    path: {dim_path}
    output: [joined]
  joined:
    type: transform.join
    inputs: [parse, dim]
    keys: [user_id]
    how: inner
    broadcast_right: true
    output: [out]
  out:
    type: sink.stream.memory
    name: {name}
    cron: -1
"""
    sch = Scheduler.from_yaml(spark, yaml_cfg)
    sch.run("enrich")
    sch.streaming_queries[0].awaitTermination(120)
    rows = {(r.user_id, r.amount, r.segment) for r in spark.table(name).collect()}
    assert rows == {("u1", 5, "alpha"), ("u2", 7, "beta")}
