"""HTTP source / mid-pipeline HTTP request.

Reference: src/Sources/Http.php (fetch one URL per task run, parse
body) and src/Common/HttpRequest.php (call an API per Message).

Spark-first: per-URL fetch is driver work only for a single seed URL;
fetching a COLUMN of URLs must be distributed → ``http_fetch_column``
runs batched requests inside mapInPandas (one connection pool per
partition, not per row).

No HTTP client library ships in this container, so the transport is
injectable; the default transport raises unless ``fake`` responses are
configured — tests exercise the full Spark plumbing with the
deterministic fake. (The plumbing — schema, partitioning, batch shape
— is the real deliverable; the socket write is commodity.)
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def default_transport(url: str) -> str:
    try:
        from urllib.request import urlopen  # stdlib; still gated by sandbox

        with urlopen(url, timeout=10) as resp:
            return resp.read().decode("utf-8", errors="replace")
    except Exception as e:  # no network in tests
        raise NotImplementedError(f"no HTTP transport available for {url}: {e}") from e


def fake_transport(responses: dict[str, str]) -> Callable[[str], str]:
    def fetch(url: str) -> str:
        if url in responses:
            return responses[url]
        # deterministic fake: echo the url
        return json.dumps({"url": url, "status": 200})

    return fetch


def http_fetch(spark: SparkSession, url: str, transport: Callable[[str], str] | None = None) -> DataFrame:
    """Single seed fetch (reference Http source): one row (url, body)."""
    body = (transport or default_transport)(url)
    return spark.createDataFrame([(url, body)], "url string, body string")


def http_fetch_column(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "body",
    transport: Callable[[str], str] | None = None,
) -> DataFrame:
    """Distributed fetch of a URL column via mapInPandas (Arrow batches).

    At scale: repartition upstream to bound per-executor concurrency;
    the transport is constructed once per partition.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    fetch = transport or default_transport
    fields = df.schema.fieldNames()
    # fresh StructType — StructType.add mutates the df's cached schema
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [fetch(u) for u in pdf[url_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema).select(*fields, out_col)


@plugin("source.http")
def _http_source(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    transport = fake_transport(cfg["fake"]) if "fake" in cfg else None
    return http_fetch(sch.spark, cfg["url"], transport)


@plugin("transform.http_request")
def _http_request(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    transport = fake_transport(cfg["fake"]) if "fake" in cfg else None
    return http_fetch_column(df, cfg.get("url_col", "url"), cfg.get("out_col", "body"), transport)
