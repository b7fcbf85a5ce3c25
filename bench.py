"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is built fresh and fully materialized via a count-shaped
action (``df.write.format("noop")`` keeps the whole plan, including
project/sort, without collecting to the driver).

Second scale point: when running at the default sf0.1, the harness
also times the same queries at a synthetic ~sf1 (10x sf0.1): each
table is unioned with key-shifted copies so join keys stay unique and
join fan-out matches a real scale-up (a naive 10x row copy would make
every join key 10x hot and explode outputs 100x). Built once into
/tmp and reused; skipped when $SPARK_GRAFT_NO_SCALE=1 or when the
primary sf dir was overridden (the driver's env probe stays fast).
The extra keys (sf1_*) are additive — the one-JSON-line contract and
the sf0.1 metric/value fields are unchanged round-over-round."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_DEFAULT_SF_DIR = "/root/testdata/sf0.1"
_SCALED_DIR = "/tmp/rdps_scaled_sf1"
_SCALE_FACTOR = 10

# table -> columns shifted by copy_index * (max_key + 1); foreign keys
# use the OWNING table's offset so referential joins stay 1:1.
_KEY_OWNERS = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_SHIFTS = {
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"), ("l_suppkey", "supplier")],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "events": [("event_id", "events"), ("user_id", "events")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
    # nation/region: broadcast dims, single copy
    "nation": [],
    "region": [],
}


def _ensure_scaled(spark, src_dir: str, dst_dir: str, factor: int) -> float:
    """Build the key-shifted scaled copy if absent; returns build secs
    (0.0 when reused). documents.text gets a per-copy suffix so the
    dedup pipeline sees near-dup families instead of 10-way exact
    clones (bounded candidate pairs, realistic workload)."""
    import pyspark.sql.functions as F

    from rabbit_data_pipeline_spark.session import load_tables

    # Reuse only when the SOURCE is unchanged: the marker records a
    # fingerprint of the source files (name/size/mtime), so regenerated
    # testdata invalidates the scaled copy instead of silently timing
    # queries against a stale 10x of the old data.
    fingerprint = repr(
        sorted(
            (f, os.path.getsize(os.path.join(src_dir, f)), int(os.path.getmtime(os.path.join(src_dir, f))))
            for f in os.listdir(src_dir)
        )
    )
    marker = os.path.join(dst_dir, "_BUILT")
    if os.path.exists(marker) and open(marker).read() == fingerprint:
        return 0.0
    t0 = time.perf_counter()
    offsets = {}
    tables = {}
    for t in _SHIFTS:
        df = (
            load_tables(spark, src_dir, ("events",))["events"]
            if t == "events"
            else spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        )
        tables[t] = df
        if t in _KEY_OWNERS:
            m = df.agg(F.max(_KEY_OWNERS[t])).first()[0]  # None on an empty table
            offsets[t] = (int(m) if m is not None else 0) + 1
    for t, shifts in _SHIFTS.items():
        df = tables[t]
        if not shifts:
            out = df
        else:
            copies = []
            for i in range(factor):
                c = df
                for col, owner in shifts:
                    c = c.withColumn(col, F.col(col) + F.lit(i * offsets[owner]))
                if t == "documents" and i > 0:
                    c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" rev{i}")))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        n_files = 8 if t in ("lineitem", "orders", "events") else 2
        out.repartition(n_files).write.mode("overwrite").parquet(os.path.join(dst_dir, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write(fingerprint)
    return round(time.perf_counter() - t0, 2)

HEADLINE = [
    "q_agg_pricing",
    "q_filter_project",
    "q_join_broadcast",
    "q_join_multiway",
    "q_window_rank",
    "q_topn",
    "q_sessionize",
    "q_json_extract",
    "q_ship_priority",
    "q_big_orders",
    "q_waiting_supplier",
    "q_asof_join",
    # LLM ops (registered in later build steps; skipped if absent)
    "dedup_exact",
    "dedup_minhash",
    "ann_bruteforce",
    "text_quality",
    "text_tokens",
]


def _stream_probe(spark, seconds: float = 8.0) -> float:
    """End-to-end Structured Streaming throughput: rate source →
    keyed watermarked 10s-window aggregation → noop sink, measured as
    processed rows/sec from the engine's own progress metrics. The
    rate source is asked for far more rows than one machine ingests
    (1M rows/s) so the measured number is the PIPELINE's ceiling, not
    the generator's."""
    import pyspark.sql.functions as F

    from rabbit_data_pipeline_spark.streaming import windowed_agg

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1000000")
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("key"),
            (F.col("value") % 97).cast("double").alias("v"),
        )
    )
    agg = windowed_agg(
        src,
        group_cols=["key"],
        aggs=[F.count("*").alias("n"), F.sum("v").alias("sv")],
        window_duration="10 seconds",
        watermark="10 seconds",
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"/tmp/rdps_stream_probe_ckpt_{os.getpid()}")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        time.sleep(seconds)
        rows = sum(p["numInputRows"] for p in q.recentProgress)
        secs = sum(p["batchDuration"] for p in q.recentProgress) / 1000.0
    finally:
        q.stop()
    return round(rows / max(secs, 1e-6), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rabbit_data_pipeline_spark.queries import registry
    from rabbit_data_pipeline_spark.session import get_spark

    spark = get_spark("rdps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    # Registered dedup_minhash is the small seeded-corpus correctness
    # gate; the bench keeps timing the heavy sf-corpus pipeline.
    from rabbit_data_pipeline_spark.queries.llm import dedup_minhash_scale

    overrides = {"dedup_minhash": dedup_minhash_scale}

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT.
    reg["q_filter_project"].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Three timed runs per query at the primary scale point, keep the
    # best: the first run pays plan/codegen/JIT warm-up, the min is the
    # steady-state cost a long-running cluster actually sees — and with
    # a shared-host VM the min-of-3 is much less sensitive to noisy-
    # neighbor interference (observed: identical code, 11.4 s vs 14.5 s
    # totals an hour apart), so round-over-round numbers compare.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = overrides.get(name) or (reg[name].builder if name in reg else None)
        if builder is None:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
    }

    if sf_dir == _DEFAULT_SF_DIR and os.environ.get("SPARK_GRAFT_NO_SCALE") != "1":
        try:
            result["stream_rows_per_sec"] = _stream_probe(spark)
        except Exception as e:
            result["stream_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            build_sec = _ensure_scaled(spark, sf_dir, _SCALED_DIR, _SCALE_FACTOR)
            sf1: dict[str, float] = {}
            for name in HEADLINE:
                builder = overrides.get(name) or (reg[name].builder if name in reg else None)
                if builder is None:
                    continue
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    builder(spark, _SCALED_DIR).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                sf1[name] = round(best, 4)
            # Scaling regression gate: 10x data should cost well under
            # 10x wall on every headline query (partial aggs, broadcast
            # joins, bounded candidate generation). A ratio > 6 means a
            # plan went super-linear-ish — name the offenders so the
            # round-over-round record catches the regression.
            superlinear = {
                n: round(sf1[n] / timings[n], 2)
                for n in sf1
                if n in timings and timings[n] > 0.05 and sf1[n] / timings[n] > 6.0
            }
            result.update(
                {
                    "sf1": round(0.1 * _SCALE_FACTOR, 2),
                    "sf1_queries": sf1,
                    "sf1_total": round(sum(sf1.values()), 4),
                    "sf1_build_sec": build_sec,
                    "sf1_superlinear": superlinear,
                }
            )
        except Exception as e:  # scale point is evidence, not the contract
            result["sf1_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
