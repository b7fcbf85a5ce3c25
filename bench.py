"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is built fresh and fully materialized via a count-shaped
action (``df.write.format("noop")`` keeps the whole plan, including
project/sort, without collecting to the driver)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

    # Two timed runs per query, keep the best: the first run pays
    # plan/codegen/JIT warm-up, the min is the steady-state cost a
    # long-running cluster actually sees (and is far less sensitive to
    # background machine noise, so round-over-round numbers compare).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = overrides.get(name) or (reg[name].builder if name in reg else None)
        if builder is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
