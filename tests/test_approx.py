"""Error-bound gates for the approximate aggregates (functions/approx)
— sketches can't be value-hash-gated cross-engine, so the contract is
closeness to the exact answer on the real events table, which is what
a production exact→approx swap needs to hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.functions.approx import (
    approx_distinct,
    approx_heavy_hitters,
    approx_quantiles,
)
from rabbit_data_pipeline_spark.session import load_tables


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, ("events",))["events"]


def test_approx_distinct_within_rsd(spark, sf_dir):
    e = _events(spark, sf_dir)
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r.event_type: r.approx_distinct_user_id
        for r in approx_distinct(e, ["event_type"], "user_id", rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, approx[k], n)


def test_approx_quantiles_rank_error(spark, sf_dir):
    e = _events(spark, sf_dir)
    got = approx_quantiles(e, ["event_type"], "value", [0.5], accuracy=10000).collect()
    for r in got:
        sub = [x.value for x in e.filter(F.col("event_type") == r.event_type).select("value").collect()]
        sub.sort()
        q = r["approx_q_value"][0]
        # rank of the returned value must be within 1% of the true median rank
        import bisect

        rank = bisect.bisect_left(sub, q)
        assert abs(rank - len(sub) / 2) <= max(2, 0.01 * len(sub) + 1)


def test_approx_heavy_hitters_matches_exact_topk(spark, sf_dir):
    e = _events(spark, sf_dir)
    exact = [
        (r.user_id, r.freq)
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "user_id")
        .limit(10)
        .collect()
    ]
    got = [(r.user_id, r.freq) for r in approx_heavy_hitters(e, ["user_id"], k=10).collect()]
    assert got == exact  # uncapped form is exact


def test_approx_heavy_hitters_capped_finds_hot_key(spark):
    # one key with 3000 rows, 500 singleton keys: the capped form must
    # surface the hot key with its exact count even though each
    # partition forwards only its local top-5.
    rows = [(0,)] * 3000 + [(i,) for i in range(1, 501)]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    got = approx_heavy_hitters(df, ["k"], k=1, per_partition_cap=5).collect()
    assert got[0].k == 0 and got[0].freq == 3000


def test_approx_heavy_hitters_capped_bounds_shuffle(spark):
    # all-unique keys: survivors per partition ≤ cap, so the merge
    # sees ≤ partitions×cap rows (the OOM guard the cap exists for).
    df = spark.createDataFrame([(i,) for i in range(10000)], ["k"]).repartition(8)
    got = approx_heavy_hitters(df, ["k"], k=50, per_partition_cap=5)
    assert got.count() == 40  # 8 partitions × cap 5, then limit 50
