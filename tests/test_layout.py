"""Storage-layout contracts (SURVEY §6): bucketed co-located joins skip
the exchange, compaction hits the file-count target, partitioned
layouts prune at the scan. These are the layout half of the scale
design — plan/filesystem assertions, not value checks (values are
covered by the oracle gate; layout only changes WHERE bytes live)."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.session import load_tables


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    from rabbit_data_pipeline_spark.sinks.layout import write_bucketed

    t = load_tables(spark, sf_smoke, ("lineitem", "orders"))
    write_bucketed(t["lineitem"], "bt_lineitem", ["l_orderkey"], num_buckets=8)
    write_bucketed(t["orders"], "bt_orders", ["o_orderkey"], num_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_skips_exchange(spark, bucketed_tables):
    """lineitem ⋈ orders on the bucket key: both sides bucketed the
    same way → no Exchange feeding the join. The shuffle was paid once
    at write time. Broadcast is disabled to pin the shuffle-join path
    this layout exists for (at 100 TB neither fact broadcasts)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_lineitem").join(
            spark.table("bt_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = _explain(j.groupBy("o_orderpriority").count())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert "Bucketed: true" in p
    # the ONLY exchange is the post-join agg on o_orderpriority; the
    # join consumes both bucketed scans directly
    assert p.count("Exchange (") == 1
    assert "hashpartitioning(o_orderpriority" in p


def test_bucketed_agg_skips_exchange(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucketing: no exchange."""
    p = _explain(spark.table("bt_lineitem").groupBy("l_orderkey").agg(F.sum("l_quantity")))
    assert "Exchange" not in p


def test_compact_reduces_file_count(spark, sf_smoke, tmp_path):
    from rabbit_data_pipeline_spark.sinks.layout import compact

    path = str(tmp_path / "many_small")
    li = load_tables(spark, sf_smoke, ("lineitem",))["lineitem"]
    li.repartition(64).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 32
    compact(spark, path, target_file_mb=128)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert after <= 2
    assert spark.read.parquet(path).count() == li.count()


def test_partitioned_layout_prunes_partitions(spark, sf_smoke, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (pruned at listing time), not a data filter."""
    from rabbit_data_pipeline_spark.sinks.files import write_files

    path = str(tmp_path / "orders_by_status")
    o = load_tables(spark, sf_smoke, ("orders",))["orders"]
    write_files(o, path, partition_by=["o_orderstatus"])
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    p = _explain(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in p.replace("#", "").replace("\n", "") or (
        "PartitionFilters" in p and "o_orderstatus" in p.split("PartitionFilters")[1].split("]")[0]
    )


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_smoke, tmp_path):
    """DPP: a selective filter on the dim side prunes the fact's
    partitions at runtime — the fact scan carries a dynamicpruning
    subquery instead of reading every partition."""
    from rabbit_data_pipeline_spark.sinks.files import write_files

    path = str(tmp_path / "orders_by_prio")
    o = load_tables(spark, sf_smoke, ("orders",))["orders"]
    write_files(o, path, partition_by=["o_orderpriority"])
    # stats-based benefit estimation vetoes DPP on toy-sized local data;
    # disable it so the plan shape matches what a 100 TB fact gets
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try:
        fact = spark.read.parquet(path)
        dim = spark.createDataFrame(
            [("1-URGENT", "keep")], "o_orderpriority string, tag string"
        ).filter(F.col("tag") == "keep")
        p = _explain(fact.join(dim, on="o_orderpriority"))
    finally:
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    assert "dynamicpruning" in p.lower()


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_smoke):
    """Runtime bloom-filter join pruning — the shuffle-time complement
    to DPP for non-partition keys: a selective filter on one join side
    injects might_contain() into the fact scan, dropping non-matching
    rows before the shuffle. Default-on (enabled=true) and size-gated;
    a 100 TB fact clears the 10 GB application-side gate on its own —
    locally we lower it to prove the rewrite fires."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, sf_smoke, ("lineitem", "orders"))
        sel = t["orders"].filter(F.col("o_totalprice") > 400000)
        j = t["lineitem"].join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "might_contain" in plan.lower()
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


# ------------------------------------------------------ Z-order clustering


def test_zorder_key_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.sinks.layout import zorder_key

    rows = [(0, 0), (255, 0), (0, 255), (255, 255), (100, 200), (37, 211)]
    df = spark.createDataFrame(rows, ["x", "y"])
    mins, maxs = {"x": 0, "y": 0}, {"x": 255, "y": 255}
    got = [
        r["k"]
        for r in df.select(zorder_key(["x", "y"], mins, maxs, bits=8).alias("k"), "x", "y")
        .orderBy("x", "y").collect()
    ]

    def interleave(x, y):
        sx = min(255, x * 256 // 255)
        sy = min(255, y * 256 // 255)
        k = 0
        for i in range(8):
            k |= ((sx >> i) & 1) << (2 * i)
            k |= ((sy >> i) & 1) << (2 * i + 1)
        return k

    want = [interleave(x, y) for x, y in sorted(rows)]
    assert got == want


def test_zorder_clusters_narrow_ranges_on_both_dims(spark, tmp_path):
    """Effectiveness: a 64x64 uniform grid written in 16 z-ordered
    files gives every file a narrow min/max span on BOTH dims (the
    stats data skipping prunes with), while a plain sort on x leaves
    the full y range in every file."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.sinks.layout import cluster_by_zorder

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    cluster_by_zorder(grid, ["x", "y"], n_files=16).write.parquet(zpath)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def avg_spans(path):
        per_file = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        n = len(per_file)
        return sum(r["sx"] for r in per_file) / n, sum(r["sy"] for r in per_file) / n

    zx, zy = avg_spans(zpath)
    sx, sy = avg_spans(spath)
    # z-order: both dims well under half the global span (63)
    assert zx <= 32 and zy <= 32, (zx, zy)
    # x-sort: x is narrow but y spans the whole range
    assert sx <= 16 and sy >= 60, (sx, sy)


def test_zorder_rejects_long_overflow(spark):
    import pytest as _pytest

    from rabbit_data_pipeline_spark.sinks.layout import zorder_key

    with _pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], {}, {}, bits=16)


def test_orc_scan_gets_pushdown(spark, sf_smoke, tmp_path):
    """ORC scans get the same filter-pushdown treatment as parquet:
    the predicate must reach the ORC scan node."""
    import contextlib
    import io

    from rabbit_data_pipeline_spark.session import load_tables

    d = load_tables(spark, sf_smoke, ("documents",))["documents"].select("doc_id", "source")
    path = str(tmp_path / "docs_orc")
    d.write.mode("overwrite").orc(path)
    q = spark.read.orc(path).filter("doc_id > 100").select("source")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert "ReadSchema" in plan
