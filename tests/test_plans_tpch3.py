"""Plan contracts for the TPC-H completion pack (queries/tpch3.py):
the properties that make each query scale-safe must be visible in the
physical plan, not just intended in the code."""

from __future__ import annotations

import contextlib
import io

import pytest

from rabbit_data_pipeline_spark.queries import registry


@pytest.fixture(scope="module")
def plans(spark, sf_smoke):
    reg = registry()

    def get(name: str) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            reg[name].builder(spark, sf_smoke).explain("formatted")
        return buf.getvalue()

    return get


def test_min_cost_supplier_dims_broadcast_one_fact_shuffle(plans):
    """Q2 shape: part and the region-filtered supplier dim broadcast;
    the window MIN runs over the post-agg cost table, never lineitem."""
    p = plans("q_min_cost_supplier")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    # the p_size/p_name filter reaches the part scan
    assert "PushedFilters" in p and "EqualTo(p_size,15)" in p


def test_product_profit_single_fact_fact_shuffle(plans):
    """Q9 shape: part/supplier/nation broadcast; only lineitem⋈orders
    and the final agg exchange shuffle rows."""
    p = plans("q_product_profit")
    assert p.count("BroadcastHashJoin") >= 3
    assert "StartsWith(p_name,red)" in p  # filter pushed to the part scan


def test_important_stock_scans_fact_once(plans):
    """Q11 shape: the scalar total is a window over the grouped table,
    so lineitem appears exactly once in the plan (the spec's
    formulation scans it twice) and the window's single-partition
    exchange carries only post-agg rows."""
    p = plans("q_important_stock")
    assert p.count("lineitem.parquet") == 1
    assert "Window" in p


def test_promo_revenue_pushes_month_range(plans):
    p = plans("q_promo_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in p and "LessThan(l_shipdate" in p
    read = next(line for line in p.splitlines() if "ReadSchema" in line and "lineitem" in line.lower() or "l_extendedprice" in line)
    assert "l_comment" not in read


def test_supplier_count_anti_join_broadcasts(plans):
    """Q16 shape: the NOT-IN exclusion is a broadcast anti join, never
    a shuffled one — the flagged-supplier list is tiny by contract."""
    p = plans("q_supplier_count")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_potential_promotion_semi_joins_broadcast(plans):
    """Q20 shape: both IN chains become broadcast semi joins; the only
    row-moving exchange is the (partkey,suppkey) aggregation."""
    p = plans("q_potential_promotion")
    assert "LeftSemi" in p
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_min_cost_supplier_correct_on_smj_path(spark, sf_smoke):
    """Force sort-merge (broadcast off): the Q2 answer must not change
    when the dims are too big to broadcast at 100 TB."""
    reg = registry()
    want = sorted(map(tuple, reg["q_min_cost_supplier"].builder(spark, sf_smoke).collect()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = sorted(map(tuple, reg["q_min_cost_supplier"].builder(spark, sf_smoke).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want


def test_record_linkage_blocked_join_no_cartesian(plans):
    """Q65: dictionary self-join is equi-keyed on the blocking token —
    never a cartesian — and the edit-distance filter runs post-join."""
    p = plans("q_record_linkage")
    assert "CartesianProduct" not in p
    assert "levenshtein" in p


def test_skyline_sweep_shape(plans):
    """Q67: the corpus-scale work is one agg; the skyline set joins
    back by broadcast, and no self-join of the full table exists."""
    p = plans("q_skyline")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_gap_fill_no_cartesian_window_rides_user_key(plans):
    """Q66: calendar⋈daily is an equi-join on (user_id, day); the LOCF
    window partitions by the same user key."""
    p = plans("q_gap_fill")
    assert "CartesianProduct" not in p
    assert "RunningWindowFunction" in p or "Window" in p


def test_text_index_rankers_stay_jvm_side(plans):
    """L54-L56: inverted index, BM25 and PMI plans contain no Python
    evaluation and the rankers' top-k is TakeOrdered, not a sort."""
    for name in ("text_inverted_index", "text_bm25", "text_collocations"):
        p = plans(name)
        assert "BatchEvalPython" not in p, name
        assert "CartesianProduct" not in p, name
    assert "TakeOrderedAndProject" in plans("text_bm25")
    assert "TakeOrderedAndProject" in plans("text_collocations")


def test_sym_edges_one_subtree_same_multiset(spark):
    """r15: graph-query edge symmetrization must plan the pair dedup
    ONCE (explode of a 2-struct array above one distinct) instead of
    the old unionAll(project, swapped-project), which planned the fact
    join + distinct per branch — and must produce exactly the old edge
    multiset."""
    import io
    import contextlib
    import re

    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.queries.tpch3 import _sym_edges

    pairs = spark.createDataFrame(
        [(2, 3), (2, 5), (4, 3), (4, 3)], ["c", "s"]
    ).distinct()
    edges = _sym_edges(pairs)
    old = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edges.explain("formatted")
    p = buf.getvalue()
    assert sorted(map(tuple, edges.collect())) == sorted(map(tuple, old.collect()))
    # one aggregation subtree: a single dedup exchange, no Union
    assert "Union" not in p
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1
    # weighted variant keeps the weight on both directions
    wpairs = spark.createDataFrame([(2, 3, 7), (4, 5, 9)], ["c", "s", "w"])
    got = sorted(map(tuple, _sym_edges(wpairs, weight="w").collect()))
    assert got == [(2, 3, 7), (3, 2, 7), (4, 5, 9), (5, 4, 9)]
