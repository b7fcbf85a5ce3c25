"""Physical-plan assertions (SURVEY §5.3): the scale contract is that
Catalyst produces the plan we designed for — filters and column pruning
reach the parquet scan, dimension joins broadcast, aggregates combine
map-side, single-pass ops never shuffle, and top-k never global-sorts.
These are regression tests against plan quality, not correctness: a
code change that silently turns a broadcast join into a shuffle join or
drops pushdown still passes value checks but fails here."""

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


def test_filter_and_projection_reach_scan(plans):
    p = plans("q_filter_project")
    assert "PushedFilters: [" in p and "GreaterThanOrEqual(l_shipdate" in p
    # column pruning: the scan reads only the 6 needed lineitem columns,
    # not the full 16-column table
    read = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert read.count(":") - 1 <= 6
    assert "l_comment" not in read


def test_dim_join_broadcasts(plans):
    p = plans("q_join_broadcast")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_multiway_join_all_dims_broadcast(plans):
    """Q5-shape 5-way join: every dim side broadcasts; the only shuffle
    is the final aggregation exchange."""
    p = plans("q_join_multiway")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_agg_has_mapside_combine(plans):
    """Partial HashAggregate before the exchange, final after — the
    shuffle carries one row per group per task, not the fact table."""
    p = plans("q_agg_pricing")
    lines = p.splitlines()
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    ex_idx = [i for i, l in enumerate(lines) if "Exchange" in l and "Broadcast" not in l]
    assert len(agg_idx) >= 2 and ex_idx, "expected partial+final aggregate around a shuffle"


def test_single_pass_text_ops_never_shuffle(plans, monkeypatch):
    """r15: text_quality gained an adaptive scan-spread (guide §2.5 —
    measured −0.09 s sf0.1 / −0.4 s sf1); its ONLY allowed exchange is
    that round-robin spread, and with the spread disabled every
    single-pass text op must still compile shuffle-free."""
    import re

    p = plans("text_quality")
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchanges <= 1 and (n_exchanges == 0 or "RoundRobinPartitioning" in p), (
        f"text_quality may only carry the round-robin spread exchange:\n{p}"
    )
    monkeypatch.setenv("SPARK_GRAFT_NO_SPREAD", "1")
    for q in ("text_quality", "text_tokens", "text_lang_id", "text_fingerprint"):
        p = plans(q)
        assert "Exchange" not in p, f"{q} should be shuffle-free, got:\n{p}"


def test_topn_uses_limit_not_global_sort(plans):
    """sort+limit compiles to TakeOrderedAndProject — per-partition
    top-n then merge on the driver, never a full Exchange+Sort."""
    p = plans("q_topn")
    assert "TakeOrderedAndProject" in p


def test_ann_bruteforce_broadcasts_queries_and_prunes_topk(plans):
    """The query-vector side broadcasts (one pass over embeddings) and
    WindowGroupLimit prunes to per-partition top-k BEFORE the shuffle,
    so the exchange carries k rows per query per partition, not the
    full score matrix."""
    p = plans("ann_bruteforce")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    lines = p.splitlines()
    wgl = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l]
    ex = [i for i, l in enumerate(lines) if "Exchange" in l and "Broadcast" not in l]
    assert wgl and ex and min(ex) < max(wgl), "expected partial WindowGroupLimit below the exchange"


def test_dedup_exact_single_shuffle_no_join(plans):
    """Exact dedup is one hash-partition shuffle + per-partition sort —
    no join anywhere in the plan."""
    p = plans("dedup_exact")
    assert "Join" not in p
    assert p.count("Exchange") <= 2  # union input may add an AQE coalesce


def test_multiway_join_correct_on_smj_path(spark, sf_smoke):
    """At 100 TB the fact-side joins stop broadcasting; force the
    sort-merge path (autoBroadcastJoinThreshold=-1) and require
    identical results — the plan degrades gracefully, the answer
    doesn't change."""
    from rabbit_data_pipeline_spark.queries import registry

    reg = registry()
    want = sorted(map(tuple, reg["q_join_multiway"].builder(spark, sf_smoke).collect()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = reg["q_join_multiway"].builder(spark, sf_smoke)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "SortMergeJoin" in buf.getvalue()  # genuinely on the SMJ path
        got = sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want


def test_sync_incremental_pushes_watermark_filter(spark, sf_smoke):
    """The incremental-sync scalar watermark becomes a pushed parquet
    filter on the source scan — at 100 TB this is the difference
    between reading one day and reading the lake."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.operators.sync import sync_incremental
    from rabbit_data_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_smoke, ("orders",))["orders"]
    dst = t.filter(F.col("o_orderdate") < "1996-01-01")
    inc = sync_incremental(t, dst, updated_at="o_orderdate")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        inc.explain("formatted")
    p = buf.getvalue()
    assert "PushedFilters" in p and "o_orderdate" in p.split("PushedFilters")[1].split("]")[0]


def test_asof_join_is_union_window_single_shuffle(plans):
    """The as-of join must plan as union + window (linear), never as a
    join with a range condition (quadratic per key). Exactly two
    exchanges: the query's left-side pre-aggregation and the window;
    the operator itself contributes one."""
    p = plans("q_asof_join")
    assert "Window" in p and "Union" in p
    assert p.count("Exchange (") == 2
    assert "Join" not in p  # no join operator anywhere
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_interval_join_is_hash_join_with_range_residual(plans):
    """Range joins must keep the equi-key as the join key (hash join)
    with the time range as a residual predicate — not degrade to a
    nested-loop over the cross product."""
    p = plans("q_interval_join")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Join user_id" in p or "hashpartitioning(user_id" in p or "BroadcastHashJoin" in p


def test_scd2_broadcast_delta_no_dim_shuffle(plans):
    """With a broadcast delta the dimension must not shuffle: every
    join against the dim is a BroadcastHashJoin."""
    p = plans("sync_scd2")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_sync_chunked_broadcasts_watermark_and_delta(spark, sf_smoke):
    """SyncOtherMysql-parity sync: the 1-row max-watermark crosses in
    as a broadcast (never a shuffle of the source), and the delta
    upserts via broadcast join when flagged — the big source table
    is scanned once and never exchanged."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.operators.sync import sync_chunked
    from rabbit_data_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_smoke, ("orders",))["orders"]
    dst = t.filter(F.col("o_orderdate") < "1996-01-01")
    out = sync_chunked(t, dst, keys=["o_orderkey"], updated_at="o_orderdate", broadcast_source=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p  # delta-keyed anti join
    # watermark filter pushes into the source parquet scan
    assert "PushedFilters" in p and "o_orderdate" in p.split("PushedFilters")[1].split("]")[0]


def test_decontaminate_broadcasts_benchmark(plans):
    """The benchmark gram set broadcasts; the corpus gram explosion
    never shuffles before the join — at 100 TB the corpus moves only
    into the post-join per-doc aggregation."""
    p = plans("text_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_mix_is_pure_pushed_filter(plans):
    """Mixture sampling is filter-only: no exchange, no join, and the
    modulo predicate evaluates in the scan stage."""
    p = plans("text_mix")
    assert "Exchange" not in p
    assert "Join" not in p


def test_pack_single_bucket_exchange(plans):
    """Sequence packing shuffles once on the bucket key; the in-bucket
    cumulative window must not add a second exchange or a global sort."""
    p = plans("text_pack")
    assert p.count("Exchange (") == 1
    assert "Join" not in p


def test_plan_audit_metrics(spark, sf_smoke):
    """The audit() utility reports structured plan-quality metrics the
    rest of this file asserts by string-matching — spot-check it on
    queries with known shapes."""
    from rabbit_data_pipeline_spark.functions.planaudit import audit

    reg = registry()
    a = audit(reg["q_join_broadcast"].builder(spark, sf_smoke))
    assert a.broadcast_hash_joins >= 1
    assert a.cartesian_products == 0 and a.nested_loop_joins == 0
    assert a.scans_with_pushed_filters >= 1
    assert a.partial_aggregates >= 1  # map-side combine present

    a2 = audit(reg["q_filter_project"].builder(spark, sf_smoke))
    assert a2.exchanges == 0  # pure scan→filter→project
    assert a2.scans_with_pushed_filters == a2.scans == 1
    assert not [w for w in a2.warnings if "without pushed" in w]

    # dedup_minhash's Arrow kernel hides behind its localCheckpoint cut,
    # so use the multimodal pipeline (mapInPandas feature extraction)
    # to exercise the Python-eval detection
    a3 = audit(reg["multimodal_ann"].builder(spark, sf_smoke))
    assert a3.python_evals >= 1
    assert any("Python eval" in w for w in a3.warnings)


def test_ann_range_is_pure_broadcast_filter(plans):
    """Range search never shuffles: broadcast queries, one scored
    corpus pass, filter — no window/rank exchange at all."""
    p = plans("ann_range")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert not any("Exchange hashpartitioning" in l for l in p.splitlines())
    assert "Window" not in p


def test_pq_encode_is_shuffle_free_map_pass(plans):
    """The codebook folds into the plan as literals: encoding is a
    single projection over the scan — no exchange, no join, no
    Python."""
    p = plans("emb_pq_codes")
    assert "Exchange" not in p and "Join" not in p
    assert "EvalPython" not in p


def test_ann_pq_broadcasts_queries(plans):
    """ADC serving: query luts broadcast; the only non-broadcast
    exchange is the per-query top-k rank window."""
    p = plans("ann_pq")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 1


def test_gopher_and_tfidf_no_python_no_cartesian(plans):
    for q in ("text_gopher_quality", "text_tfidf"):
        p = plans(q)
        assert "EvalPython" not in p, f"{q} must stay JVM-side"
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ann_ivfpq_single_map_pass_and_probe_join(plans):
    """IVF-PQ: corpus side is one literal-folded projection (cell +
    codes, no Python, no join below it); query luts broadcast; the
    only non-broadcast exchange is the top-k rank window."""
    p = plans("ann_ivfpq")
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 1


def test_dedup_lines_broadcast_anti_join(plans):
    """Line dedup: the heavy-line side broadcasts into the anti-join
    (boilerplate is rare among distinct lines); the only hash
    exchanges are the line-count agg and the doc reassembly."""
    p = plans("text_dedup_lines")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "EvalPython" not in p


def test_url_canonicalizer_shuffles_once(plans):
    """Canonicalization is a pure projection; the only exchange is the
    canonical-key survivor agg (with its map-side partial)."""
    p = plans("text_url_dedup")
    hash_ex = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hash_ex) <= 1
    assert "Join" not in p and "EvalPython" not in p


def test_moment_queries_combine_map_side(plans):
    """The exact-decimal moment aggregates must partial-aggregate
    before their one exchange (that is the whole point — five sums
    travel, not the rows)."""
    for q in ("q_stats_moments", "q_regression", "q_histogram"):
        p = plans(q)
        tree = [l for l in p.splitlines() if "+-" in l or l.strip().startswith("* ")]
        agg_idx = [i for i, l in enumerate(tree) if "HashAggregate" in l]
        ex_idx = [i for i, l in enumerate(tree) if "Exchange" in l and "Broadcast" not in l]
        assert len(agg_idx) >= 2 and len(ex_idx) == 1, (q, tree)
        # tree is printed top-down: final agg ABOVE the exchange, the
        # map-side partial BELOW it
        assert min(agg_idx) < ex_idx[0] < max(agg_idx), f"{q}: no partial aggregate below the exchange"


def test_rp_projection_is_shuffle_free(plans):
    p = plans("emb_rp_project")
    assert "Exchange" not in p and "Join" not in p and "EvalPython" not in p


def test_c4_clean_is_shuffle_free_filter(plans):
    """C4 cleaning is pure filter/transform HOFs — no shuffle, no
    Python, no join; the page-level drop is a scan-side Filter."""
    p = plans("text_c4_clean")
    assert "Exchange" not in p and "Join" not in p and "EvalPython" not in p
    assert "Filter" in p


def test_semantic_dedup_literal_assignment_no_cartesian(plans):
    """SemDeDup's cell assignment is literal-folded (no join, no
    Python); the only joins are the cell-keyed self-join and the
    survivor anti-join — never a cartesian product."""
    p = plans("dedup_semantic")
    assert "CartesianProduct" not in p and "EvalPython" not in p


def test_split_assign_is_shuffle_free(plans):
    """Split assignment is a pure md5-threshold map — no shuffle, no
    Python, no join."""
    p = plans("text_split")
    assert "Exchange" not in p and "Join" not in p and "EvalPython" not in p


def test_domain_filter_broadcasts_blocklist(plans):
    """The blocklist joins as a BROADCAST on the exploded suffix key —
    one hash join, never a per-pattern regex scan or cartesian. (The
    final survivor anti-join on doc_id plans as SMJ pre-AQE and
    converts to broadcast at runtime when the blocked set is small —
    that one is allowed.)"""
    p = plans("text_domain_filter")
    lines = p.splitlines()
    bhj = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l and "Inner" in l]
    assert bhj, "blocklist suffix join must be a broadcast hash join"
    assert "CartesianProduct" not in p


def test_incremental_dedup_broadcasts_batch_not_index(plans):
    """Batch-vs-index dedup: the NEW batch broadcasts, so the index
    side joins with no shuffle of its own rows (no SortMergeJoin of
    the band keys)."""
    p = plans("dedup_incremental")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_funnel_single_exchange_no_self_join(plans):
    """The 3-step funnel must resolve via chained windows over ONE
    user_id exchange — never the naive 3-way event self-join (which
    would shuffle the fact table three times)."""
    p = plans("q_funnel")
    assert "Join" not in p
    assert p.count("Exchange (") == 1


def test_retention_two_exchanges_no_join(plans):
    """Cohort retention: the cohort window's user_id exchange plus the
    (cohort, offset) aggregate exchange — and nothing else."""
    p = plans("q_retention")
    assert "Join" not in p
    assert p.count("Exchange (") == 2


def test_passage_removal_no_python_no_cartesian(plans):
    """Repeated-passage removal is pure HOF/explode SQL: no Python in
    the plan, the heavy-gram side broadcasts, never a cartesian."""
    p = plans("text_remove_passages")
    assert "EvalPython" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_smoke):
    """100 TB contract: when a selective dim filter feeds a non-broadcast
    join, Catalyst injects a runtime BLOOM filter on the fact side —
    the fact scan drops most rows BEFORE the shuffle (row-level
    counterpart of dynamic partition pruning). Local data is below the
    default 10 GB application-side threshold, so the test pins the
    thresholds the way a cluster config would; the contract is that
    the injection fires and the fact filter carries might_contain."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.session import load_tables

    t = load_tables(spark, sf_smoke, ("lineitem", "orders"))
    conf = spark.conf
    pinned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: conf.get(k) for k in pinned}
    try:
        for k, v in pinned.items():
            conf.set(k, v)
        o = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        j = t["lineitem"].join(o, t["lineitem"].l_orderkey == o.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "might_contain" in p, "runtime bloom filter was not injected on the fact side"
        assert "bloom_filter_agg" in p
        # the injected probe must sit on the lineitem (application) side
        probe_line = next(line for line in p.splitlines() if "might_contain" in line)
        assert "l_orderkey" in probe_line
    finally:
        for k, v in old.items():
            conf.set(k, v)


def test_ts_similarity_one_exchange_takeordered(plans):
    """Pattern similarity search: one user_id window exchange, global
    top-10 via TakeOrderedAndProject — never a full sort of all
    window scores."""
    p = plans("q_ts_similarity")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange (") == 1
    assert "Join" not in p


def test_window_rank_prunes_with_window_group_limit(plans):
    """Top-3-per-customer must prune to per-partition top-k during the
    window sort (WindowGroupLimit), not rank every order first."""
    p = plans("q_window_rank")
    assert "WindowGroupLimit" in p


def test_partitioned_read_prunes_directories(plans):
    """The year filter on the partitioned staging table must land in
    PartitionFilters (directory pruning) — not as a row-level filter
    over a full scan."""
    p = plans("layout_partitioned_read")
    pf = next((line for line in p.splitlines() if "PartitionFilters" in line), "")
    assert "order_year" in pf, f"expected order_year in PartitionFilters, got: {pf!r}"


def test_bucketed_join_skips_the_join_shuffle(plans):
    """Co-bucketed orders⋈lineitem must not exchange on the join key —
    the only shuffle is the final small aggregation."""
    p = plans("layout_bucketed_join")
    assert "hashpartitioning(o_orderkey" not in p
    assert "hashpartitioning(l_orderkey" not in p


def test_waiting_supplier_never_broadcasts_the_fact(plans):
    """r15 (guide §3.1): column pruning shrank lineitem's size estimate
    (3 of 16 columns) under the broadcast threshold and Catalyst
    BROADCAST THE FACT TABLE as the build side of the order_stats
    probe join. The optimized shape: the probe join is a shuffled-hash
    join building on the per-order aggregate, both lineitem consumers
    share one canonical scan+filter+exchange subtree (runtime
    ReusedExchange — lineitem scanned once), and the only broadcasts
    are the genuine dims (orders, supplier)."""
    import re

    p = plans("q_waiting_supplier")
    assert "ShuffledHashJoin" in p
    # exactly the two dim broadcasts — a third would be the fact again
    assert len(re.findall(r"^\(\d+\) BroadcastExchange", p, re.M)) == 2
    # both lineitem subtrees carry the same pushed isnotnull triple so
    # they canonicalize identically for exchange reuse
    pushed = [
        line.split("[", 1)[1]
        for line in p.splitlines()
        if "PushedFilters" in line and "l_suppkey" in line
    ]
    assert len(pushed) == 2 and pushed[0] == pushed[1]


def test_big_orders_single_lineitem_scan_no_fact_broadcast(plans):
    """r15: Q18's outer SUM provably equals the HAVING subquery's
    per-order lsum (the joins are 1:1 per lineitem row), so the
    restructured query carries the aggregate through instead of
    re-scanning lineitem — which Catalyst used to BROADCAST (column
    pruning put the 2-column fact under the size threshold). Pin: one
    lineitem scan, and no broadcast subtree contains the fact."""
    import re

    p = plans("q_big_orders")
    assert p.count("lineitem.parquet") == 1
    # only one aggregation exchange — the final re-aggregation is gone
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1


def test_join_multiway_shj_never_broadcasts_lineitem(plans):
    """r15: TPC-H Q5's orderkey join is a shuffled-hash join building
    on the (date-filtered) customer⋈orders side. Before the hint,
    column pruning put lineitem's size estimate under the broadcast
    threshold at the small scale points and Catalyst BROADCAST THE
    FACT (plans/r15/q_join_multiway_before.txt node 11)."""
    import re

    p = plans("q_join_multiway")
    assert "ShuffledHashJoin" in p
    scans = re.findall(r"Location: InMemoryFileIndex \[[^\]]*?(\w+)\.parquet\]", p)
    # lineitem is scanned exactly once, and the SHJ build side is Left
    assert scans.count("lineitem") == 1
    assert "ShuffledHashJoin Inner BuildLeft" in p
    # the broadcasts are dims only: customer, supplier, nation, region
    assert len(re.findall(r"^\(\d+\) BroadcastExchange", p, re.M)) <= 4


def test_ship_priority_shj_no_fact_broadcast_no_agg_exchange(plans):
    """r15: the lineitem⋈(customer⋈orders) join is a shuffled-hash join
    keyed on orderkey with the build on the cust-orders side (Catalyst
    used to broadcast the pruned FACT), and the join's output
    partitioning satisfies the groupBy — no aggregation exchange."""
    import re

    p = plans("q_ship_priority")
    assert "ShuffledHashJoin" in p
    # the only broadcast is the customer dim
    bx = len(re.findall(r"^\(\d+\) BroadcastExchange", p, re.M))
    assert bx == 1
    # two shuffles: the two SHJ inputs; none for the aggregation
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 2
