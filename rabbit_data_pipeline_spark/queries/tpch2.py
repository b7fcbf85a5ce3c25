"""Extended TPC-H-shaped relational surface (SURVEY.md §2 Q21–Q29).

The reference's Pdo source/sink runs arbitrary SQL against the
operational store (reference src/Sources/Pdo.php:70-101,
src/Sinks/Pdo.php:60-118); this module widens the query surface to the
remaining classic TPC-H access patterns expressible over the driver
schema: correlated EXISTS with an inequality, bi-nation volume
matrices, conditional market-share ratios, count-of-counts
distributions, scalar-subquery maxima and OR-of-ANDs predicate
pushdown.

Scale rules are the same as queries/tpch.py: dimensions broadcast,
fact-fact joins shuffle on the join key, every literal predicate
reaches the parquet scan, money sums use the integer micro-unit exact
path (functions/exact.py) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rabbit_data_pipeline_spark.functions.exact import lavg, lsum, sql_lavg, sql_lsum
from rabbit_data_pipeline_spark.queries import register
from rabbit_data_pipeline_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# --- Q21: shipping priority (TPC-H Q3) --------------------------------------
@register(
    "q_ship_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue. The mktsegment
    filter reduces customer before its join is broadcast; sort+limit
    plans TakeOrderedAndProject (no global sort); the orderkey tiebreak
    keeps the limit deterministic.

    r15 (guide §3.1): Catalyst used to BROADCAST THE FILTERED FACT —
    column pruning put lineitem's size estimate under the threshold, so
    the big side became a multi-million-row hashed relation built per
    run. The SHUFFLE_HASH hint on the customer⋈orders side keys both
    sides on orderkey with the build on the (4x smaller) cust-orders
    side, and the join's output partitioning then satisfies the
    groupBy(l_orderkey, …) distribution — the aggregation exchange
    disappears (plan: 2 exchanges total, both pruned; measured sf0.1
    0.70→0.50 s, sf1 2.43→0.81 s, min-of-6 idle). At 100 TB the same
    plan holds: never broadcast the fact, build on the filtered
    dim-side join."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust_orders = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1997-03-15")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > "1997-03-15")
        .join(cust_orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q22: order-priority checking (TPC-H Q4: correlated EXISTS) --------------
@register(
    "q_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality across the
    tables (shipped after its order date; the driver schema has no
    commit/receipt dates — reference parity is the EXISTS decorrelation,
    not the date pair).

    r15 (guide §3.1, §2.3): the old left_semi BROADCAST the filtered
    FACT — column pruning put lineitem's (l_orderkey, l_shipdate)
    estimate under the threshold, so the build side was every lineitem
    row (plan evidence: plans/r15 sweep; same hazard class as Q3/Q5/
    Q18/Q21). EXISTS(shipdate > orderdate) ≡ max(shipdate) per order >
    orderdate, so the query now carries a per-orderkey MAX through:
    partial aggregation collapses the shuffle ~4:1 (guide §2.3
    "aggregate before you shuffle") and the join's build side becomes
    the 3-month filtered orders slice — a true dim-sized broadcast
    that degrades to a key-partitioned join at scale, never a fact
    broadcast. Results identical (oracle hash green)."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    last_ship = t["lineitem"].groupBy("l_orderkey").agg(F.max("l_shipdate").alias("max_ship"))
    return (
        t["orders"]
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
        .join(last_ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q23: bi-nation volume (TPC-H Q7) ----------------------------------------
@register(
    "q_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_lsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations by year. The two
    nation joins broadcast two DIFFERENT 25-row aliases; the OR-pair
    predicate prunes after both are attached. lineitem⋈orders is the
    only real shuffle."""
    t = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- Q24: market share (TPC-H Q8: ratio of conditional aggregates) -----------
@register(
    "q_market_share",
    oracle=f"""
    SELECT o_year,
           ({sql_lsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")})
             / ({sql_lsum('volume')}) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = (
        SELECT MIN(p_type) FROM part)
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue for a part
    type, per year — a ratio of two conditional sums in a single
    aggregate pass (no second scan, no join back). The part-type
    scalar subquery stays IN the plan: the 1-row min(p_type) aggregate
    is broadcast-joined against part, so the whole query is one
    Catalyst plan with zero driver-side actions (a .collect() here
    would serialize a second Spark job per run and stops AQE seeing
    the dependency)."""
    t = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region")
    min_ptype = t["part"].agg(F.min("p_type").alias("__min_ptype"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_volume = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        t["part"]
        .join(F.broadcast(min_ptype), F.col("p_type") == F.col("__min_ptype"))
        .drop("__min_ptype")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(t["region"]), F.col("n2_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((lsum(nat_volume) / lsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q25: returned-item reporting (TPC-H Q10) --------------------------------
@register(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name, c.c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns. The
    returnflag filter pushes to the lineitem scan; customer attributes
    ride through the group key (same shuffle as the join).

    r15 (guide §3.1): Catalyst BROADCAST the returnflag-filtered FACT
    (~25% of lineitem ROWS — pruning put its estimate under the
    threshold). SHUFFLE_HASH on the date-filtered customer⋈orders side
    keys the join on orderkey with the build on the 6-month cust-orders
    slice; lineitem is probed, never broadcast — same shape as Q3/Q5."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01"))
        .hint("SHUFFLE_HASH")
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- Q26: customer order-count distribution (TPC-H Q13) ----------------------
@register(
    "q_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: count-of-counts. Two aggregations: the first shuffles
    on custkey (shared with the join), the second on the tiny c_count
    domain — AQE coalesces it to a handful of partitions."""
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q27: top supplier(s) by revenue (TPC-H Q15) -----------------------------
@register(
    "q_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_lsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the max quarterly revenue. The
    MAX scalar subquery becomes an unpartitioned max window over the
    tiny aggregated set (|suppliers| rows) — no second scan of
    lineitem, no join back."""
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    best = rev.withColumn("__max", F.max("total_revenue").over(Window.partitionBy())).filter(
        F.col("total_revenue") == F.col("__max")
    )
    return (
        t["supplier"]
        .join(best, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q28: large-volume orders (TPC-H Q18) ------------------------------------
@register(
    "q_big_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_lsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)) / 1000000.0 > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold.

    r15 restructure (guide §1.2 "don't compute things you throw away" +
    §3.1): the HAVING subquery already computes the EXACT output sum —
    the oracle's outer SUM re-aggregates lineitem over a join that is
    1:1 per lineitem row (orderkey is the orders PK, custkey the
    customer PK), so it provably equals the subquery's per-order lsum.
    The old shape semi-joined on the key set and then re-scanned + re-
    aggregated lineitem, and because column pruning put the 2-column
    fact under the broadcast size estimate, Catalyst BROADCAST LINEITEM
    (a 6M-row hashed relation at sf1) as the build side of that final
    join. Now the per-order aggregate (tiny after `> 250`) is carried
    through: lineitem is scanned ONCE, aggregated on l_orderkey, and
    the filtered result joins orders⋈customer — the join strategy is
    left to AQE, which sees the REAL (few-row) size at runtime and
    broadcasts the aggregate, the scale-correct choice (at 100 TB the
    same plan degrades gracefully to a key-partitioned join instead of
    ever broadcasting the fact). Oracle-identical: same lsum decimal
    floor, one output row per qualifying order."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(lsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- Q29: OR-of-ANDs predicate revenue (TPC-H Q19) ---------------------------
@register(
    "q_or_predicates",
    oracle=f"""
    SELECT {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-table predicate. Catalyst derives
    the cross-branch residuals (brand IN (...), quantity <= 30) and
    pushes them into each scan even though the full OR straddles the
    join; part stays broadcast."""
    t = _t(spark, sf_dir, "lineitem", "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#11") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#22") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#33") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(lsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --- Q33: full cube over two dims --------------------------------------------
@register(
    "q_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, {sql_lsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = all 2^k grouping sets in ONE pass — Spark expands the
    grouping sets map-side (Expand operator) so the fact is still
    scanned once; the shuffle carries each row 2^k times, which is the
    intrinsic cost of the answer, not a plan artifact."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), lsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "revenue",
        )
    )


# --- Q34: double-correlated EXISTS / NOT EXISTS (TPC-H Q21 shape) ------------
@register(
    "q_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: lineitems whose supplier was the LAST to ship
    in a multi-supplier order (no commit/receipt dates in the driver
    schema, so "late" = shipped after every other supplier). The two
    correlated subqueries decorrelate into ONE aggregation over
    lineitem: per (orderkey, suppkey) the supplier's max shipdate,
    then per orderkey the top-2 supplier maxima + supplier count.
    other_max(row) = top1 if it belongs to a different supplier else
    top2 — so EXISTS-other ⇔ n_supp ≥ 2 and NOT-EXISTS-later ⇔
    other_max <= own shipdate. Everything shuffles on l_orderkey (the
    same key as the orders join); no self-join of the fact against
    itself.

    The explicit repartition(l_orderkey) exploits subset clustering:
    hashpartitioning(orderkey) satisfies the (orderkey, suppkey)
    groupBy's ClusteredDistribution AND the window's orderkey
    partitioning, so ONE exchange serves the aggregate, the top-2
    window, and the stats rollup (measured 28% faster at sf0.1 than
    letting each stage pick its own shuffle key).

    r15 (guide §3.1 "estimates are often badly wrong" + §2.4): the
    probe join `l ⋈ order_stats` used to let Catalyst pick the
    strategy, and column pruning shrank lineitem's size ESTIMATE
    (3 of 16 columns of the file size) under the broadcast threshold —
    so Spark BROADCAST THE FACT TABLE (BuildLeft over every lineitem
    row: a 6M-row hashed relation rebuilt per run at sf1, the round's
    single worst join decision, with multi-second GC spikes to match).
    Now the probe side is the SAME repartition(l_orderkey) subtree the
    aggregate consumes — physical planning turns it into one
    ReusedExchange (lineitem is scanned and shuffled ONCE) — and the
    SHUFFLE_HASH hint on order_stats forces a shuffled-hash join whose
    build side is the per-order aggregate (strictly fewer rows than
    lineitem, ~40 B/row, bounded per partition by the deployer's
    shuffle width), both sides already co-partitioned on orderkey so
    the join adds ZERO exchanges. At 100 TB the same shape holds:
    never broadcast the fact, build on the aggregated side."""
    t = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    # The explicit isnotnull triple mirrors exactly the predicates the
    # optimizer infers on the probe side from the join/filter chain —
    # with it on the SHARED base, both consumers canonicalize to the
    # same scan+filter+exchange subtree and physical planning emits one
    # ReusedExchange (lineitem scanned and shuffled ONCE; r16 re-check:
    # dropping l_shipdate from the triple loses the reuse — 1
    # ReusedExchange -> 0, lineitem shuffled twice — so it stays).
    # Null JOIN KEYS could never reach the output (they fail every
    # join). The l_shipdate member is a SCHEMA ASSUMPTION, not algebra
    # (VERDICT r15 #3): on data with an all-null-shipdate (orderkey,
    # suppkey) group, this filter removes the group before the
    # aggregate so sibling suppliers see a smaller n_supp — and the
    # decorrelation itself already diverges from the EXISTS oracle
    # there (`other_max <= l_shipdate` drops null-shipdate probe rows
    # the oracle would count). The driver schema ships l_shipdate
    # NOT NULL; tests/test_advice_fixes.py::
    # test_waiting_supplier_no_null_shipdate_assumption fails loudly
    # if that ever changes.
    l = (
        t["lineitem"]
        .filter(
            F.col("l_orderkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
            & F.col("l_shipdate").isNotNull()
        )
        .repartition(F.col("l_orderkey"))
    )
    per_supp = (
        l.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey").orderBy(F.col("smax").desc(), F.col("l_suppkey"))
    ranked = per_supp.select(
        F.col("l_orderkey").alias("r_orderkey"),
        "l_suppkey",
        "smax",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_orderkey")).alias("n_supp"),
    ).filter(F.col("rn") <= 2)
    order_stats = (
        ranked.groupBy("r_orderkey", "n_supp")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("smax"))).alias("smax1"),
            F.max(F.when(F.col("rn") == 1, F.col("l_suppkey"))).alias("sk1"),
            F.max(F.when(F.col("rn") == 2, F.col("smax"))).alias("smax2"),
        )
    )
    other_max = F.when(F.col("sk1") != F.col("l_suppkey"), F.col("smax1")).otherwise(F.col("smax2"))
    return (
        l.join(order_stats.hint("shuffle_hash"), F.col("l_orderkey") == F.col("r_orderkey"))
        .join(t["orders"].filter(F.col("o_orderstatus") == "F"), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter((F.col("n_supp") >= 2) & (other_max <= F.col("l_shipdate")))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --- Q35: scalar-subquery threshold + anti join (TPC-H Q22 shape) ------------
@register(
    "q_idle_customers",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS numcust,
           {sql_lsum('c.c_acctbal')} AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT {sql_lavg('c_acctbal')} FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    (2001+) orders, by nation (no phone prefixes in the driver schema —
    the pattern parity is scalar-subquery threshold + anti join + agg).
    The 2001 date slice makes the anti join's positive path real in the
    driver data (every customer has some order, so the unsliced form was
    0-row/vacuous per the r5 verdict). The average is a 1-row aggregate
    cross-joined in (Spark broadcasts single-row relations), the anti
    join shuffles on custkey, nation broadcasts."""
    t = _t(spark, sf_dir, "customer", "orders", "nation")
    avg_bal = t["customer"].filter(F.col("c_acctbal") > 0).agg(lavg("c_acctbal").alias("__avg"))
    recent = t["orders"].filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"), lsum("c_acctbal").alias("totacctbal"))
        .orderBy("n_name")
    )


# --- Q36: argmin/argmax aggregates (min_by / max_by) -------------------------
@register(
    "q_argminmax",
    oracle="""
    SELECT o_orderpriority,
           ARG_MAX(o_orderkey, o_totalprice * 10000000 + o_orderkey) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice * 10000000 + o_orderkey) AS smallest_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax without a self-join or window: max_by/min_by aggregate in
    the same single-shuffle pass as the plain max. The ranking key
    folds the unique orderkey into the price (exact in double far below
    2^53) so ties can't make the two engines pick different winners."""
    t = _t(spark, sf_dir, "orders")
    rank_key = F.col("o_totalprice") * 10000000 + F.col("o_orderkey")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", rank_key).alias("biggest_order"),
            F.min_by("o_orderkey", rank_key).alias("smallest_order"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


# --- Q37: array aggregation / nested types -----------------------------------
@register(
    "q_array_agg",
    oracle="""
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',') AS priorities,
           LEN(LIST(DISTINCT o_orderpriority)) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type output: per status the sorted distinct priority
    list. collect_set is order-nondeterministic across partitions, so
    sort_array makes the value canonical — the rule for ANY collected
    array that leaves the engine (a raw collect_list hash-drifts
    between runs, let alone engines). The list is emitted joined into
    one string: the driver's canonicalizer pandas-sorts result columns
    and list cells are unhashable there, so arrays must leave the
    compare surface as scalars on BOTH engines."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
            F.size(F.collect_set("o_orderpriority")).alias("n_priorities"),
        )
    )


# --- Q38: set operations (INTERSECT / EXCEPT) --------------------------------
@register(
    "q_set_ops",
    oracle="""
    SELECT 'both' AS tag, o_custkey FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    UNION ALL
    SELECT 'only_1996' AS tag, o_custkey FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: customers active in both 1996 and 1997 vs
    only 1996. Spark plans both as aggregated semi/anti joins on the
    same key — the two branches share their shuffle key with the
    distinct, so AQE dedups the exchanges."""
    t = _t(spark, sf_dir, "orders")
    y96 = (
        t["orders"]
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .select("o_custkey").distinct()
    )
    y97 = (
        t["orders"]
        .filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .select("o_custkey").distinct()
    )
    both = y96.intersect(y97).select(F.lit("both").alias("tag"), "o_custkey")
    only96 = y96.exceptAll(y97).select(F.lit("only_1996").alias("tag"), "o_custkey")
    return both.unionByName(only96)


# --- Q40: regexp capture-group extraction ------------------------------------
@register(
    "q_regexp_extract",
    oracle="""
    SELECT c_name,
           CAST(REGEXP_EXTRACT(c_name, 'Customer#(0*)([0-9]+)', 2) AS BIGINT) AS cust_num,
           REGEXP_EXTRACT(p_name, '([a-z]+) ([a-z]+)', 2) AS part_noun
    FROM customer c JOIN part p ON c.c_custkey = p.p_partkey
    WHERE REGEXP_MATCHES(p_name, '^[a-z]+ [a-z]+$')
    """,
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction + regex predicate, in the Java∩RE2
    subset so both engines evaluate identically. The regex filter
    cannot push to parquet (no Filter API for it) but runs inside
    codegen right above the scan — the audit's 'unpushed scan' warning
    is expected and fine here."""
    t = _t(spark, sf_dir, "customer", "part")
    return (
        t["customer"]
        .join(t["part"], F.col("c_custkey") == F.col("p_partkey"))
        .filter(F.col("p_name").rlike("^[a-z]+ [a-z]+$"))
        .select(
            "c_name",
            F.regexp_extract("c_name", "Customer#(0*)([0-9]+)", 2).cast("bigint").alias("cust_num"),
            F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("part_noun"),
        )
    )


# --- Q41: distribution window functions (ntile / percent_rank / cume_dist) ---
@register(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: quartile bucketing and exact rank
    percentiles per priority class. All three share ONE window spec →
    one shuffle + one sort; the unique orderkey tiebreak makes ntile's
    bucket assignment engine-independent."""
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey", "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


# --- Q42: full outer join ----------------------------------------------------
@register(
    "q_join_full",
    oracle=f"""
    WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
         o AS (SELECT o_custkey, COUNT(*) AS n_orders,
                      {sql_lsum('o_totalprice')} AS spend
               FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name, o.n_orders, o.spend
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides (disjoint
    modulus filters guarantee them). Full outer can't broadcast —
    Spark plans SMJ/shuffled-hash on the key regardless of size, which
    is exactly the 100 TB behavior; the pre-aggregated order side
    keeps the shuffle small."""
    t = _t(spark, sf_dir, "customer", "orders")
    c = t["customer"].filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    o = (
        t["orders"]
        .filter(F.col("o_custkey") % 3 == 0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), lsum("o_totalprice").alias("spend"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
            "c_name", "n_orders", "spend",
        )
    )


# --- Q43: date part extraction + date arithmetic -----------------------------
@register(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(DAY(o_orderdate) AS INT) AS d,
           CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
    FROM orders
    WHERE o_custkey < 50
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction and interval arithmetic — every expression
    chosen for identical semantics in both engines (no dayofweek:
    Spark counts Sunday=1, DuckDB Sunday=0). Pure projection: no
    shuffle, pushdown intact."""
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_to_y2k"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        )
    )


# --- Q44: null-handling scalar functions -------------------------------------
@register(
    "q_null_funcs",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           GREATEST(c_acctbal, 0.0) AS floored_bal,
           LEAST(c_acctbal, 5000.0) AS capped_bal,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_missing
    FROM customer
    WHERE c_custkey < 200
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalars: nullif/coalesce/greatest/least — the
    cleanup vocabulary of every ingest pipeline, all codegen'd
    projections."""
    t = _t(spark, sf_dir, "customer")
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("segment_or_other"),
            F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("floored_bal"),
            F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("capped_bal"),
            F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_missing"),
        )
    )


# --- Q45: order-independent statistical moments ------------------------------
@register(
    "q_stats_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(sx AS DOUBLE) / n AS mean_qty,
           sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * (n - 1))) AS std_qty,
           (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_price
    FROM m
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q45: mean/stddev/correlation per group, ORDER-INDEPENDENTLY.
    Built-in corr()/stddev() accumulate doubles in partition order —
    nondeterministic across partitionings and engines, so no value
    hash could gate them. Instead the five moments (Σx, Σy, Σx², Σy²,
    Σxy) accumulate in EXACT decimal (map-side combinable — this is
    one partial-aggregated shuffle, the same cost as any sum), and the
    statistics derive in double arithmetic with the identical
    expression shape in both engines. Same trick scales to any
    moment-expressible statistic (skewness, regression slopes)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # data is exact at 2 dp (checked); 12,2 keeps DuckDB's decimal
    # multiply inside int64/int128 bounds where 18,6 overflowed
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    var_num_x = n * sxx - sx * sx
    var_num_y = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        F.sqrt(var_num_x / (n.cast("double") * (n - 1))).alias("std_qty"),
        ((n * sxy - sx * sy) / F.sqrt(var_num_x * var_num_y)).alias("corr_qty_price"),
    )


# --- Q46: numeric histogram ---------------------------------------------------
@register(
    "q_histogram",
    oracle="""
    SELECT l_returnflag,
           CAST(LEAST(FLOOR(l_extendedprice / 11000.0), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q46: fixed-width histogram (10 buckets over [0, 110k), top
    bucket clamps the tail) per return flag — the distribution probe
    behind every data-profiling pass. Bucket id is pure integer/double
    arithmetic with the identical spelling in both engines (built-in
    width_bucket exists in both but with different edge semantics —
    the explicit floor is the portable form). Map-side combinable:
    one shuffle carrying (flag, bucket) pairs."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    bucket = F.least(F.floor(F.col("l_extendedprice") / 11000.0), F.lit(9)).cast("long")
    return li.groupBy("l_returnflag", bucket.alias("bucket")).agg(F.count("*").alias("n"))


# --- Q47: least-squares regression via moments --------------------------------
@register(
    "q_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n
             AS intercept
    FROM m
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q47: per-group least-squares fit (price ~ quantity) — the same
    exact-decimal-moments trick as q_stats_moments makes regr_slope /
    regr_intercept order-independent and therefore value-hashable
    (the built-ins accumulate doubles in partition order). One
    map-side-combined shuffle."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


# --- Q54: explicit GROUPING SETS ----------------------------------------------
@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n, {sql_lsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q54: explicit GROUPING SETS — the general form ROLLUP/CUBE
    (Q17/Q33) special-case; a hand-picked set list compiles to ONE
    Expand + one aggregate exchange (not one scan per set). GROUPING()
    bits disambiguate real NULLs from subtotal rows — the only correct
    way to consume subtotal output."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    l.createOrReplaceTempView("rdps_gs_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
                 AS sum_qty
        FROM rdps_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


# --- Q55: NOT IN three-valued logic --------------------------------------------
@register(
    "q_not_in_nulls",
    oracle="""
    WITH probe(k) AS (VALUES (1), (2), (NULL)),
    t AS (SELECT c_custkey FROM customer WHERE c_custkey <= 20)
    SELECT
      (SELECT COUNT(*) FROM t WHERE c_custkey IN (SELECT k FROM probe)) AS n_in,
      (SELECT COUNT(*) FROM t WHERE c_custkey NOT IN (SELECT k FROM probe)) AS n_not_in,
      (SELECT COUNT(*) FROM t WHERE NOT EXISTS (
         SELECT 1 FROM probe WHERE probe.k = t.c_custkey)) AS n_not_exists
    """,
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q55: NOT IN vs NOT EXISTS under NULLs — the classic
    three-valued-logic trap: a NULL in the subquery makes `x NOT IN
    (...)` UNKNOWN for every x (n_not_in = 0), while NOT EXISTS
    ignores the NULL row (n_not_exists = 18). An engine that rewrites
    NOT IN to a plain anti-join silently returns wrong rows; Spark's
    null-aware anti-join and DuckDB must agree on all three counts."""
    c = _t(spark, sf_dir, "customer")["customer"]
    c.filter(F.col("c_custkey") <= 20).createOrReplaceTempView("rdps_nin_t")
    spark.createDataFrame([(1,), (2,), (None,)], "k int").createOrReplaceTempView("rdps_nin_probe")
    return spark.sql("""
        SELECT
          (SELECT COUNT(*) FROM rdps_nin_t WHERE c_custkey IN (SELECT k FROM rdps_nin_probe)) AS n_in,
          (SELECT COUNT(*) FROM rdps_nin_t WHERE c_custkey NOT IN (SELECT k FROM rdps_nin_probe)) AS n_not_in,
          (SELECT COUNT(*) FROM rdps_nin_t WHERE NOT EXISTS (
             SELECT 1 FROM rdps_nin_probe WHERE rdps_nin_probe.k = rdps_nin_t.c_custkey)) AS n_not_exists
    """)
