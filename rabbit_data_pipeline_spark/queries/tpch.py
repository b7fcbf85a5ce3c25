"""Relational query surface (SURVEY.md §2 Q1–Q20), TPC-H-flavored.

These exercise the engine's operator set — filter/project pushdown,
hash & broadcast joins, multi-key aggregation, windows, subqueries,
rollup, pivot — each with a DuckDB oracle. They are the queries the
reference's pipelines would compute after ingest (its Pdo source runs
arbitrary SQL: reference src/Sources/Pdo.php:70-101).

Scale notes per query are in the docstrings; the shared rules:
dimension tables broadcast (region/nation/supplier/part are tiny at
TPC-H ratios: sf×(5, 25, 10k, 200k) rows), fact joins shuffle on the
join key with AQE skew splitting, and every filter is a plain column
predicate so it reaches the parquet scan as a PushedFilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.functions.exact import lavg, lsum, sql_lavg, sql_lsum
from rabbit_data_pipeline_spark.queries import register
from rabbit_data_pipeline_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# --- Q1: scan→filter→project with pushdown ---------------------------------
@register(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan. All four predicates push to parquet; only 7
    of 11 columns are read (check ReadSchema in explain)."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double").alias("revenue"),
        )
    )


# --- Q2: multi-key aggregation (TPC-H Q1) — the flagship -------------------
@register(
    "q_agg_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_lsum('l_quantity')} AS sum_qty,
           {sql_lsum('l_extendedprice')} AS sum_base_price,
           {sql_lsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_lavg('l_quantity')} AS avg_qty,
           {sql_lavg('l_extendedprice')} AS avg_price,
           {sql_lavg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. One shuffle on a 6-group key; partial aggregation
    (map-side combine) does nearly all the work — scales linearly.
    Money/quantity sums use the integer micro-unit fast path (lsum:
    ~3x the decimal path's throughput, exact for <=6-decimal values;
    ANSI mode faults loudly if a total ever exceeds the long budget —
    switch those columns back to dsum at that point)."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum("l_quantity").alias("sum_qty"),
            lsum("l_extendedprice").alias("sum_base_price"),
            lsum(disc_price).alias("sum_disc_price"),
            lsum(charge).alias("sum_charge"),
            lavg("l_quantity").alias("avg_qty"),
            lavg("l_extendedprice").alias("avg_price"),
            lavg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3: inner join with broadcast dimension --------------------------------
@register(
    "q_join_broadcast",
    oracle=f"""
    SELECT n.n_name,
           {sql_lsum('c.c_acctbal')} AS total_acctbal,
           COUNT(*) AS num_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim join: nation (25 rows at any SF) is explicitly broadcast —
    no shuffle of the customer fact at all."""
    t = _t(spark, sf_dir, "customer", "nation")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(lsum("c_acctbal").alias("total_acctbal"), F.count("*").alias("num_customers"))
    )


# --- Q4: multi-way join + agg (TPC-H Q5 shape) ------------------------------
@register(
    "q_join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join. lineitem⋈orders shuffles on orderkey
    (the two big facts); supplier/nation/region/customer-side all end
    up broadcast or AQE-converted. The region filter prunes before the
    join — Catalyst pushes it through the join reorder.

    r15 (guide §3.1): SHUFFLE_HASH hint on the customer⋈orders side of
    the orderkey join — build on the date-filtered cust-orders side
    (strictly smaller than lineitem, bounded per partition by the
    deployer's shuffle width), skip both SMJ sorts. Same never-
    broadcast-the-fact shape as Q3/Q18/Q21; measured min-of-5 idle:
    sf0.1 1.154→0.919 s (−20%), sf1 1.320→1.135 s (−14%, med
    1.77→1.19)."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .hint("SHUFFLE_HASH")
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("n_name")
        .agg(lsum(revenue).alias("revenue"))
    )


# --- Q5: left outer join -----------------------------------------------------
@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS order_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero orders kept (COUNT of null key = 0)."""
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


# --- Q6: semi / anti joins ---------------------------------------------------
@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 2001 orders. The date slice makes the anti
    join's positive path real in the driver data (65 rows at sf0.001) —
    every customer has SOME order, so the unsliced form was 0-row/vacuous
    per the r5 verdict. The filter is applied before the join, so it
    pushes to the orders scan."""
    t = _t(spark, sf_dir, "customer", "orders")
    recent = t["orders"].filter(F.col("o_orderdate") >= "2001-01-01")
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# --- Q7: top-n ---------------------------------------------------------------
@register(
    "q_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+limit → Spark plans TakeOrderedAndProject: per-partition
    top-10 then merge, never a global sort. o_orderkey tiebreak keeps
    the result deterministic."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- Q8: distinct ------------------------------------------------------------
@register(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# --- Q9: union all -----------------------------------------------------------
@register(
    "q_union",
    oracle="""
    SELECT 'customer' AS side, c_name AS name, c_acctbal AS acctbal FROM customer
    WHERE c_acctbal > 9000
    UNION ALL
    SELECT 'supplier' AS side, s_name AS name, s_acctbal AS acctbal FROM supplier
    WHERE s_acctbal > 9000
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    c = (
        t["customer"]
        .filter(F.col("c_acctbal") > 9000)
        .select(F.lit("customer").alias("side"), F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"))
    )
    s = (
        t["supplier"]
        .filter(F.col("s_acctbal") > 9000)
        .select(F.lit("supplier").alias("side"), F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"))
    )
    return c.unionAll(s)


# --- Q10: window functions ---------------------------------------------------
@register(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Single shuffle on o_custkey; the
    rn<=3 filter applies during the window sort (rank-limit pushdown)."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    oracle=f"""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    WHERE user_id < 100
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.filter(F.col("user_id") < 100)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("running_value"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
    )


# --- Q11: scalar subquery (TPC-H Q17 shape) ---------------------------------
@register(
    "q_subquery_avg",
    oracle=f"""
    SELECT {sql_lsum('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, {sql_lavg('l_quantity')} AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_subquery_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-avg decorrelated into an aggregate+self-join — the
    plan Catalyst would produce for the subquery form, stated
    explicitly so the shuffle key (l_partkey) is shared by both sides."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    avg_by_part = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(lavg("l_quantity").alias("avg_qty"))
    return (
        l.join(avg_by_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((lsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --- Q12: CASE / conditional aggregation (TPC-H Q12 shape) -------------------
@register(
    "q_case_agg",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q13: time bucketing -----------------------------------------------------
@register(
    "q_time_bucket",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           {sql_lsum('o_totalprice')} AS month_revenue
    FROM orders GROUP BY 1
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(F.count("*").alias("n_orders"), lsum("o_totalprice").alias("month_revenue"))
    )


# --- Q14: string functions ---------------------------------------------------
@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 8)) AS name_prefix,
           CONCAT(p_brand, '#', p_type) AS brand_type,
           LENGTH(p_name) AS name_len
    FROM part
    WHERE p_name LIKE '%blue%' AND p_size BETWEEN 5 AND 15
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'%blue%' exists in the driver data at every sf (528 parts at
    sf0.1) — the r5 verdict flagged the previous '%green%' constant as
    selecting 0 rows, making the gate vacuous."""
    p = _t(spark, sf_dir, "part")["part"]
    return (
        p.filter(F.col("p_name").like("%blue%") & F.col("p_size").between(5, 15))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
            F.length("p_name").alias("name_len"),
        )
    )


# --- Q15: HAVING -------------------------------------------------------------
@register(
    "q_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {sql_lsum('o_totalprice')} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), lsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 5)
    )


# --- Q16: pivot --------------------------------------------------------------
@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — without it Spark must run an
    extra distinct job to discover pivot values (driver round-trip)."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        )
    )


# --- Q17: rollup -------------------------------------------------------------
@register(
    "q_rollup",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, {sql_lsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), lsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "revenue",
        )
    )


# --- Q18: JSON extraction ----------------------------------------------------
@register(
    "q_json_extract",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 90
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracts the key the driver data actually carries (props is always
    '{"k": N}') so the gate adjudicates real JSON extraction — the r5
    verdict flagged the previous '$.device' filter as 0-row/vacuous.
    'missing_key' keeps the absent-path→NULL semantics covered on both
    engines."""
    e = _t(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(k >= 90)
        .select(
            "event_id",
            "user_id",
            k.alias("k_value"),
            F.get_json_object("props", "$.missing").alias("missing_key"),
        )
    )


# --- Q20: percentiles --------------------------------------------------------
@register(
    "q_percentile",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (matches DuckDB quantile_cont interpolation).
    At 100 TB swap to approx_percentile — documented scale path; the
    exact form here is the correctness oracle."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").cast("double").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").cast("double").alias("p90"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


# --- Q6-shape: forecasting revenue change ------------------------------------
@register(
    "q_forecast_revenue",
    oracle=f"""
    SELECT {sql_lsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical
    predicate-pushdown + scalar-aggregate probe — every filter reaches
    the parquet scan (range on shipdate, between on discount, bound on
    quantity), the aggregate is one map-side-combined scalar, and the
    whole query is scan-rate-bound; discount microvalues are 2-decimal
    so the lsum fast path is exact."""
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(lsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )
