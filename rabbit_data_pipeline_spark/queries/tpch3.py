"""TPC-H completion pack (SURVEY.md §2 Q56–Q61).

Finishes the classic TPC-H access-pattern suite over the driver schema:
with tpch.py/tpch2.py this module brings the repo to all 22 TPC-H query
*shapes* (the reference's Pdo source/sink runs arbitrary SQL against the
operational store — reference src/Sources/Pdo.php:70-101 — so the full
suite is exactly the surface a reference user exercises).

The driver testdata has no ``partsupp`` table, so the four queries that
consume it (Q2, Q11, Q16, Q20) are re-grounded on ``lineitem`` as the
part↔supplier bridge — unit cost = l_extendedprice/l_quantity, supply
value = extended price sold, availqty = quantity shipped. Every access
pattern that makes each query hard is preserved: Q2's correlated
per-group minimum, Q9's profit expression over a 5-way join, Q11's
fraction-of-global-total threshold, Q14's conditional ratio, Q16's
distinct-count with a NOT-IN exclusion, Q20's nested quantity-threshold
semi-join chain.

Scale rules match queries/tpch.py: dimensions broadcast, fact-fact
joins shuffle once on the join key, literal predicates reach the
parquet scan, money/quantity sums take the integer micro-unit exact
path (functions/exact.py) so Spark and DuckDB agree bit-for-bit.
MIN/MAX of an IEEE division are order-independent (no accumulation),
so unit costs need no decimal detour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rabbit_data_pipeline_spark.functions.exact import lsum, sql_lsum
from rabbit_data_pipeline_spark.queries import register
from rabbit_data_pipeline_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names)


# --- Q56: minimum-cost supplier (TPC-H Q2) -----------------------------------
@register(
    "q_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), c2 AS (
      SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal, eu.n_name,
             cost.unit_cost,
             MIN(cost.unit_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM part p
      JOIN cost ON cost.l_partkey = p.p_partkey
      JOIN eu   ON eu.s_suppkey = cost.l_suppkey
      WHERE p.p_size = 15 AND p.p_name LIKE '%bolt%'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM c2 WHERE unit_cost = min_cost
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a size/name slice, the EUROPE
    supplier(s) offering the minimum unit cost. The correlated MIN
    subquery is a window over the post-aggregation (part,supplier)
    cost table — tiny relative to lineitem, so the re-exchange on
    p_partkey moves the small side. Part and the region-filtered
    supplier dim both broadcast; the one big shuffle is lineitem's
    (l_partkey,l_suppkey) aggregation. MIN of a division is
    order-independent, so no decimal detour is needed."""
    t = _t(spark, sf_dir, "part", "supplier", "nation", "region", "lineitem")
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t["part"].filter((F.col("p_size") == 15) & F.col("p_name").like("%bolt%"))
    c2 = (
        cost.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("min_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey")))
    )
    return c2.filter(F.col("unit_cost") == F.col("min_cost")).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
    )


# --- Q57: product-type profit (TPC-H Q9) -------------------------------------
_Q9_PROFIT = "l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * 0.4 * l.l_quantity"


@register(
    "q_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           {sql_lsum(_Q9_PROFIT)} AS profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for one
    product line. Supply cost is grounded as 40% of p_retailprice (no
    partsupp table in the driver schema); the hard part — the 5-way
    join with a compound profit expression aggregated by two derived
    keys — is intact. part/supplier/nation broadcast (the p_name
    filter shrinks part first); lineitem⋈orders is the one fact-fact
    shuffle, on l_orderkey. Profit is a product of doubles — both
    engines evaluate the same IEEE ops bit-for-bit — then micro-unit
    floor+sum keeps the aggregation order-independent."""
    t = _t(spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation")
    p = t["part"].filter(F.col("p_name").like("red%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.4 * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(lsum(profit).alias("profit"))
    )


# --- Q58: important stock (TPC-H Q11) ----------------------------------------
@register(
    "q_important_stock",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, {sql_lsum('l.l_extendedprice')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value FROM val
    WHERE value > (SELECT {sql_lsum('l.l_extendedprice')} * 0.001
                   FROM lineitem l
                   JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   JOIN nation n   ON n.n_nationkey = s.s_nationkey
                   WHERE n.n_name = 'NATION_7')
    """,
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supply value from one nation's
    suppliers exceeds a fraction of that nation's GLOBAL total. The
    scalar subquery becomes a window total over the grouped table —
    one lineitem scan, one aggregation shuffle (vs the spec's two
    scans). Supplier⋈nation broadcast. The threshold sum uses the
    same exact micro-unit path on both engines, so the `>` comparison
    can't flap on accumulation order."""
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    micro = F.floor(F.col("l_extendedprice") * 1_000_000 + F.lit(0.5)).cast("long")
    val = (
        t["lineitem"]
        .join(F.broadcast(nat_sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(micro).alias("__micro"))
    )
    # The global total is an empty-partition window over the grouped
    # table: referencing `val` twice (agg + cross join) would recompute
    # the lineitem scan, while the window costs one exchange of the
    # POST-AGG rows (bounded by |part|, not fact rows — safe where a
    # whole-fact single-partition window would not be). Sums stay
    # integer micro-units until one /1e6 each side of the comparison,
    # matching the oracle's accumulation exactly.
    total = F.sum("__micro").over(Window.partitionBy()) / F.lit(1e6)
    return (
        val.withColumn("value", F.col("__micro") / F.lit(1e6))
        .withColumn("total", total)
        .filter(F.col("value") > F.col("total") * 0.001)
        .select("l_partkey", "value")
    )


# --- Q59: promotion revenue share (TPC-H Q14) --------------------------------
@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT 100.0 * ({sql_lsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")})
           / ({sql_lsum('l.l_extendedprice * (1 - l.l_discount)')}) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: the share of one month's revenue from promotional
    parts — a conditional-sum ratio in a single aggregation. part
    broadcasts; the shipdate range reaches the parquet scan as a
    pushed filter so only one month of lineitem is read. The division
    of two exactly-accumulated sums is a single IEEE op, identical on
    both engines."""
    t = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01"))
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg((F.lit(100.0) * lsum(promo) / lsum(rev)).alias("promo_revenue"))
    )


# --- Q60: parts/supplier relationship count (TPC-H Q16) ----------------------
@register(
    "q_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (4, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    brand/type/size bucket, excluding flagged suppliers (grounded as
    negative account balance — the driver's supplier table has no
    comment column). The NOT IN is a broadcast left-anti join (the
    exclusion list is provably non-NULL here, so anti-join semantics
    match NOT IN exactly); the filtered part dim broadcasts; the one
    shuffle is the distinct-count aggregation, map-side-combined on
    (brand,type,size,suppkey) first by Spark's partial-distinct."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(4, 9, 14, 19, 23, 36, 45, 49)
    )
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(flagged), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q61: potential part promotion (TPC-H Q20) -------------------------------
@register(
    "q_potential_promotion",
    oracle=f"""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)) AS qty_micro
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    ), dominant AS (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, qty_micro / 1000000.0 AS qty,
               SUM(qty_micro) OVER (PARTITION BY l_partkey) / 1000000.0 AS part_total
        FROM shipped
      ) WHERE qty > 0.3 * part_total
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 1
      AND s.s_suppkey IN (SELECT DISTINCT l_suppkey FROM dominant)
    """,
)
def q_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who dominate the 1996
    supply of some 'small%' part (>30% of that part's shipped
    quantity — availqty has no ground truth without partsupp, so the
    excess-stock predicate is grounded on shipped share). The nested
    IN chain becomes: broadcast semi-join the part slice into
    lineitem, one (partkey,suppkey) aggregation shuffle, a window
    total over the small aggregate, then a broadcast semi-join into
    the supplier dim. Quantity sums are exact on both engines, so the
    0.3 threshold cannot flap."""
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    qty_micro = F.floor(F.col("l_quantity") * 1_000_000 + F.lit(0.5)).cast("long")
    shipped = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_micro).alias("qty_micro"))
    )
    # integer micro-units all the way to the comparison: the window
    # total and the per-supplier share convert with one /1e6 each, the
    # same two IEEE ops the oracle performs
    part_total = F.sum("qty_micro").over(Window.partitionBy("l_partkey")) / F.lit(1e6)
    dominant = (
        shipped.withColumn("part_total", part_total)
        .withColumn("qty", F.col("qty_micro") / F.lit(1e6))
        .filter(F.col("qty") > 0.3 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_regionkey") == 1)
        .join(F.broadcast(dominant), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# --- Q62: PageRank over the customer-supplier graph --------------------------
def _pagerank_oracle(iters: int = 6) -> str:
    """Unrolled-CTE twin of operators/graph.py pagerank — same integer
    nano-unit arithmetic, one CTE pair per iteration."""
    sql = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    pr0 AS (
      SELECT node,
             CAST(1000000000 // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS score
      FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (
      SELECT e.dst, CAST(SUM(p.score // d.deg) AS BIGINT) AS s
      FROM edges e JOIN pr{i - 1} p ON p.node = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst),
    pr{i} AS (
      SELECT n.node,
             CAST((SELECT (CAST(1000000000 AS BIGINT) * 15) // (100 * COUNT(*)) FROM nodes)
                  + (85 * COALESCE(c{i}.s, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS score
      FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.node)"""
    sql += f"\n    SELECT node, score / 1000000000.0 AS rank FROM pr{iters}"
    return sql


def _sym_edges(pairs: DataFrame, weight: str | None = None) -> DataFrame:
    """Symmetrize distinct (c, s) pairs into both edge directions INSIDE
    one subtree. r15 (guide §2.4 remove duplicate work): the old
    unionAll(project, swapped-project) made the optimizer plan the
    fact join + distinct ONCE PER BRANCH (alias pushdown renames the
    aggregate keys per branch, so the two exchanges stop canonicalizing
    equal and nothing reuses — measured as two ~700 ms serial scan
    stages per graph query at sf0.1). Exploding a 2-element struct
    array after the dedup runs the join and the distinct once; the edge
    multiset is identical (customer and supplier ids live in disjoint
    encodings, so the two directions can never collide)."""
    cols = [F.col("c"), F.col("s")]
    fwd = [cols[0].alias("src"), cols[1].alias("dst")]
    rev = [cols[1].alias("src"), cols[0].alias("dst")]
    if weight:
        fwd.append(F.col(weight).alias(weight))
        rev.append(F.col(weight).alias(weight))
    out_cols = ["e.src", "e.dst"] + (["e." + weight] if weight else [])
    return pairs.select(
        F.explode(F.array(F.struct(*fwd), F.struct(*rev))).alias("e")
    ).select(*out_cols)


@register("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q62: PageRank over the bipartite customer↔supplier graph the
    fact tables induce (distinct trading pairs from orders⋈lineitem,
    edges both directions) — entity importance via the canonical Spark
    iterative workload. Integer nano-unit arithmetic end to end
    (operators/graph.py pagerank) makes the six iterations bit-exact
    against the unrolled-CTE oracle: an iterative algorithm with a
    full value-hash gate, not a rows-only one."""
    from rabbit_data_pipeline_spark.operators.graph import pagerank

    t = _t(spark, sf_dir, "orders", "lineitem")
    # r15 guide §2.3 "narrower types": the loop used to run on STRING
    # node ids ('c123'/'s45'), so the setup distinct and every
    # per-iteration contribution shuffle carried strings. Nodes are now
    # a reversible long encoding (even = 2*custkey, odd = 2*suppkey+1)
    # — structure identical, integer rank arithmetic untouched — and
    # the original labels are restored by expression at the end, so the
    # output is byte-identical to the string-graph version (same
    # oracle). Measured: pairs-distinct setup 1.58 → 1.06 s at sf0.1.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = _sym_edges(pairs)
    # _sym_edges emits both directions, so every node has in-edges:
    # in_complete skips the per-round node left join (r15 §2.1).
    ranks = pagerank(edges, iters=6, in_complete=True)
    decode = F.when(F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node div 2"))).otherwise(
        F.concat(F.lit("s"), F.expr("(node - 1) div 2"))
    )
    return ranks.select(decode.alias("node"), "rank")


# --- Q63: BFS shortest paths over the same graph -----------------------------
def _bfs_oracle(hops: int = 8) -> str:
    """Unrolled min-propagation twin of operators/graph.py
    bfs_distances: relax the full distance vector ``hops`` times
    (≥ graph diameter), the frontier optimization reaches the same
    integer fixed point."""
    sql = """
    WITH pairs AS (
      SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    d0 AS (SELECT 's1' AS node, 0 AS dist)"""
    for i in range(1, hops + 1):
        sql += f""",
    d{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM d{i - 1} d JOIN edges e ON e.src = d.node
      ) GROUP BY node)"""
    sql += f"\n    SELECT node, CAST(dist AS INT) AS dist FROM d{hops}"
    return sql


@register("q_shortest_path", oracle=_bfs_oracle())
def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q63: BFS hop distances from supplier s1 across the
    customer↔supplier trading graph — the frontier-expansion iterative
    shape (every node enters a frontier once, O(edges) total work)
    with integer distances, so the converged result hashes exactly
    against the unrolled full-vector relaxation twin."""
    from rabbit_data_pipeline_spark.operators.graph import bfs_distances

    t = _t(spark, sf_dir, "orders", "lineitem")
    # r16 guide §2.3: the same reversible long node encoding q_pagerank
    # and q_kcore got in r15 (even = 2*custkey, odd = 2*suppkey+1) —
    # the setup distinct, every hop's frontier broadcast and the
    # distance vector carry longs instead of strings; labels restored
    # by expression at the end, so the output (and the string-graph
    # oracle) is unchanged. Source 's1' encodes to 2*1+1 = 3.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = _sym_edges(pairs)
    dist = bfs_distances(edges, [3], max_hops=8)
    decode = F.when(F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node div 2"))).otherwise(
        F.concat(F.lit("s"), F.expr("(node - 1) div 2"))
    )
    return dist.select(decode.alias("node"), "dist")


# --- Q64: triangle count on the co-supply graph -------------------------------
@register(
    "q_triangles",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q64: triangles in the supplier co-supply graph (edge = two
    suppliers ship the same part). The Spark side runs the
    degree-ordered O(m^1.5) algorithm (operators/graph.py
    triangle_count); the oracle counts via the naive id-ordered
    triple join — any acyclic orientation counts each triangle once,
    so the optimized plan and the simple twin must agree exactly."""
    from rabbit_data_pipeline_spark.operators.graph import triangle_count

    ps = _t(spark, sf_dir, "lineitem")["lineitem"].select("l_partkey", "l_suppkey").distinct()
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    return triangle_count(edges)


# --- Q65: record linkage (entity resolution) ---------------------------------
@register(
    "q_record_linkage",
    oracle="""
    WITH d AS (
      SELECT p_name, MIN(p_partkey) AS canon_key, COUNT(*) AS n_rows,
             string_split(p_name, ' ')[2] AS blk, string_split(p_name, ' ')[1] AS first_tok
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.canon_key AS key_a, b.canon_key AS key_b,
           a.n_rows AS rows_a, b.n_rows AS rows_b,
           levenshtein(a.first_tok, b.first_tok) AS dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.first_tok, b.first_tok) <= 3
    """,
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q65: record linkage / entity resolution over part names —
    the classic dictionary-then-block shape: collapse the corpus to
    its distinct-name dictionary first (one keyed agg; the 100 TB
    corpus may hold 10^11 rows but only 10^7 distinct names), then
    match WITHIN blocking-key groups only (here the head noun), never
    all-pairs, scoring candidates by edit distance on the modifier
    token. Match results join back to the corpus by name when row-level
    links are needed (broadcast — the dictionary is the small side).
    Spark's levenshtein and DuckDB's agree on classic edit distance,
    so the gate hashes pair-for-pair."""
    p = _t(spark, sf_dir, "part")["part"]
    d = (
        p.groupBy("p_name")
        .agg(F.min("p_partkey").alias("canon_key"), F.count("*").alias("n_rows"))
        .withColumn("blk", F.split("p_name", " ").getItem(1))
        .withColumn("first_tok", F.split("p_name", " ").getItem(0))
    )
    a = d.alias("a")
    b = d.alias("b")
    dist = F.levenshtein(F.col("a.first_tok"), F.col("b.first_tok"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_name") < F.col("b.p_name")))
        .filter(dist <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.canon_key").alias("key_a"),
            F.col("b.canon_key").alias("key_b"),
            F.col("a.n_rows").alias("rows_a"),
            F.col("b.n_rows").alias("rows_b"),
            dist.alias("dist"),
        )
    )


# --- Q66 is q_gap_fill (queries/events.py) -----------------------------------


# --- Q67: skyline / Pareto frontier ------------------------------------------
@register(
    "q_skyline",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice, p_size FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q67: 2-D skyline (Pareto frontier) — parts not dominated on
    (price, size), both minimized. The oracle is the O(n^2) NOT
    EXISTS definition; the Spark plan is the O(n log n) sweep: one
    keyed agg to per-price minimum size (the only corpus-scale
    exchange), a running-min window over the tiny distinct-price
    table (rows ≪ corpus — thousands of prices at 100 TB, so the
    single-partition window is a non-issue), keep prices whose min
    size strictly undercuts every cheaper price, then broadcast the
    skyline (price, size) pairs back to recover the rows. A row ties
    its price-group minimum and beats all cheaper groups iff nothing
    dominates it — same set, no self-join."""
    p = _t(spark, sf_dir, "part")["part"]
    g = p.groupBy("p_retailprice").agg(F.min("p_size").alias("gmin"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        g.withColumn("prev_min", F.min("gmin").over(w))
        .filter(F.col("prev_min").isNull() | (F.col("gmin") < F.col("prev_min")))
        .select(F.col("p_retailprice").alias("sk_price"), F.col("gmin").alias("sk_size"))
    )
    return p.join(
        F.broadcast(sky),
        (F.col("p_retailprice") == F.col("sk_price")) & (F.col("p_size") == F.col("sk_size")),
    ).select("p_partkey", "p_name", "p_retailprice", "p_size")


# --- Q69: table profiling ----------------------------------------------------
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name, COUNT(*) AS n_rows, COUNT({c}) AS n_non_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           MIN({c}) AS min_val, MAX({c}) AS max_val
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q69: table profiling (per-column null/distinct/range stats —
    the first pass of every data-quality gate and the input to a data
    card). One single-column aggregation per profiled column, unioned:
    deliberately NOT one multi-distinct agg — Spark plans multiple
    COUNT(DISTINCT)s via Expand (data duplicated once per distinct
    column), while per-column passes each scan ONE pruned parquet
    column with map-side partials. At 100 TB, four 1-column scans of
    a columnar file beat one 4-way-expanded scan by the expansion
    factor. MIN/MAX/COUNT are order-independent — no decimal detour."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    parts = [
        li.agg(
            F.lit(c).alias("column_name"),
            F.count("*").alias("n_rows"),
            F.count(c).alias("n_non_null"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.min(c).alias("min_val"),
            F.max(c).alias("max_val"),
        )
        for c in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# --- Q70: k-core decomposition -----------------------------------------------
_TRADE_PAIRS = """
      SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _kcore_oracle(k: int = 30, rounds: int = 8) -> str:
    """Unrolled peeling twin of operators/graph.py kcore: every round
    past the fixpoint is a no-op, so a fixed unroll depth >= the
    peeling depth hashes exactly against the converged answer."""
    sql = f"""
    WITH pairs AS ({_TRADE_PAIRS}
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    a0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS deg FROM edges)"""
    for i in range(1, rounds + 1):
        sql += f""",
    a{i} AS (
      SELECT e.src AS node, COUNT(*) AS deg
      FROM edges e JOIN a{i - 1} x ON e.src = x.node JOIN a{i - 1} y ON e.dst = y.node
      GROUP BY e.src HAVING COUNT(*) >= {k})"""
    sql += f"\n    SELECT node, deg FROM a{rounds}"
    return sql


@register("q_kcore", oracle=_kcore_oracle())
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q70: 30-core of the customer↔supplier trading graph — iterative
    peeling (drop degree<30 nodes until fixpoint), the standard
    density filter before community analysis. The Spark side peels to
    convergence with per-round shrinking semi-joins (operators/
    graph.py kcore); the oracle unrolls a fixed depth past the
    fixpoint, where extra rounds are no-ops — converged-loop vs
    unrolled-twin, hash-equal."""
    from rabbit_data_pipeline_spark.operators.graph import kcore

    t = _t(spark, sf_dir, "orders", "lineitem")
    # r15 guide §2.3: same reversible long node encoding as q_pagerank
    # (even = 2*custkey, odd = 2*suppkey+1) — the peeling loop's
    # per-round semi-joins and degree counts run on longs instead of
    # strings; labels are restored by expression at the end, so the
    # output (and the string-graph oracle) is unchanged.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = _sym_edges(pairs)
    core = kcore(edges, k=30)
    decode = F.when(F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node div 2"))).otherwise(
        F.concat(F.lit("s"), F.expr("(node - 1) div 2"))
    )
    return core.select(decode.alias("node"), "deg")


# --- Q71: weighted shortest paths --------------------------------------------
def _wsssp_oracle(rounds: int = 10) -> str:
    """Unrolled Bellman-Ford twin of operators/graph.py weighted_sssp
    (integer micro-unit weights; fixpoint by round 8 at sf0.01, extra
    rounds are no-ops)."""
    sql = """
    WITH pairs AS (
      SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s,
             MIN(CAST(FLOOR(l_extendedprice / l_quantity * 1000000 + 0.5) AS BIGINT)) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ), edges AS (
      SELECT c AS src, s AS dst, w FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst, w FROM pairs
    ),
    d0 AS (SELECT 's1' AS node, CAST(0 AS BIGINT) AS dist)"""
    for i in range(1, rounds + 1):
        sql += f""",
    d{i} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d{i - 1} d JOIN edges e ON e.src = d.node
      ) GROUP BY node)"""
    sql += f"\n    SELECT node, dist FROM d{rounds}"
    return sql


@register("q_weighted_paths", oracle=_wsssp_oracle())
def q_weighted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q71: cheapest trading routes from supplier s1 — weighted
    shortest paths where an edge costs the cheapest unit price ever
    traded between the pair (integer micro-units). Frontier-only
    Bellman-Ford relaxation (operators/graph.py weighted_sssp): each
    round relaxes only edges out of just-improved nodes, so total work
    tracks improvements, not V×E; integer distances hash exactly
    against the unrolled full-vector twin."""
    from rabbit_data_pipeline_spark.operators.graph import weighted_sssp

    t = _t(spark, sf_dir, "orders", "lineitem")
    # r16 guide §2.3: same reversible long node encoding as q_pagerank/
    # q_kcore/q_shortest_path — the (c, s) grouping keys map 1:1 to the
    # old strings, so min(w) per pair is unchanged; labels restored by
    # expression at the end, output (and oracle) unchanged.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 1000000 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("w")
        )
    )
    edges = _sym_edges(pairs, weight="w")
    dist = weighted_sssp(edges, [3], max_rounds=16)
    decode = F.when(F.col("node") % 2 == 0, F.concat(F.lit("c"), F.expr("node div 2"))).otherwise(
        F.concat(F.lit("s"), F.expr("(node - 1) div 2"))
    )
    return dist.select(decode.alias("node"), "dist")


# --- Q72: market-basket pair mining ------------------------------------------
@register(
    "q_market_basket",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    freq AS (SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY l_partkey),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items)
    SELECT p.part_a, p.part_b, p.support,
           FLOOR((CAST(p.support AS DOUBLE) * o.n / (CAST(fa.n AS DOUBLE) * fb.n))
                 * 1000000 + 0.5) / 1e6 AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    CROSS JOIN n_orders o
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q72: market-basket pair mining — part pairs co-ordered far above
    chance (lift = P(ab)/P(a)P(b)), the classic association signal.
    Scale shape: the pair self-join is WITHIN-basket only (keyed on
    l_orderkey; baskets are small, so pairs are bounded by
    Σ basket² ≪ catalog²), support pruning (HAVING) runs before the
    frequency joins, item frequencies broadcast back, and the top-k is
    TakeOrdered. Lift is one fixed IEEE shape over exact integer
    counts, micro-rounded for a bit-stable ordering."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )
    freq = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    n_orders = items.select(F.count_distinct("l_orderkey").alias("n"))
    lift = (
        F.col("support").cast("double") * F.col("o_n") / (F.col("fa_n").cast("double") * F.col("fb_n"))
    )
    return (
        pairs.join(F.broadcast(freq.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("fa_n"))), "part_a")
        .join(F.broadcast(freq.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("fb_n"))), "part_b")
        .crossJoin(F.broadcast(n_orders.select(F.col("n").alias("o_n"))))
        .select(
            "part_a",
            "part_b",
            "support",
            (F.floor(lift * 1_000_000 + F.lit(0.5)) / F.lit(1e6)).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


# --- Q73: end-to-end entity resolution ---------------------------------------
@register(
    "q_entity_resolution",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT p_name, MIN(p_partkey) AS canon_key, COUNT(*) AS n_rows,
             string_split(p_name, ' ')[2] AS blk, string_split(p_name, ' ')[1] AS first_tok
      FROM part GROUP BY p_name
    ),
    p AS (
      SELECT a.canon_key AS key_a, b.canon_key AS key_b
      FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
      WHERE levenshtein(a.first_tok, b.first_tok) <= 3
    ),
    edges AS (SELECT key_a AS u, key_b AS v FROM p UNION SELECT key_b, key_a FROM p),
    reach(u, v) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    cc AS (SELECT u AS canon_key, MIN(v) AS entity FROM reach GROUP BY u),
    named AS (
      SELECT d.p_name, COALESCE(cc.entity, d.canon_key) AS entity
      FROM d LEFT JOIN cc ON cc.canon_key = d.canon_key
    )
    SELECT n.entity,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT pt.p_name) AS n_names,
           MIN(pt.p_name) AS entity_label,
           SUM(CAST(FLOOR(pt.p_retailprice * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS total_price
    FROM part pt JOIN named n ON n.p_name = pt.p_name
    GROUP BY n.entity
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q73: the full entity-resolution pipeline in one plan —
    dictionary (one keyed agg) → blocked edit-distance candidate pairs
    (Q65) → transitive closure via distributed min-label propagation
    (operators/graph.py connected_components; chains A~B~C resolve to
    one entity even without a direct A~C pair) → canonical-entity
    rollup of the ORIGINAL rows (broadcast name→entity map back). The
    oracle replays it with a recursive-CTE closure, so cluster
    assignment AND the final per-entity aggregate are hash-gated
    end-to-end."""
    from rabbit_data_pipeline_spark.functions.exact import lsum
    from rabbit_data_pipeline_spark.operators.graph import connected_components

    p = _t(spark, sf_dir, "part")["part"]
    d = (
        p.groupBy("p_name")
        .agg(F.min("p_partkey").alias("canon_key"), F.count("*").alias("n_rows"))
        .withColumn("blk", F.split("p_name", " ").getItem(1))
        .withColumn("first_tok", F.split("p_name", " ").getItem(0))
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_name") < F.col("b.p_name")))
        .filter(F.levenshtein(F.col("a.first_tok"), F.col("b.first_tok")) <= 3)
        .select(F.col("a.canon_key").alias("id_a"), F.col("b.canon_key").alias("id_b"))
    )
    cc = connected_components(pairs).withColumnRenamed("id", "canon_key").withColumnRenamed(
        "component", "entity"
    )
    named = d.join(cc, "canon_key", "left").select(
        "p_name", F.coalesce(F.col("entity"), F.col("canon_key")).alias("entity")
    )
    return (
        p.join(F.broadcast(named), "p_name")
        .groupBy("entity")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("p_name").alias("n_names"),
            F.min("p_name").alias("entity_label"),
            lsum("p_retailprice").alias("total_price"),
        )
    )


# --- Q75: per-group mode ------------------------------------------------------
@register(
    "q_mode",
    oracle="""
    SELECT p_brand, p_type AS mode_type, cnt
    FROM (
      SELECT p_brand, p_type, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY COUNT(*) DESC, p_type) AS rn
      FROM part GROUP BY p_brand, p_type
    ) WHERE rn = 1
    """,
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q75: per-group mode (most frequent p_type per brand, smallest
    type on ties) — count agg keyed on (brand, type), then a rank
    window over the aggregated table (rows = distinct combos, ≪
    corpus) that reuses the brand-side of the exchange."""
    p = _t(spark, sf_dir, "part")["part"]
    g = p.groupBy("p_brand", "p_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(F.col("cnt").desc(), "p_type")
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), "cnt")
    )
