"""Property tests (hypothesis) for the cross-engine exact aggregates —
the mechanism every oracle hash-match rests on. For random inputs and
random partitionings, Spark's dsum/lsum must equal DuckDB's spelled-out
SQL bit-for-bit (struct.pack equality, not approx)."""

from __future__ import annotations

import struct

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from rabbit_data_pipeline_spark.functions.exact import dsum, lsum, sql_dsum, sql_lsum

# fixed-point money values: up to 8 digits with 2 decimals (the lsum
# contract is <=6 decimals; money is 2)
money = st.integers(min_value=-10**8, max_value=10**8).map(lambda c: c / 100.0)
# arbitrary finite doubles for the decimal path
anyfloat = st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _spark_sum(spark, values, agg, parts):
    df = spark.createDataFrame([(v,) for v in values], ["x"]).repartition(parts)
    return df.agg(agg("x").alias("s")).first().s


def _duck_sum(values, sql_expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    out = con.execute(f"SELECT {sql_expr.format(col='x')} FROM t").fetchone()[0]
    con.close()
    return out


@pytest.mark.parametrize("agg,sql", [(lsum, sql_lsum("x")), (dsum, sql_dsum("x"))])
@given(values=st.lists(money, min_size=1, max_size=60), parts=st.integers(1, 8))
@settings(max_examples=12, deadline=None)
def test_exact_sum_matches_duckdb_bitwise(spark, agg, sql, values, parts):
    got = _spark_sum(spark, values, agg, parts)
    want = _duck_sum(values, sql)
    assert _bits(got) == _bits(want), (got, want, values)


@given(values=st.lists(anyfloat, min_size=1, max_size=60))
@settings(max_examples=12, deadline=None)
def test_dsum_order_invariant(spark, values):
    """Partition layout must never change the answer (plain double sums
    fail this; the decimal accumulate makes it hold)."""
    a = _spark_sum(spark, values, dsum, 1)
    b = _spark_sum(spark, values, dsum, 8)
    c = _spark_sum(spark, list(reversed(values)), dsum, 3)
    assert _bits(a) == _bits(b) == _bits(c)


def test_approx_sketches_bounded_error(spark, sf_smoke):
    """The documented 100 TB substitutions — approx_count_distinct for
    DISTINCT, approx_percentile for percentile — must land within their
    advertised error on real data (HLL rsd default 5%; percentile
    accuracy parameter 10000 → <=0.01% rank error)."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.session import load_tables

    o = load_tables(spark, sf_smoke, ("orders",))["orders"]
    exact, approx = o.agg(
        F.countDistinct("o_custkey").alias("e"),
        F.approx_count_distinct("o_custkey").alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.05

    ep, ap = o.agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("e"),
        F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("a"),
    ).first()
    assert abs(ap - ep) / ep < 0.01


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 1000),
            st.one_of(st.none(), st.integers(-100, 100)),
        ),
        min_size=0, max_size=30, unique_by=lambda r: (r[0], r[1]),
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_join (union-window plan) vs pandas.merge_asof (the
    reference implementation everyone knows): identical matches on
    arbitrary key/timestamp data, including equal-timestamp matches,
    keys with no left rows, and — the round-2 bug class — NULLs inside
    the matched row's payload, which must surface as NULL instead of
    being back-filled from an older row."""
    import pandas as pd

    from rabbit_data_pipeline_spark.operators.joins import asof_join
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("ts", LongType()), StructField("payload", LongType())]
    )
    left = spark.createDataFrame([tuple(r) for r in lefts], schema)
    rpdf = pd.DataFrame(rights, columns=["k", "rts"])
    right = spark.createDataFrame(rpdf.assign(rts=rpdf.rts.astype("int64")))

    got = {
        (r["k"], r["rts"]): (r["__matched_ts"], r["payload"])
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", how="inner").collect()
    }

    if lefts:
        lpdf = pd.DataFrame(lefts, columns=["k", "ts", "payload"]).astype({"k": "int64", "ts": "int64"})
        exp_df = pd.merge_asof(
            rpdf.sort_values("rts"), lpdf.sort_values("ts"),
            left_on="rts", right_on="ts", by="k", direction="backward",
        )
        exp = {
            (int(r.k), int(r.rts)): (int(r.ts), None if pd.isna(r.payload) else int(r.payload))
            for r in exp_df.itertuples()
            if pd.notna(r.ts)
        }
    else:
        exp = {}
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(
    dim_rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-50, 50)),
        min_size=1, max_size=10, unique_by=lambda r: r[0],
    ),
    upd_rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(-50, 50)),
        min_size=0, max_size=10, unique_by=lambda r: r[0],
    ),
)
def test_scd2_invariants_hold(spark, dim_rows, upd_rows):
    """SCD2 structural invariants on arbitrary dims/deltas: (1) every
    key has exactly one current row and it has no valid_to; (2) closed
    rows all carry valid_to; (3) total rows = old rows + changed keys;
    (4) re-applying the same delta changes nothing (idempotence)."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.operators.sync import scd2_merge

    dim = spark.createDataFrame(dim_rows, "k int, val int").select(
        "k", "val",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = spark.createDataFrame(upd_rows, "k int, val int").withColumn(
        "eff", F.lit("2021-01-01").cast("timestamp")
    ) if upd_rows else spark.createDataFrame([], "k int, val int, eff timestamp")

    merged = scd2_merge(dim, upd, keys=["k"], compare_cols=["val"], effective_col="eff")
    rows = merged.collect()

    current = [r for r in rows if r.is_current]
    closed = [r for r in rows if not r.is_current]
    assert len({r.k for r in current}) == len(current)  # one current per key
    assert all(r.valid_to is None for r in current)
    assert all(r.valid_to is not None for r in closed)

    old = {r[0]: r[1] for r in dim_rows}
    changed = {k for k, v in upd_rows if k not in old or old[k] != v}
    assert len(rows) == len(dim_rows) + len(changed)

    again = scd2_merge(merged, upd, keys=["k"], compare_cols=["val"], effective_col="eff")
    assert again.count() == len(rows)


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200)),
        min_size=0, max_size=20, unique_by=lambda r: (r[0], r[1]),
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200)),
        min_size=0, max_size=20, unique_by=lambda r: (r[0], r[1]),
    ),
    upper=st.integers(1, 100),
)
def test_interval_join_matches_bruteforce(spark, lefts, rights, upper):
    """interval_join vs the O(n*m) definition: all (left, right) pairs
    with the same key and left_ts <= right_ts < left_ts + upper."""
    from rabbit_data_pipeline_spark.operators.joins import interval_join

    def mk(rows, ts_name):
        df = spark.createDataFrame(rows or [], f"k int, {ts_name} int") if rows else (
            spark.createDataFrame([], f"k int, {ts_name} int")
        )
        return df.withColumn(ts_name, F.timestamp_seconds(F.col(ts_name)))

    left, right = mk(lefts, "lts"), mk(rights, "rts")
    got = {
        (r.k, int(r.lts.timestamp()), int(r.rts.timestamp()))
        for r in interval_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                               upper=f"{upper} seconds").collect()
    }
    # ts ints are seconds in the brute-force model (Spark side casts the
    # int column + INTERVAL seconds the same way)
    exp = {
        (lk, lt, rt)
        for lk, lt in lefts
        for rk, rt in rights
        if lk == rk and lt <= rt < lt + upper
    }
    assert got == exp
