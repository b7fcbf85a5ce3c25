"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle side-by-side, compare row count + column names +
order-insensitive value hash (columns sorted by name, rows sorted)."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb

from rabbit_data_pipeline_spark.session import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, (datetime, date)):
        return str(v)[:19]
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _assert_scalar_surface(cols: list[str], rows: list[tuple], engine: str) -> None:
    """The driver's canonicalizer pandas-sorts result columns; list
    cells are unhashable there (r4's one red row, emb_pq_codes).
    Enforce the repo rule locally: arrays must leave the compare
    surface as scalars on BOTH engines (array_join / array_to_string
    — see queries/tpch2.py q_array_agg)."""
    for r in rows[:1000]:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple, dict)):
                raise AssertionError(
                    f"{engine} result column {cols[i]!r} contains a nested value "
                    f"({type(v).__name__}); the driver's pandas canonicalizer cannot "
                    "sort it — emit it joined into a scalar on both engines"
                )


def compare(spark_df, oracle: str, sf_dir: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    _assert_scalar_surface(s_cols, s_rows, "spark")
    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()
    _assert_scalar_surface(d_cols, d_rows, "oracle")
    out = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    out["hash_match"] = (
        out["rows_match"]
        and out["cols_match"]
        and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
    )
    return out
