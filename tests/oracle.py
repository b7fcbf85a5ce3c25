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


def compare(spark_df, oracle: str, sf_dir: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()
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
