"""Cross-engine output-TYPE audit for every registered oracle.

The q_sessionize lesson (rounds 1-3): a DuckDB oracle whose final
output contains a HUGEINT (`SUM` over any integer type) hash-matches
under a `fetchall()` gate (HUGEINT → Python int) but diverges under a
pandas/arrow fetch (HUGEINT → float64, "3.0" vs "3"). This test bans
the whole hazard class up front instead of waiting for a red driver
row: for each oracle we compare DuckDB's *arrow* schema (what a
strict gate sees) against the Spark schema and fail on combinations
whose equality depends on the fetch path:

- DuckDB decimal128/int128 (HUGEINT exports as decimal128(38,0))
  where Spark's column is integral or floating;
- DuckDB floating where Spark is integral (or vice versa) — "1.0"
  vs "1" under any stringifying normalizer.

Schema-only: DuckDB runs each oracle at the smallest SF; Spark plans
are built but never executed, so the audit stays fast."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
)

from rabbit_data_pipeline_spark.queries import registry
from tests.oracle import duckdb_conn

_SF_SMALL = "/root/testdata/sf0.001"

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FLOATING = (FloatType, DoubleType)


def _classify_arrow(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "integral"
    if pa.types.is_floating(t):
        return "floating"
    return "other"


def _classify_spark(t) -> str:
    if isinstance(t, DecimalType):
        return "decimal"
    if isinstance(t, _INTEGRAL):
        return "integral"
    if isinstance(t, _FLOATING):
        return "floating"
    return "other"


def _cases():
    return sorted((n, q) for n, q in registry().items() if q.oracle is not None)


@pytest.mark.parametrize("name", [n for n, _ in _cases()])
def test_oracle_output_types_fetch_path_independent(spark, name):
    q = registry()[name]
    con = duckdb_conn(_SF_SMALL)
    try:
        duck_schema = con.execute(q.oracle).arrow().schema
    finally:
        con.close()
    spark_types = {f.name: f.dataType for f in q.builder(spark, _SF_SMALL).schema.fields}
    assert set(duck_schema.names) == set(spark_types), f"{name}: column sets differ"
    hazards = []
    for col in duck_schema.names:
        d_cls = _classify_arrow(duck_schema.field(col).type)
        s_cls = _classify_spark(spark_types[col])
        if d_cls == s_cls:
            continue
        # int32 vs int64 etc. normalize identically; everything else
        # crossing a class boundary depends on the fetch path.
        if {d_cls, s_cls} == {"integral"}:
            continue
        hazards.append(f"{col}: duckdb={duck_schema.field(col).type} spark={spark_types[col]}")
    assert not hazards, f"{name}: fetch-path-dependent output types: {hazards}"
