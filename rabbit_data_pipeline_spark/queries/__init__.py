"""Query/operator registry — the engine's coverage surface.

Every capability row in SURVEY.md §2 that is SQL-expressible registers
BOTH a Spark builder and a DuckDB oracle SQL string; the driver (and
``tests/test_correctness.py``) run them side-by-side and compare
row-count + schema + order-insensitive value hash.

Cross-engine float determinism: sums over doubles are order-dependent,
so every aggregate here casts to decimal before summing (exact,
order-independent) and back to double after — bit-identical between
Spark and DuckDB. See ``functions/exact.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


def registry() -> dict[str, Query]:
    # Import side-effect modules on first use.
    from rabbit_data_pipeline_spark.queries import events, llm, pipelines, streaming_q, tpch, tpch2  # noqa: F401

    return dict(_REGISTRY)
