"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) at
sf0.001. ``queries()``/``oracle_sql()`` expose the full operator
inventory from SURVEY.md §2 with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from rabbit_data_pipeline_spark.queries import registry

    return registry()["q_agg_pricing"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from rabbit_data_pipeline_spark.queries import registry

    return {name: q.builder for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from rabbit_data_pipeline_spark.queries import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
