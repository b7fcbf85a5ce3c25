"""Cross-engine-deterministic aggregate helpers.

Floating-point sums depend on accumulation order, which differs between
Spark partitions and DuckDB. Summing decimals is exact and
order-independent, so ``dsum``/``davg`` cast to ``decimal(38,6)``,
aggregate, and cast back to double — bit-identical in both engines.
The matching DuckDB SQL spellings live next to each helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact sum: SQL spelling `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact mean: SQL `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
