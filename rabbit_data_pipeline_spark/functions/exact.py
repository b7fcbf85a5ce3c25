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


# Fast exact path for fixed-point-valued doubles (money, quantities):
# scale to integer micro-units with floor(x*10^6 + 0.5) — pure IEEE ops
# that both engines evaluate bit-identically (unlike round(), whose
# half-way rule differs across engines) — sum as 64-bit integers
# (exact, order-independent, stays in Tungsten's long fast path; the
# decimal(38,6) path drops to 128-bit BigDecimal and costs ~3x), then
# convert back. The long->double conversion of the total and the /1e6
# are again identical IEEE ops in both engines. Precision budget:
# |sum(x)*1e6| < 2^63, i.e. totals up to ~9.2e12 at 6-decimal scale.
_SCALE = 1_000_000


def lsum(col: Column | str) -> Column:
    """Exact sum for ≤6-decimal fixed-point doubles.
    SQL spelling: see sql_lsum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * _SCALE + F.lit(0.5)).cast("long")) / F.lit(float(_SCALE))


def lavg(col: Column | str) -> Column:
    """Exact mean for ≤6-decimal fixed-point doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * _SCALE + F.lit(0.5)).cast("long")) / F.lit(float(_SCALE)) / F.count(c)


def sql_lsum(expr: str) -> str:
    return f"SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)) / 1000000.0"


def sql_lavg(expr: str) -> str:
    return f"SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT)) / 1000000.0 / COUNT({expr})"
