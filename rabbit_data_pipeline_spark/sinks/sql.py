"""SQL sinks — reference src/Sinks/Pdo.php (insert/upsert with retry)
and src/Sinks/Clickhouse.php (columnar batch insert + flag update).

Production path: `df.write.jdbc` (append) — gated, no JDBC jars in
this container. Upsert on plain JDBC has no portable spelling, so the
engine computes the post-upsert state relationally (operators/sync.py)
and writes that; on Delta/Iceberg targets the same keys feed MERGE
INTO directly.

Clickhouse's BatchInsertCsv (reference saveWithLine) is Spark's native
mode of operation — columnar part-files written in parallel — so the
"batch insert" plugin is simply a file/JDBC write; the flag-update
step is operators.sync.bump_flag.
"""

from __future__ import annotations

import re
import time
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame

from rabbit_data_pipeline_spark.operators.sync import upsert
from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin

# Default retryable set mirroring the reference's retryCode list shape
# (Sinks/Pdo.php:87-101 retries only configured SQL error codes):
# connection-class SQLSTATEs plus serialization/deadlock, and the MySQL
# vendor codes the reference targets (2006 server-gone, 2013 lost
# connection, 1213 deadlock, 1205 lock-wait timeout).
DEFAULT_RETRY_CODES: tuple[str, ...] = (
    "08000", "08001", "08003", "08004", "08006", "08S01",  # connection
    "40001", "40P01",  # serialization failure / deadlock
    "2006", "2013", "1213", "1205",  # MySQL vendor codes
)

_CODE_PATTERNS = (
    re.compile(r"SQLSTATE\[(\w{5})\]", re.I),       # PDO-style message
    re.compile(r"SQLSTATE:?\s*'?(\w{5})'?", re.I),  # JDBC SQLException message
    re.compile(r"\[(\d{4})\]"),                     # PDO bracketed vendor code
    re.compile(r"\berror(?:\s+code)?[:=]?\s*(\d{4})\b", re.I),  # vendor code
)


def error_codes_of(exc: BaseException) -> tuple[str, ...]:
    """ALL SQLSTATE / vendor codes extractable from a JDBC
    (Py4J-wrapped) or DB-API exception: structured attributes first,
    then every message-pattern match. Drivers routinely emit both at
    once — 'SQLSTATE[HY000] [2006] MySQL server has gone away' — and
    the retryable signal can be in either position, so the retry
    decision must consider the whole set, not the first hit."""
    codes: list[str] = []
    state = getattr(exc, "sqlstate", None) or getattr(exc, "pgcode", None)
    if state:
        codes.append(str(state))
    msg = str(exc)
    for pat in _CODE_PATTERNS:
        for m in pat.finditer(msg):
            codes.extend(g for g in m.groups() if g)
    return tuple(dict.fromkeys(codes))


def error_code_of(exc: BaseException) -> str | None:
    """First extractable code (see error_codes_of for the full set)."""
    codes = error_codes_of(exc)
    return codes[0] if codes else None


def retry_on_codes(
    fn: Callable[[], Any],
    retries: int = 1,
    retry_codes: Iterable[str] | None = DEFAULT_RETRY_CODES,
    backoff: float = 0.5,
    _sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Pdo.php:87-101 retry semantics: re-run only when ANY of the
    failure's extractable SQL error codes (a message can carry both a
    generic SQLSTATE and the decisive vendor code) is in
    ``retry_codes`` (None = retry anything),
    sleeping ``backoff * 2^attempt`` between attempts. A non-matching
    code raises immediately — a constraint violation must not burn the
    retry budget a flaky connection needs."""
    allowed = None if retry_codes is None else {str(c).upper() for c in retry_codes}
    attempts = max(1, retries)
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            codes = error_codes_of(e)
            retryable = allowed is None or any(c.upper() in allowed for c in codes)
            if not retryable or attempt + 1 >= attempts:
                raise
            _sleep(backoff * (2**attempt))


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
    retries: int = 1,
    retry_codes: Iterable[str] | None = DEFAULT_RETRY_CODES,
    backoff: float = 0.5,
) -> None:
    """Pdo-sink parity incl. its code-conditional retry loop
    (Sinks/Pdo.php retryCode/sleep)."""
    retry_on_codes(
        lambda: df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {}),
        retries=retries,
        retry_codes=retry_codes,
        backoff=backoff,
    )


@plugin("sink.jdbc")
def _jdbc_sink(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    (df,) = inputs
    write_jdbc(
        df,
        url=cfg["url"],
        table=cfg["table"],
        mode=cfg.get("mode", "append"),
        properties=cfg.get("properties"),
        retries=int(cfg.get("retry", 1)),
        # reference cfg key: retryCode (list of SQL error codes)
        retry_codes=cfg.get("retryCode", cfg.get("retry_codes", DEFAULT_RETRY_CODES)),
        backoff=float(cfg.get("backoff", 0.5)),
    )
    return df


@plugin("sink.upsert")
def _upsert_sink(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Upsert into a parquet-backed table dir: read current state,
    merge, write back. inputs[0] is the source batch."""
    (src,) = inputs
    path, keys = cfg["path"], list(cfg["keys"])
    try:
        current = sch.spark.read.parquet(path)
        merged = upsert(current, src, keys, broadcast_source=bool(cfg.get("broadcast_source", True)))
    except Exception:  # first write — no current state
        merged = src
    merged.write.mode("overwrite").parquet(cfg.get("staging", path + "__new"))
    out = sch.spark.read.parquet(cfg.get("staging", path + "__new"))
    return out
