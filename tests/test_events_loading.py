"""Events-table loading must survive BOTH parquet timestamp
generations the driver has shipped: TIMESTAMP(NANOS) (unreadable
natively by Spark → legacy ns-as-long BIGINT + convert) and
TIMESTAMP(MICROS) (reads as TimestampNTZ → cast). Round 2 died
because the loader assumed one generation; this pins both branches
and the value equivalence between them.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rabbit_data_pipeline_spark.session import load_tables

_ROWS = [
    (1, 1_700_000_000_123_456_789, 10, "click", 1.5),
    (2, 1_700_000_060_987_654_321, 11, "view", 2.5),
]


def _write_events(path: str, unit: str) -> None:
    ts = [r[1] // (1000 if unit == "us" else 1) for r in _ROWS]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_events_load_both_timestamp_units(spark, tmp_path):
    collected = {}
    for unit in ("ns", "us"):
        d = str(tmp_path / unit)
        os.makedirs(d)
        _write_events(os.path.join(d, "events.parquet"), unit)
        df = load_tables(spark, d, ("events",))["events"]
        # downstream contract: a proper timestamp column that temporal
        # expressions accept (unix_micros rejected TimestampNTZ in r2)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        rows = df.select("event_id", F.unix_micros("ts").alias("us")).collect()
        collected[unit] = sorted((r.event_id, r.us) for r in rows)
    # ns truncates to µs == the natively-µs values: both generations
    # load to bit-identical instants
    assert collected["ns"] == collected["us"]
    assert collected["us"][0][1] == 1_700_000_000_123_456
