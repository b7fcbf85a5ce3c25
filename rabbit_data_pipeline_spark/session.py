"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the confs are chosen to also be the
right defaults on a large cluster (AQE re-plans partition counts at
runtime, so the static shuffle-partition number matters less than
having AQE + skew-join handling on).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "rabbit-data-pipeline-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting. At
        # 100 TB this is what keeps one hot key from stalling a stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static hint only; AQE coalesces down, splits skew up.
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        # Arrow for the few pandas-UDF ops (multimodal/stateful).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dims up to 32 MB broadcast (TPC-H dims at any SF we test).
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # 16g heap (round 12, was 8g): in local mode the driver JVM IS
        # every executor; an 8g heap shared by 32 task threads left the
        # long bench process GC-bound in its tail — across four r12
        # idle windows a DIFFERENT victim query's sf1 min inflated
        # 2-4x each run (bpe_train sf1 35.7s run-1, q_waiting_supplier
        # 7.97s, q_json_extract 2.04s) while a fresh-JVM control of the
        # same query sat at the uniform host shift. On a real cluster
        # this is per-executor memory, sized by the deployer; 16g on
        # the 128 GiB test host is still conservative.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables and register temp views.

    Parquet scans get predicate pushdown + column pruning for free as
    long as downstream stays declarative.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":
                # events.ts has shipped as both parquet TIMESTAMP(NANOS)
                # (unreadable natively -> legacy ns-as-long BIGINT) and
                # TIMESTAMP(MICROS) (reads as TimestampNTZ). Branch on the
                # dtype actually read instead of assuming one generation of
                # testdata. The ns path truncates with integer div (no
                # double math: ns values exceed 2^53), matching DuckDB's
                # CAST(ts AS TIMESTAMP) truncation bit-for-bit.
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = spark.read.parquet(path)
                from pyspark.sql import functions as F
                from pyspark.sql import types as T

                if isinstance(df.schema["ts"].dataType, T.LongType):
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                else:
                    # TIMESTAMP(MICROS) reads as TimestampNTZ, which several
                    # downstream exprs (unix_micros, window ranges) reject.
                    # Session tz is UTC, so NTZ -> TIMESTAMP keeps the same
                    # wall-clock instant and matches the r1-green dtype that
                    # timestamp_micros() produced.
                    df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
            else:
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# DuckDB-side spelling of the same events normalization, for oracles:
# keeps the alias `events` so oracle SQL reads naturally.
EVENTS_US = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"
