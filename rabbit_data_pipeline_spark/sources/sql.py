"""SQL sources — the reference's Pdo source (src/Sources/Pdo.php) runs
a query against a relational DB and emits rows (optionally batched /
one-message-per-row).

Spark-first mapping:
- Production: ``spark.read.jdbc`` with partitioned reads — the
  (partitionColumn, lowerBound, upperBound, numPartitions) quartet is
  what makes a 1 TB table land as N parallel scans instead of one
  driver-melting cursor. The reference's `batch`/`each` knobs
  disappear: Spark's partitioning IS the batching.
- Tests/local: DuckDB → Arrow → DataFrame (no JDBC driver jars in this
  container). Same plugin surface, picked by `driver:`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def column_partition_predicates(
    column: str, lower_bound: int, upper_bound: int, num_partitions: int
) -> list[str]:
    """The predicate set Spark's JDBC relation derives from the
    (partitionColumn, lowerBound, upperBound, numPartitions) quartet:
    stride = (upper - lower) / n, first predicate unbounded below and
    last unbounded above, so rows OUTSIDE the bound guesses still land
    in exactly one partition — the quartet bounds the SPLIT, not the
    data. Exposed so non-JDBC chunked readers (and tests) share the
    exact partitioning contract."""
    if num_partitions <= 1 or lower_bound >= upper_bound:
        return ["1 = 1"]
    stride = (upper_bound - lower_bound) // num_partitions or 1
    preds, cut = [], lower_bound + stride
    preds.append(f"{column} < {cut} OR {column} IS NULL")
    for _ in range(num_partitions - 2):
        nxt = cut + stride
        preds.append(f"{column} >= {cut} AND {column} < {nxt}")
        cut = nxt
    preds.append(f"{column} >= {cut}")
    return preds


def read_chunked_duckdb(
    spark: SparkSession,
    sql: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 4,
    database: str = ":memory:",
    views: dict[str, str] | None = None,
) -> DataFrame:
    """Local twin of a partitioned `spark.read.jdbc`: the same derived
    predicate set, one chunk query per predicate against DuckDB, chunks
    unioned into one DataFrame. This is the reference's SyncOtherMysql
    `size × parallel` paging re-expressed as range predicates — on a
    real cluster swap the DuckDB executor for read_jdbc and the chunk
    queries run ON the executors; here they prove the partitioning
    plumbing (predicate derivation, per-chunk schema, union) with no
    JDBC driver in the container."""
    import duckdb

    con = duckdb.connect(database)
    for name, path in (views or {}).items():
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    out: DataFrame | None = None
    for pred in column_partition_predicates(partition_column, lower_bound, upper_bound, num_partitions):
        tbl = con.execute(f"SELECT * FROM ({sql}) __chunk WHERE {pred}").arrow()
        # schema comes from the Arrow result, never inferred from rows:
        # an empty chunk (sparse key range, or an empty source) must
        # still union with the same column types.
        chunk = spark.createDataFrame(tbl.to_pandas(), schema=_arrow_to_spark_schema(tbl.schema))
        out = chunk if out is None else out.unionByName(chunk)
    con.close()
    return out


def _arrow_to_spark_schema(arrow_schema):
    from pyspark.sql import types as T
    import pyarrow as pa

    def conv(t):
        if pa.types.is_int8(t) or pa.types.is_int16(t):
            return T.ShortType() if pa.types.is_int16(t) else T.ByteType()
        if pa.types.is_int32(t):
            return T.IntegerType()
        if pa.types.is_integer(t):
            return T.LongType()
        if pa.types.is_float32(t):
            return T.FloatType()
        if pa.types.is_floating(t):
            return T.DoubleType()
        if pa.types.is_boolean(t):
            return T.BooleanType()
        if pa.types.is_timestamp(t):
            return T.TimestampType()
        if pa.types.is_date(t):
            return T.DateType()
        if pa.types.is_decimal(t):
            return T.DecimalType(t.precision, t.scale)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return T.BinaryType()
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return T.ArrayType(conv(t.value_type))
        return T.StringType()

    return T.StructType([T.StructField(f.name, conv(f.type)) for f in arrow_schema])


def read_duckdb(spark: SparkSession, sql: str, database: str = ":memory:", views: dict[str, str] | None = None) -> DataFrame:
    """Local test path: run SQL in DuckDB, hand Arrow batches to Spark.

    Fine for dim-sized data (it lands on the driver once); a real
    deployment uses read_jdbc. `views` maps name → parquet path.
    """
    import duckdb

    con = duckdb.connect(database)
    for name, path in (views or {}).items():
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    tbl = con.execute(sql).arrow()
    df = spark.createDataFrame(tbl.to_pandas())
    con.close()
    return df


@plugin("source.sql")
def _sql_source(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Pdo-source parity. driver: jdbc|duckdb|spark.

    driver=spark runs the SQL against the session catalog (temp views
    registered by load_tables) — the pure-Spark path.
    """
    driver = cfg.get("driver", "spark")
    sql = cfg["sql"]
    if driver == "jdbc":
        return read_jdbc(
            sch.spark,
            url=cfg["url"],
            query=sql,
            partition_column=cfg.get("partitionColumn"),
            lower_bound=cfg.get("lowerBound"),
            upper_bound=cfg.get("upperBound"),
            num_partitions=int(cfg.get("numPartitions", 8)),
            properties=cfg.get("properties"),
        )
    if driver == "duckdb":
        if cfg.get("partitionColumn") is not None:
            return read_chunked_duckdb(
                sch.spark,
                sql,
                partition_column=cfg["partitionColumn"],
                lower_bound=int(cfg["lowerBound"]),
                upper_bound=int(cfg["upperBound"]),
                num_partitions=int(cfg.get("numPartitions", 4)),
                database=cfg.get("database", ":memory:"),
                views=cfg.get("views"),
            )
        return read_duckdb(sch.spark, sql, cfg.get("database", ":memory:"), cfg.get("views"))
    return sch.spark.sql(sql)
