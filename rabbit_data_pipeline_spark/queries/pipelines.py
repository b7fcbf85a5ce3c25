"""Pipeline-framework queries — each runs a real PipelineSpec through
the Scheduler (YAML → DAG → one Catalyst plan), or a sync operator,
and checks against a DuckDB oracle.

File-backed cases write their fixture under /tmp/rdps_fixtures from
the given sf_dir first (deterministically: DuckDB COPY with ORDER BY),
so the static oracle SQL can read the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.queries import register
from rabbit_data_pipeline_spark.session import load_tables

FIXTURES = "/tmp/rdps_fixtures"


def _fixture_csv(sf_dir: str, name: str, sql: str) -> str:
    """Deterministic CSV fixture exported from the sf_dir parquet."""
    import duckdb

    os.makedirs(FIXTURES, exist_ok=True)
    out = os.path.join(FIXTURES, f"{name}.csv")
    con = duckdb.connect()
    con.execute(f"COPY ({sql.format(sf=sf_dir)}) TO '{out}' (HEADER, DELIMITER ',')")
    con.close()
    return out


# --- C1/C2/T6: YAML spec → scheduler → sql transform → memory sink ----------
@register(
    "pipeline_e2e",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.pipeline import Scheduler

    yaml_cfg = f"""
priority_rollup:
  read_orders:
    type: source.table
    start: true
    config: {{}}
    name: orders
    sf_dir: {sf_dir}
    output: only_final
  only_final:
    type: transform.filter
    condition: o_orderstatus = 'F'
    output: rollup
  rollup:
    type: transform.sql
    sql: >
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM input GROUP BY o_orderpriority
    output: out
  out:
    type: sink.memory
    view: priority_rollup_result
"""
    sch = Scheduler.from_yaml(spark, yaml_cfg)
    return sch.run("priority_rollup")["out"]


# --- C2: fan-out (one node feeds two branches) -------------------------------
@register(
    "pipeline_fanout",
    oracle="""
    SELECT 'high' AS branch, COUNT(*) AS n FROM orders WHERE o_totalprice >= 200000
    UNION ALL
    SELECT 'low' AS branch, COUNT(*) AS n FROM orders WHERE o_totalprice < 200000
    """,
)
def pipeline_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference fan-out (output: [a, b]) + merge via a multi-input
    union node — which the reference cannot even express (its DAG is
    forward-only per Message); here it's just more edges in the plan."""
    from rabbit_data_pipeline_spark.pipeline import Scheduler

    yaml_cfg = f"""
fanout:
  read_orders:
    type: source.table
    start: true
    name: orders
    sf_dir: {sf_dir}
    output: [high, low]
  high:
    type: transform.sql
    sql: SELECT 'high' AS branch, COUNT(*) AS n FROM input WHERE o_totalprice >= 200000
    output: merged
  low:
    type: transform.sql
    sql: SELECT 'low' AS branch, COUNT(*) AS n FROM input WHERE o_totalprice < 200000
    output: merged
  merged:
    type: transform.union
    inputs: [high, low]
"""
    sch = Scheduler.from_yaml(spark, yaml_cfg)
    return sch.run("fanout")["merged"]


# --- S1: find_files ----------------------------------------------------------
@register(
    "find_files",
    oracle="""
    SELECT * FROM (VALUES ('a.csv'), ('b.csv'), ('c.tsv')) AS t(file_name)
    """,
)
def find_files_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pathlib

    d = os.path.join(FIXTURES, "scan")
    os.makedirs(d, exist_ok=True)
    for fname, body in [("a.csv", "x\n1\n"), ("b.csv", "x\n2\n"), ("c.tsv", "x\n3\n"), ("skip.log", "nope")]:
        pathlib.Path(d, fname).write_text(body)
    from rabbit_data_pipeline_spark.sources.files import find_files

    df = find_files(spark, scan_dir=d, extensions=["csv", "tsv"])
    return df.select(F.element_at(F.split("path", "/"), -1).alias("file_name"))


# --- S2: SQL source (DuckDB driver — the Pdo test path) ----------------------
@register(
    "source_sql",
    oracle="""
    SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey
    """,
)
def source_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.pipeline import Scheduler

    spec = {
        "pdo_pull": {
            "pull": {
                "type": "source.sql",
                "start": True,
                "driver": "duckdb",
                "sql": "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey",
                "views": {"nation": f"{sf_dir}/nation.parquet"},
            }
        }
    }
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in spec.items()})
    return sch.run("pdo_pull")["pull"]


# --- T1-T3: line parser ------------------------------------------------------
@register(
    "line_parser_csv",
    oracle=f"""
    SELECT CAST(p_partkey AS VARCHAR) AS part_id,
           p_name,
           CAST(p_size AS VARCHAR) AS p_size,
           'catalog' AS src
    FROM read_csv('{FIXTURES}/parts.csv', header=true, all_varchar=true)
    """,
)
def line_parser_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FindFiles→LineParser chain: csv parse + exclude + rename +
    addField (reference LineParser knobs), fast path = native reader."""
    _fixture_csv(sf_dir, "parts", "SELECT p_partkey, p_name, p_brand, p_size FROM read_parquet('{sf}/part.parquet') ORDER BY p_partkey")
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    return parse_lines(
        spark,
        os.path.join(FIXTURES, "parts.csv"),
        file_type="csv",
        exclude=[2],  # drop p_brand by position
        rename={"p_partkey": "part_id"},
        add_fields={"src": "catalog"},
    )


# --- C5/T3: generated ids ----------------------------------------------------
@register(
    "id_gen",
    oracle="SELECT COUNT(*) AS n_rows, COUNT(*) AS n_ids FROM customer",
)
def id_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uuid() per row (idKey parity): ids are random, so the oracle
    checks the invariant — as many distinct ids as rows."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    with_id = c.withColumn("row_id", F.expr("uuid()"))
    return with_id.agg(F.count("*").alias("n_rows"), F.countDistinct("row_id").alias("n_ids"))


# --- T4/T5: xml format → parse roundtrip -------------------------------------
@register(
    "xml_parse",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS nation_key, n_name AS nation_name
    FROM nation
    """,
)
def xml_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: rows → xml strings (XmlFormat) → fields (XmlParser).
    Equality with the raw table proves both directions."""
    from rabbit_data_pipeline_spark.operators.xml import xml_format, xml_parse

    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    as_xml = xml_format(n, item_tag="nation", out_col="xml", columns=["n_nationkey", "n_name"])
    return xml_parse(
        as_xml,
        fields={"nation_key": "/nation/n_nationkey/text()", "nation_name": "/nation/n_name/text()"},
        xml_col="xml",
    )


@register(
    "xml_format",
    oracle="""
    SELECT '<region><id>' || CAST(r_regionkey AS VARCHAR) || '</id><name>' || r_name || '</name></region>' AS xml
    FROM region
    """,
)
def xml_format_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.xml import xml_format

    r = load_tables(spark, sf_dir, ("region",))["region"]
    renamed = r.select(F.col("r_regionkey").alias("id"), F.col("r_name").alias("name"))
    return xml_format(renamed, item_tag="region", out_col="xml").select("xml")


# --- K2: file sink round-trip -------------------------------------------------
@register(
    "file_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderstatus
    """,
)
def file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write parquet (sink.file) → read back → aggregate: proves the
    sink loses/duplicates nothing."""
    from rabbit_data_pipeline_spark.sinks.files import write_files

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    path = os.path.join(FIXTURES, "roundtrip_orders")
    write_files(o.filter(F.col("o_totalprice") > 150000), path, fmt="parquet", mode="overwrite")
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


# --- Y1: insert-missing ------------------------------------------------------
@register(
    "sync_insert_missing",
    oracle="""
    WITH target AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
         source AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000)
    SELECT * FROM target
    UNION ALL
    SELECT * FROM source s WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.c_custkey = s.c_custkey)
    """,
)
def sync_insert_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.sync import insert_missing

    c = load_tables(spark, sf_dir, ("customer",))["customer"].select("c_custkey", "c_name", "c_acctbal")
    target = c.filter(F.col("c_custkey") % 2 == 0)
    source = c.filter(F.col("c_acctbal") > 5000)
    return insert_missing(target, source, keys=["c_custkey"])


# --- Y1b: upsert (ON DUPLICATE KEY UPDATE parity) ----------------------------
@register(
    "sink_upsert",
    oracle="""
    WITH target AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 != 0),
         source AS (SELECT o_orderkey, o_orderstatus,
                           CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice
                    FROM orders WHERE o_totalprice > 250000)
    SELECT * FROM target t WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT * FROM source
    """,
)
def sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.sync import upsert

    o = load_tables(spark, sf_dir, ("orders",))["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    source = o.filter(F.col("o_totalprice") > 250000).withColumn(
        "o_totalprice", (F.col("o_totalprice") * 1.1).cast("double")
    )
    return upsert(target, source, keys=["o_orderkey"], broadcast_source=True)


# --- Y2: incremental sync by watermark ---------------------------------------
@register(
    "sync_incremental",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
         dst AS (SELECT * FROM events_us WHERE ts < TIMESTAMP '2024-01-15')
    SELECT event_id, ts, user_id, event_type
    FROM events_us
    WHERE ts > (SELECT MAX(ts) FROM dst)
    """,
)
def sync_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-January watermark: the driver's events all fall in January
    2024, so the previous 2024-02-01 cutoff put the entire table in dst
    and the incremental delta was empty — a 0-row/vacuous gate per the
    r5 verdict. 2024-01-15 splits the range so the watermark filter
    actually selects rows (~506 at sf0.001)."""
    from rabbit_data_pipeline_spark.operators.sync import sync_incremental

    e = load_tables(spark, sf_dir, ("events",))["events"]
    dst = e.filter(F.col("ts") < "2024-01-15")
    return sync_incremental(e, dst, "ts").select("event_id", "ts", "user_id", "event_type")


# --- Y2b: chunked parallel sync (SyncOtherMysql parity) ----------------------
@register(
    "sync_chunked",
    oracle="""
    WITH src AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders),
         dst AS (SELECT * FROM src WHERE o_orderdate < TIMESTAMP '1997-01-01'),
         delta AS (SELECT * FROM src WHERE o_orderdate > (SELECT MAX(o_orderdate) FROM dst))
    SELECT * FROM dst WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
    UNION ALL
    SELECT * FROM delta
    """,
)
def sync_chunked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SyncOtherMysql parity end-to-end: the source table arrives via a
    4-predicate chunked read (the partitioned-JDBC quartet surfaced
    through the YAML sql source — reference SyncOtherMysql.php:50-62
    pages size×parallel rows; here the paging is the partitioning),
    then rows above the destination's max watermark upsert in. Bounds
    are deliberately interior to the key range so the unbounded
    first/last predicates carry real rows."""
    from rabbit_data_pipeline_spark.operators.sync import sync_chunked
    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    spec = {
        "chunked_pull": {
            "pull": {
                "type": "source.sql",
                "start": True,
                "driver": "duckdb",
                "sql": "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders",
                "views": {"orders": f"{sf_dir}/orders.parquet"},
                "partitionColumn": "o_orderkey",
                "lowerBound": 2000,
                "upperBound": 4000,
                "numPartitions": 4,
            }
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in spec.items()})
    source = sch.run("chunked_pull")["pull"]
    target = (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .filter(F.col("o_orderdate") < "1997-01-01")
    )
    return sync_chunked(source, target, keys=["o_orderkey"], updated_at="o_orderdate")


# --- Y3: keep-latest-by-flag --------------------------------------------------
@register(
    "sync_flag_update",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber DESC, l_quantity, l_extendedprice, l_partkey, l_suppkey) AS rn
      FROM lineitem)
    WHERE rn = 1
    """,
)
def sync_flag_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber) is not unique in the synthetic data,
    so the tiebreak columns make the kept row deterministic."""
    from rabbit_data_pipeline_spark.operators.sync import keep_latest_by_flag

    l = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return keep_latest_by_flag(
        l, keys=["l_orderkey"], order_col="l_linenumber",
        tiebreak=["l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"],
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# --- Y4: delete-by-condition ---------------------------------------------------
@register(
    "delete_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
    """,
)
def delete_where_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.sync import delete_where

    o = load_tables(spark, sf_dir, ("orders",))["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    return delete_where(o, "o_orderstatus = 'F' AND o_totalprice < 100000")


# --- Y6: SCD Type-2 history-preserving merge ---------------------------------
@register(
    "sync_scd2",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_name, c_acctbal,
             TIMESTAMP '1995-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer),
    upd AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 5 = 0
                  THEN CAST(c_acctbal + 100 AS DOUBLE) ELSE c_acctbal END AS c_acctbal,
             TIMESTAMP '2000-06-01' AS eff
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW_' || c_name, CAST(42.0 AS DOUBLE),
             TIMESTAMP '2000-06-01'
      FROM customer WHERE c_custkey % 100 = 0),
    changed AS (
      SELECT u.* FROM upd u
      LEFT JOIN dim c ON u.c_custkey = c.c_custkey AND c.is_current
      WHERE c.c_custkey IS NULL
         OR u.c_name    IS DISTINCT FROM c.c_name
         OR u.c_acctbal IS DISTINCT FROM c.c_acctbal)
    SELECT d.* FROM dim d
    WHERE d.is_current
      AND NOT EXISTS (SELECT 1 FROM changed ch WHERE ch.c_custkey = d.c_custkey)
    UNION ALL
    SELECT d.c_custkey, d.c_name, d.c_acctbal, d.valid_from,
           ch.eff AS valid_to, FALSE AS is_current
    FROM dim d JOIN changed ch ON d.c_custkey = ch.c_custkey
    WHERE d.is_current
    UNION ALL
    SELECT ch.c_custkey, ch.c_name, ch.c_acctbal, ch.eff AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM changed ch
    """,
)
def sync_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over customer: 20% of updates change acctbal (new version +
    closed old version), the rest are no-ops, 1% are brand-new keys."""
    from rabbit_data_pipeline_spark.operators.sync import scd2_merge

    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    dim = c.select(
        "c_custkey", "c_name", "c_acctbal",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd_even = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name",
        F.when(F.col("c_custkey") % 5 == 0, (F.col("c_acctbal") + 100).cast("double"))
         .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.lit("2000-06-01").cast("timestamp").alias("eff"),
    )
    upd_new = c.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_name")).alias("c_name"),
        F.lit(42.0).cast("double").alias("c_acctbal"),
        F.lit("2000-06-01").cast("timestamp").alias("eff"),
    )
    return scd2_merge(
        dim, upd_even.unionByName(upd_new),
        keys=["c_custkey"], compare_cols=["c_name", "c_acctbal"], effective_col="eff",
    )


# --- S7+: JSONL source (the LLM-corpus interchange format) -------------------
def _fixture_jsonl(sf_dir: str, name: str, sql: str) -> str:
    """Deterministic newline-delimited-JSON fixture exported from the
    sf_dir parquet (DuckDB COPY FORMAT JSON writes one object per
    line — exactly the JSONL shape LLM corpora ship in)."""
    import duckdb

    os.makedirs(FIXTURES, exist_ok=True)
    out = os.path.join(FIXTURES, f"{name}.jsonl")
    con = duckdb.connect()
    con.execute(f"COPY ({sql.format(sf=sf_dir)}) TO '{out}' (FORMAT JSON)")
    con.close()
    return out


@register(
    "source_jsonl",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars, text
    FROM read_json('{FIXTURES}/docs.jsonl', format='newline_delimited',
                   columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR', 'lang': 'VARCHAR',
                             'source': 'VARCHAR', 'n_chars': 'BIGINT'}})
    WHERE n_chars >= 200
    """,
)
def source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+: JSONL ingestion through the pipeline's source.json plugin
    with an explicit schema (inference would scan the data twice and
    can drift between files — at 100 TB the schema is a contract, not
    a guess). Both engines parse the SAME file written by a third
    party (DuckDB's JSON writer), so escaping, unicode and number
    parsing are all adjudicated; the n_chars filter proves predicate
    pushdown composes with the JSON scan."""
    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    path = _fixture_jsonl(
        sf_dir, "docs",
        "SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id",
    )
    spec = PipelineSpec.from_dict(
        "jsonl_pull",
        {
            "pull": {
                "type": "source.json",
                "start": True,
                "path": path,
                "options": {
                    "schema": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
                },
            }
        },
    )
    out = Scheduler(spark, {"jsonl_pull": spec}).run("jsonl_pull")["pull"]
    return out.filter(F.col("n_chars") >= 200).select("doc_id", "lang", "source", "n_chars", "text")


# --- K8 under the value-hash gate: partitioned write → pruned read -----------
@register(
    "layout_partitioned_read",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS order_year,
           o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) IN (1994, 1995)
    GROUP BY 1, 2
    """,
)
def layout_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 correctness (the layout contracts in tests/test_layout.py are
    plan-level; this puts the write→read path under the value hash):
    orders written partitioned by year into a staging dir, read back
    with a partition filter — the filter prunes DIRECTORIES, not rows
    (partition pruning), and the re-aggregated answer must equal the
    oracle computed from the original table. Exercises partition-column
    round-trip typing, Hive-style dir layout and pruned-scan
    correctness in one gate."""
    import tempfile

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    out = os.path.join(tempfile.gettempdir(), f"rdps_part_{os.path.basename(sf_dir.rstrip('/'))}")
    (
        o.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("order_year").isin(1994, 1995))
    return back.groupBy("order_year", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("total"),
    )


# --- K6/K7 under the value-hash gate ------------------------------------------
@register(
    "layout_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY 1
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 correctness (the zero-exchange layout contract is plan-gated
    in tests/test_layout.py; this value-hashes the path end-to-end):
    orders and lineitem written BUCKETED on the order key as catalog
    tables, then joined bucket-to-bucket and re-aggregated — the
    answer must match the oracle computed from the raw parquet. At
    100 TB co-bucketing is the difference between a join that shuffles
    two fact tables and one that shuffles nothing."""
    from rabbit_data_pipeline_spark.sinks.layout import write_bucketed

    import shutil
    from urllib.parse import urlparse

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    sfx = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ot, lt = f"rdps_bq_orders_{sfx}", f"rdps_bq_lineitem_{sfx}"
    # A managed table's LOCATION can survive a previous session whose
    # catalog (in-memory by default) forgot the table — overwrite then
    # fails with LOCATION_ALREADY_EXISTS. Drop both halves explicitly.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    write_bucketed(t["orders"], ot, ["o_orderkey"], num_buckets=8)
    write_bucketed(t["lineitem"].select("l_orderkey", "l_extendedprice"), lt, ["l_orderkey"], num_buckets=8)
    o = spark.table(ot).filter(F.col("o_orderdate") >= "1995-01-01")
    l = spark.table(lt)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("total"),
        )
    )


@register(
    "layout_compacted_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def layout_compacted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7 correctness: a many-small-files table compacted to
    size-targeted files must round-trip every row bit-identically (the
    compaction is a pure rewrite — any row change is a bug)."""
    import tempfile

    from rabbit_data_pipeline_spark.sinks.layout import compact

    n = load_tables(spark, sf_dir, ("nation",))["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = os.path.join(tempfile.gettempdir(), f"rdps_compact_{os.path.basename(sf_dir.rstrip('/'))}")
    n.repartition(16).write.mode("overwrite").parquet(out)  # deliberately fragmented
    compact(spark, out, target_file_mb=128)
    return spark.read.parquet(out)


# --- K9/L15 under the value-hash gate ----------------------------------------
@register(
    "layout_zorder_read",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 200 AND l_suppkey BETWEEN 10 AND 50
    """,
)
def layout_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 correctness: lineitem Z-order-clustered on (l_partkey,
    l_suppkey) at write, read back with a range predicate on BOTH
    dims — the clustering narrows every file's min/max span on both
    columns (effectiveness proven in tests/test_layout.py; here the
    rewritten data must also still be the same data). The aggregate
    over the pruned scan must equal the oracle over the original."""
    import tempfile

    from rabbit_data_pipeline_spark.sinks.layout import cluster_by_zorder

    l = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    out = os.path.join(tempfile.gettempdir(), f"rdps_zorder_{os.path.basename(sf_dir.rstrip('/'))}")
    cluster_by_zorder(l, ["l_partkey", "l_suppkey"], n_files=8).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("l_partkey").between(100, 200) & F.col("l_suppkey").between(10, 50)
    )
    return back.agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("total"),
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15 correctness: the salted join (small side replicated salt×,
    large rows scattered across salt buckets — the standard treatment
    when one key is hot enough to collapse a reducer) must produce the
    EXACT rows of the plain join; the per-nation aggregate over the
    salted result hashes against the plain-join oracle. (The salting
    is row-level logic — its correctness contract holds under any
    physical join strategy; the forced-SMJ skew plan shape is covered
    by the unit tests in tests/test_skew_multimodal.py.)"""
    from rabbit_data_pipeline_spark.functions.skew import salted_join

    t = load_tables(spark, sf_dir, ("customer", "nation"))
    c = t["customer"].withColumnRenamed("c_nationkey", "n_nationkey")
    j = salted_join(c, t["nation"].select("n_nationkey", "n_name"), on=["n_nationkey"], salt=8)
    return j.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double").alias("total_bal"),
    )


# --- Y9: delete detection ------------------------------------------------------
@register(
    "sync_deleted_keys",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey % 7 = 0
      AND c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
    """,
)
def sync_deleted_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y9: delete detection — target holds keys ≡0 (mod 7) from an old
    sync, source now has only ≡0 (mod 3); the detector must return
    exactly the target keys the source no longer carries (the rows a
    watermark sync silently leaves behind forever)."""
    from rabbit_data_pipeline_spark.operators.sync import deleted_keys

    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    target = c.filter(F.col("c_custkey") % 7 == 0)
    source = c.filter(F.col("c_custkey") % 3 == 0)
    return deleted_keys(target, source, ["c_custkey"])


# --- Y10: incremental materialized-rollup maintenance --------------------------
@register(
    "rollup_incremental",
    oracle="""
    SELECT o_custkey, COUNT(o_totalprice) AS n_rows,
           SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS total,
           SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) / 1000000.0
             / COUNT(o_totalprice) AS mean
    FROM orders
    GROUP BY o_custkey
    """,
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y10: incremental materialized-rollup maintenance — the base
    rollup (orders before 1998) is merged with a delta batch (orders
    from 1998 on) via integer-partial addition, and the result must
    hash identically to the oracle's FULL RECOMPUTE over all orders:
    the gate proves merge(rollup(base), agg(delta)) == rollup(all)
    bit-for-bit. At 100 TB the stored side is bucketed on the rollup
    key (sinks/layout.py), so the nightly merge is O(delta), not
    O(corpus) (operators/rollup.py)."""
    from rabbit_data_pipeline_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        rollup_partials,
    )

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cut = F.lit("1998-01-01").cast("timestamp")
    base = rollup_partials(o.filter(F.col("o_orderdate") < cut), ["o_custkey"], "o_totalprice")
    delta = rollup_partials(o.filter(F.col("o_orderdate") >= cut), ["o_custkey"], "o_totalprice")
    return finalize_rollup(merge_rollups(base, delta, ["o_custkey"]), ["o_custkey"])


@register(
    "layout_orc_roundtrip",
    oracle="""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def layout_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10: ORC interchange — the documents table written as ORC and
    read back must aggregate identically to the parquet original
    (format round-trip is lossless for longs/strings; ORC is the
    second columnar format a reference user's warehouse speaks, and
    Spark's reader gives it the same pushdown/pruning treatment —
    plan-checked in tests/test_layout.py)."""
    import tempfile

    d = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "source", "n_chars"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"rdps_orc_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    d.write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "q_expectations",
    oracle="""
    SELECT 'not_null:l_orderkey' AS rule,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'range:l_discount',
           CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'range:l_quantity',
           CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber',
           COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
    FROM lineitem
    UNION ALL
    SELECT 'foreign_key:l_orderkey', COUNT(*)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6+/K-tier: declarative data-quality expectations over lineitem
    — the errHandler generalized to row-level validation. All scalar
    rules (not-null, ranges) evaluate in ONE conditional-sum pass;
    uniqueness is one distinct-count agg; referential integrity one
    broadcast anti-join. The report (including zero-violation rows —
    absence of a rule row would hide a silently-skipped check) is
    value-hash gated (operators/expect.py)."""
    from rabbit_data_pipeline_spark.operators.expect import expectation_report

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    rules = [
        ("not_null", "l_orderkey"),
        ("range", "l_discount", 0.0, 0.08),
        ("range", "l_quantity", 1.0, 45.0),
        ("unique", ["l_orderkey", "l_linenumber"]),
        ("foreign_key", ["l_orderkey"], t["orders"], ["o_orderkey"]),
    ]
    return expectation_report(t["lineitem"], rules)
