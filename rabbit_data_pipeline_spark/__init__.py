"""PySpark-native analytics/ETL engine with the capabilities of
amuluowin/rabbit-data-pipeline, re-expressed Spark-first.

The reference (PHP, /root/reference) is a plugin-based streaming ETL
framework: YAML task configs declare DAGs of source → transform → sink
plugins exchanging ``Message`` payloads. Here every capability is a
lazy DataFrame transformation; a pipeline compiles to ONE Catalyst plan
per sink so pushdown/pruning/broadcast decisions span the whole DAG.
"""

from rabbit_data_pipeline_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
