from rabbit_data_pipeline_spark.sources import files, http, sql, stream  # noqa: F401
