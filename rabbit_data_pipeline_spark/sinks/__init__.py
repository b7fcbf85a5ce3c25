from rabbit_data_pipeline_spark.sinks import console, files, sql, stream  # noqa: F401
