from arangodb_java_parquet_spark.operators.temporal import asof_join  # noqa: F401
