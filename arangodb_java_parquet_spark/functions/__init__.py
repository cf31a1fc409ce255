from arangodb_java_parquet_spark.functions.docjson import encode_documents  # noqa: F401
