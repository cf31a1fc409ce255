from arangodb_java_parquet_spark.sources.collections import (  # noqa: F401
    Collection,
    LocalCollection,
    ArangoCollectionSink,
)
from arangodb_java_parquet_spark.sources.loader import ParquetLoader  # noqa: F401
