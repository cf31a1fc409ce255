from arangodb_java_parquet_spark.streaming.ingest import (  # noqa: F401
    stream_load_to_collection,
    windowed_event_counts,
)
