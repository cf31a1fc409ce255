"""arangodb_java_parquet_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ArangoDB-Community/arangodb-java-parquet.

The reference (at /root/reference, v0.1) is a single-purpose Parquet -> ArangoDB
bulk loader: scan(parquet) -> encode(row->JSON) -> batch(n) -> sink(insert).
This package re-expresses that pipeline Spark-first (distributed scan, Column
expression encoding, partition-parallel batched sink) and extends it with the
relational + LLM-data-pipeline operator surface documented in SURVEY.md §2/§7.

Layout:
  session     — SparkSession factory with scale-sane defaults
  sources     — collection sinks (local JSONL / ArangoDB) + loader (reference parity)
  functions   — document-JSON encoding, text analysis, similarity primitives
  operators   — relational + dedup/similarity operator implementations
  queries     — the declared query inventory (Spark impl + DuckDB oracle SQL)
  streaming   — structured-streaming ingest into collection sinks
  plans       — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"

from arangodb_java_parquet_spark.session import get_spark  # noqa: F401
