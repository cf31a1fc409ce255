"""Declared query inventory: every operator from SURVEY.md §2 gets a named
entry with (a) a Spark implementation ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent ANSI-SQL DuckDB oracle string.

Determinism contract (the driver hash-compares values): floating-point
aggregates are computed as exact DECIMAL sums and only then cast to DOUBLE,
so result values are bit-identical between Spark and DuckDB regardless of
partitioning / aggregation order. See queries/common.py.
"""

from arangodb_java_parquet_spark.queries.common import QUERIES, ORACLES  # noqa: F401
# Importing the modules registers their queries. Registration order is
# verification order for budgeted harnesses: the core relational surface
# and the LLM-pipeline flagships (dedup / curation / similarity — the
# north-star operators) register FIRST so a time-budgeted driver run
# records them; window/scalar breadth next; the streaming / rows-only
# entries (advanced) last, so budget is never burned on streaming-drive
# fixed costs before the value-checked inventory is covered.
from arangodb_java_parquet_spark.queries import relational  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import relational2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import relational3  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import text_pipeline  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import curation  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import text_pipeline2  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import similarity  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import temporal  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import event_analytics  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import partsupp_shapes  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import windows  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import subqueries  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import profiling  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import scalar_extra  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import advanced  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import ir_analytics  # noqa: F401,E402
from arangodb_java_parquet_spark.queries import lifecycle  # noqa: F401,E402
