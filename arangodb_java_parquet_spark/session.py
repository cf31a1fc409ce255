"""SparkSession factory with defaults tuned for both local testing and
100 TB-scale posture (AQE on, UTC timestamps, Arrow enabled).

Scale notes: every default here is either neutral or beneficial on a real
multi-executor cluster. ``spark.sql.shuffle.partitions`` is sized for the
local harness; on a 1000-executor cluster AQE's coalescePartitions +
``spark.sql.adaptive.advisoryPartitionSizeInBytes`` make the static number
mostly irrelevant (it only caps the initial shuffle fan-out).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "arangodb_java_parquet_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Env knobs (driver contract): ``SPARK_GRAFT_CPUS`` sets local parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        # AQE: runtime coalescing, join-strategy switching, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-UDF path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Keep stdout clean for one-line-JSON consumers (bench driver tails
        # the last few KB of output; progress bars would eat that buffer).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
