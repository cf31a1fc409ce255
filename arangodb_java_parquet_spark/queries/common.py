"""Shared helpers for the query inventory.

Key design decision — deterministic float aggregation: double summation is
not associative, so a Spark parallel sum and a DuckDB sum can differ in the
last ulps and fail a value-hash comparison. Every SUM/AVG over doubles in
this inventory therefore casts its (per-row, IEEE-deterministic) operand to
DECIMAL, sums exactly, and casts the final value to DOUBLE — identical bits
in any engine and under any partitioning. This is also the right call at
100 TB: decimal partial aggregation is still map-side combinable and avoids
run-to-run drift in reported metrics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Materialization policy (local localCheckpoint vs cluster-reliable
# checkpoint/persist) — see arangodb_java_parquet_spark/materialize.py.
# Re-exported here because nearly every query module already imports
# from queries.common.
from arangodb_java_parquet_spark.materialize import (  # noqa: F401
    materialize, materialize_iter, materialize_iter_eager,
    materialize_scalar)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def scratch_dir(prefix: str) -> str:
    """A mkdtemp registered for atexit cleanup. Query callables that
    materialize sink/checkpoint state (loader round-trips, streaming
    drives) need a directory that OUTLIVES lazy evaluation of the
    DataFrame they return — the driver/harness may collect it long after
    the callable exits — but must not leak a copy of the dataset into
    /tmp on every harness/bench invocation (round-4 ADVICE). atexit
    bounds the lifetime to the process."""
    import atexit
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle."""
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver tables (parquet scan; Catalyst prunes/pushes).

    Normalizations for oracle-comparable semantics regardless of the calling
    session's defaults:
      * session time zone pinned to UTC (DuckDB timestamps are UTC-naive);
      * the events table is written with TIMESTAMP(NANOS) which Spark's
        vectorized reader rejects — read nanos as long
        (spark.sql.legacy.parquet.nanosAsLong) and convert to
        TIMESTAMP_NTZ micros (sub-microsecond parts are zero in this corpus;
        `div` keeps the arithmetic integer-exact).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- deterministic numeric aggregation --------------------------------------

def dsum(col: Column | str, scale: int = 8) -> Column:
    """Exact decimal sum of a double expression, returned as DOUBLE.

    Scale 8 so that typical money-arithmetic products (2+2+2 decimal digits)
    are exactly representable — the cast then snaps the double to the true
    value identically in every engine, with no rounding-mode sensitivity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 8) -> Column:
    """Deterministic average: exact decimal sum cast to double, / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 8) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 8) -> str:
    return (f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"
            f" / COUNT({expr})")
