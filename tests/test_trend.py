"""Behavioral tests for the trend/stat operators — the oracle pins
cross-engine values; these pin that the statistics MEAN something."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import QUERIES


def test_cusum_detects_planted_level_shift(spark):
    """On a series that jumps from level 10 to level 50 at day 30, the
    CUSUM peak must land exactly on the shift boundary."""
    rows = [(f"2024-01-{d:02d}" if d <= 31 else f"2024-02-{d-31:02d}",
             10.0 if d <= 30 else 50.0) for d in range(1, 60)]
    daily = spark.createDataFrame(rows, ["day_s", "rev"]) \
        .select(F.col("day_s").cast("date").alias("day"), "rev")
    stats = daily.agg(F.sum("rev").alias("total"),
                      F.count(F.lit(1)).alias("n"))
    dev = F.round(F.col("rev") - F.col("total") / F.col("n"), 6)
    cusum = (daily.crossJoin(F.broadcast(stats))
             .withColumn("s", F.sum(dev.cast("decimal(30,6)")).over(
                 W.orderBy("day").rowsBetween(W.unboundedPreceding, 0))))
    peak = (cusum.orderBy(F.desc(F.abs(F.col("s"))), F.asc("day"))
            .first())
    assert str(peak["day"]) == "2024-01-30"


def test_bootstrap_ci_sane(spark, sf_dir):
    r = QUERIES["bootstrap_poisson_ci"](spark, sf_dir).first()
    assert r.n_resamples == 64
    assert r.ci_low <= r.ci_mid <= r.ci_high
    # interval should bracket the plain mean of daily revenue
    from arangodb_java_parquet_spark.queries.common import dsum, t
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(dsum("o_totalprice").alias("rev")))
    mean = daily.agg(F.avg("rev")).first()[0]
    assert r.ci_low <= mean <= r.ci_high


def test_attribution_last_touch_handcrafted(spark):
    """view, click, purchase, purchase, view, purchase timeline: first
    purchase credits click; second credits click (still the latest
    non-purchase); third credits the later view."""
    from datetime import datetime

    from arangodb_java_parquet_spark.queries.common import QUERIES  # noqa
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view"),
        (1, datetime(2024, 1, 1, 10, 5), 2, "click"),
        (1, datetime(2024, 1, 1, 10, 9), 3, "purchase"),
        (1, datetime(2024, 1, 1, 10, 20), 4, "purchase"),
        (1, datetime(2024, 1, 1, 11, 0), 5, "view"),
        (1, datetime(2024, 1, 1, 11, 30), 6, "purchase"),
        (2, datetime(2024, 1, 1, 9, 0), 7, "purchase"),  # no prior touch
    ]
    e = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True).over(w)
    got = {(r.user_id, r.event_id): r.attributed for r in
           e.select("user_id", "event_id", "event_type",
                    F.coalesce(touch, F.lit("none")).alias("attributed"))
           .filter(F.col("event_type") == "purchase").collect()}
    assert got == {(1, 3): "click", (1, 4): "click", (1, 6): "view",
                   (2, 7): "none"}


def test_drift_zero_between_identical_halves(spark):
    """Identical vectors in both halves -> zero L2 drift, cosine 1."""
    rows = [(i, [0.5, -0.25, 0.125, 1.0], i % 3) for i in range(20)]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    dims = (e.select("label", (F.col("vec_id") % 2).alias("half"),
                     F.posexplode("embedding").alias("p0", "v"))
            .select("label", "half", (F.col("p0") + 1).alias("dim"),
                    F.col("v").cast("double").alias("v")))
    means = (dims.groupBy("label", "half", "dim")
             .agg((F.sum(F.round("v", 9).cast("decimal(20,9)"))
                   .cast("double") / F.count(F.lit(1))).alias("m")))
    a = means.filter(F.col("half") == 0).select(
        "label", "dim", F.col("m").alias("ma"))
    b = means.filter(F.col("half") == 1).select(
        "label", "dim", F.col("m").alias("mb"))
    for r in a.join(b, ["label", "dim"]).collect():
        assert r.ma == r.mb
