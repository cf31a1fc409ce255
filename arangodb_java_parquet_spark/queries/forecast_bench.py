"""Naive forecasting benchmarks (wave r12q).

Every forecast in the registry (Holt, Holt-Winters, EWMA, the trend
entries) is only as good as its margin over the three free benchmarks:
NAIVE (carry the last training value forward), SEASONAL NAIVE (repeat
the value from 7 days earlier), and DRIFT (the line through the first
and last training points). Hyndman's standard practice — and the MASE
entry's very definition — is to report these on the SAME holdout; a
model that cannot beat snaive-7 has learned nothing about the week.

Determinism: daily counts are integers, so naive and seasonal-naive
residuals (and their squares) are EXACT integers summed as bigints;
only the drift leg's rational-slope residuals need the round-9/round-6
decimal fences. One daily rollup; three combinable legs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

_FNB_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
rk AS (
  SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS nd,
         LAG(y, 7) OVER (ORDER BY d) AS y_lag7
  FROM daily
),
anchor AS (
  SELECT MAX(CASE WHEN rn = nd // 2 THEN y END) AS y_last,
         MAX(CASE WHEN rn = 1 THEN y END) AS y_first,
         CAST(MAX(nd) // 2 AS BIGINT) AS n_train
  FROM rk
),
hold AS (
  SELECT r.rn, r.y, r.y_lag7, a.y_last, a.y_first, a.n_train,
         a.y_last + (r.rn - a.n_train)
           * ((a.y_last - a.y_first) / CAST(a.n_train - 1 AS DOUBLE))
           AS drift_hat
  FROM rk r CROSS JOIN anchor a
  WHERE r.rn > a.n_train
)
SELECT 'naive' AS method, CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(ABS(y - y_last)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
         AS mae,
       sqrt(CAST(SUM((y - y_last) * (y - y_last)) AS BIGINT)
            / CAST(COUNT(*) AS DOUBLE)) AS rmse
FROM hold
UNION ALL
SELECT 'snaive_7', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(ABS(y - y_lag7)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE),
       sqrt(CAST(SUM((y - y_lag7) * (y - y_lag7)) AS BIGINT)
            / CAST(COUNT(*) AS DOUBLE))
FROM hold WHERE y_lag7 IS NOT NULL
UNION ALL
SELECT 'drift', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(ABS(y - drift_hat), 9) AS DECIMAL(30,9)))
            AS DOUBLE) / COUNT(*),
       sqrt(CAST(SUM(CAST(ROUND((y - drift_hat) * (y - drift_hat), 6)
                          AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
FROM hold
"""


@query("forecast_naive_benchmarks", _FNB_SQL)
def forecast_naive_benchmarks(spark, sf_dir):
    """NAIVE FORECAST BENCHMARKS (Hyndman & Athanasopoulos, FPP):
    MAE and RMSE on the second-half holdout of the daily order-count
    series for the three free methods every model must beat — NAIVE
    (last training value, frozen), SEASONAL NAIVE (the actual value 7
    days earlier, the rolling weekly memory), and DRIFT (the
    first-to-last training line). These are the denominators that make
    the Holt / Holt-Winters / EWMA entries' errors interpretable (the
    same role the in-sample naive scale plays inside MASE). Counts are
    integers, so the naive and snaive residual sums — absolute AND
    squared — are EXACT bigints with no fences; the drift leg's
    rational-slope residuals are round-9/round-6 fenced decimal sums.
    One daily rollup + one lag window; three combinable legs over the
    tiny holdout."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    wd = W.orderBy("d")
    rk = (daily.select(
        "d", "y", F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("nd"),
        F.lag("y", 7).over(wd).alias("y_lag7"))
        .transform(materialize))  # feeds the anchor + the holdout
    anchor = rk.agg(
        F.max(F.when(F.col("rn") == F.expr("nd div 2"), F.col("y")))
        .alias("y_last"),
        F.max(F.when(F.col("rn") == 1, F.col("y"))).alias("y_first"),
        F.expr("CAST(max(nd) div 2 AS BIGINT)").alias("n_train"))
    drift_hat = (F.col("y_last")
                 + (F.col("rn") - F.col("n_train"))
                 * ((F.col("y_last") - F.col("y_first"))
                    / (F.col("n_train") - 1).cast("double")))
    hold = (rk.crossJoin(F.broadcast(anchor))
            .filter(F.col("rn") > F.col("n_train"))
            .select("rn", "y", "y_lag7", "y_last", "y_first", "n_train",
                    drift_hat.alias("drift_hat")))
    naive = hold.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        (F.sum(F.abs(F.col("y") - F.col("y_last"))).cast("bigint")
         / F.count(F.lit(1)).cast("double")).alias("mae"),
        F.sqrt(F.sum((F.col("y") - F.col("y_last"))
                     * (F.col("y") - F.col("y_last"))).cast("bigint")
               / F.count(F.lit(1)).cast("double")).alias("rmse")).select(
        F.lit("naive").alias("method"), "n_test", "mae", "rmse")
    snaive = (hold.filter(F.col("y_lag7").isNotNull())
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"),
                   (F.sum(F.abs(F.col("y") - F.col("y_lag7")))
                    .cast("bigint")
                    / F.count(F.lit(1)).cast("double")).alias("mae"),
                   F.sqrt(F.sum((F.col("y") - F.col("y_lag7"))
                                * (F.col("y") - F.col("y_lag7")))
                          .cast("bigint")
                          / F.count(F.lit(1)).cast("double"))
                   .alias("rmse"))
              .select(F.lit("snaive_7").alias("method"), "n_test",
                      "mae", "rmse"))
    dresid = F.col("y") - F.col("drift_hat")
    drift = hold.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        (F.sum(F.round(F.abs(dresid), 9).cast("decimal(30,9)"))
         .cast("double") / F.count(F.lit(1))).alias("mae"),
        F.sqrt(F.sum(F.round(dresid * dresid, 6).cast("decimal(30,6)"))
               .cast("double") / F.count(F.lit(1))).alias("rmse")).select(
        F.lit("drift").alias("method"), "n_test", "mae", "rmse")
    return naive.unionAll(snaive).unionAll(drift)
