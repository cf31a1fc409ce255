"""Window-function inventory (SURVEY.md §2.2 "Window functions"): ranking
(row_number/rank/dense_rank), analytic (lag/lead), aggregate windows with
row frames (running totals, moving averages), top-k per group, ntile.

Every window ORDER BY includes a unique tiebreak key so results are
deterministic for the oracle hash (and reproducible run to run — the same
discipline you want in production pipelines).

Scale: a window over partitionBy(k) is one shuffle on k; frames evaluate
streaming within each sorted partition. Skewed partition keys are the main
risk at 100 TB — customer keys here are near-uniform; for skewed data the
top-k-per-group pattern switches to the (salted agg → merge) variant.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t


@query("window_rank_topk_per_group", """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
""")
def window_rank_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer via ranking windows (the scalable top-k-per-
    group idiom: no global sort, one shuffle on the partition key)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (o.select("o_custkey", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).alias("rn"),
                     F.rank().over(w).alias("rnk"),
                     F.dense_rank().over(w).alias("drnk"))
            .filter(F.col("rn") <= 3))


@query("window_running_total", """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS moving_sum_3
FROM orders
""")
def window_running_total(spark, sf_dir):
    """Running total + 3-row moving sum (ROWS frames), decimal-exact."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(30,4)")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(price_dec).over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double").alias("running_total"),
        F.sum(price_dec).over(w.rowsBetween(-2, 0))
        .cast("double").alias("moving_sum_3"))


@query("window_lag_lead", """
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       o_totalprice - LAG(o_totalprice) OVER w AS delta_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
def window_lag_lead(spark, sf_dir):
    """LAG/LEAD analytic functions; per-row double subtraction is IEEE-
    deterministic so no decimal dance is needed."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w))
        .alias("delta_price"))


@query("window_range_frame", """
SELECT o_custkey, o_orderkey, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
         AS n_similar_priced
FROM orders
""")
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based window): peers within ±1000 of each order's
    price — the frame other engines call a band join per row."""
    o = t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_totalprice")
         .rangeBetween(-1000, 1000))
    return o.select("o_custkey", "o_orderkey", "o_totalprice",
                    F.count(F.lit(1)).over(w).alias("n_similar_priced"))


@query("window_rank_distribution", """
SELECT o_custkey, o_orderkey,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(NTILE(10) OVER w AS INT) AS decile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""")
def window_rank_distribution(spark, sf_dir):
    """PERCENT_RANK / CUME_DIST / NTILE distribution functions (exact
    rational values — deterministic across engines)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).alias("decile"))


@query("window_ntile_first_last", """
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
""")
def window_ntile_first_last(spark, sf_dir):
    """NTILE bucketing + FIRST/LAST_VALUE over full-partition frames."""
    o = t(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
              .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return o.select(
        "o_custkey", "o_orderkey",
        F.ntile(4).over(w_price).alias("quartile"),
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"))


@query("window_distinct_in_frame", """
SELECT event_id, user_id,
       len(list_distinct(list(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))) AS n_distinct_types
FROM events
""")
def window_distinct_in_frame(spark, sf_dir):
    """DISTINCT aggregation inside a window frame — not natively
    supported by either engine's COUNT(DISTINCT) OVER: expressed as
    size(collect_set) over the ROWS frame (Spark) == len(list_distinct
    (list)) over the same frame (DuckDB). Per-user frames of <= 5 rows
    bound the set state; the behavioral-variety signal behind bot/fraud
    heuristics."""
    e = t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, W.currentRow))
    return e.select(
        "event_id", "user_id",
        F.size(F.collect_set("event_type").over(w))
        .alias("n_distinct_types"))


@query("window_time_range_frame", """
WITH e AS (
  SELECT user_id, event_id, ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
  FROM events
)
SELECT user_id, event_id, ts,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)
         AS sum_last_hour
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def window_time_range_frame(spark, sf_dir):
    """Event-time RANGE frame (vs ROWS): everything a user did in the
    TRAILING HOUR of each event, however many rows that is — the frame
    semantics sliding-window features need (a ROWS frame would cap the
    lookback by count, not time). Ordered by exact epoch micros so both
    engines share a numeric RANGE key; exact-decimal sum inside the
    frame."""
    e = (t(spark, sf_dir, "events")
         .select("user_id", "event_id", "ts", "value",
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("ts_us")))
    w = (W.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, W.currentRow))
    return e.select(
        "user_id", "event_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(30,8)")).over(w).cast("double")
        .alias("sum_last_hour"))
