"""Temporal query inventory: range join, as-of join, tumbling window
aggregation, sessionization — the time-series surface a training-data /
event pipeline needs (SURVEY.md §2.2 joins row: range/as-of; §7 phase 4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.operators.temporal import asof_join, sessionize
from arangodb_java_parquet_spark.queries.common import dsum, query, sql_dsum, t


@query("join_range_interval", f"""
SELECT l.l_orderkey, o.o_orderkey, COUNT(*) AS n_lines,
       {sql_dsum('l.l_extendedprice')} AS total_price
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_orderkey, o.o_orderkey
""")
def join_range_interval(spark, sf_dir):
    """Equi + range (interval) join: lineitems shipped within 60 days of the
    order date. The equi key carries the shuffle; the range predicate is a
    post-join filter — the scalable shape for equi+range conditions."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = ((li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    return (li.join(o, cond)
            .groupBy("l_orderkey", "o_orderkey")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 dsum("l_extendedprice").alias("total_price")))


@query("join_asof_backward", """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT MAX(o.o_orderdate) FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
       AS asof_o_orderdate
FROM events e
""")
def join_asof_backward(spark, sf_dir):
    """As-of join (backward): latest order at-or-before each event, per user.

    Uses the union+window formulation from operators/temporal.py — one
    shuffle, no cross-match materialization (see its docstring for the
    100 TB argument)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(e, o, on="user_id", right_on="o_custkey",
                     left_time="ts", right_time="o_orderdate",
                     value_cols=["o_orderdate"]
                     ).select("event_id", "user_id", "ts", "asof_o_orderdate")


@query("join_asof_forward", """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT MIN(o.o_orderdate) FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
       AS asof_o_orderdate
FROM events e
""")
def join_asof_forward(spark, sf_dir):
    """As-of join (forward): earliest order at-or-after each event, per
    user — same one-shuffle union+window formulation with a following
    frame (operators/temporal.py)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(e, o, on="user_id", right_on="o_custkey",
                     left_time="ts", right_time="o_orderdate",
                     value_cols=["o_orderdate"], direction="forward"
                     ).select("event_id", "user_id", "ts", "asof_o_orderdate")


@query("join_asof_nearest", """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT o.o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id
        ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                     - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))),
                 o.o_orderdate
        LIMIT 1)
       AS asof_o_orderdate
FROM events e
""")
def join_asof_nearest(spark, sf_dir):
    """As-of join (nearest): the time-closest order per event, ties to the
    earlier (backward) side — one shuffle, both direction passes over the
    same exchange (operators/temporal.py). Oracle: per-event ORDER BY
    absolute distance with the date as tiebreak (earlier date == backward
    preference)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(e, o, on="user_id", right_on="o_custkey",
                     left_time="ts", right_time="o_orderdate",
                     value_cols=["o_orderdate"], direction="nearest"
                     ).select("event_id", "user_id", "ts", "asof_o_orderdate")


@query("window_tumbling_agg", f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""")
def window_tumbling_agg(spark, sf_dir):
    """Tumbling 1-hour event-time windows (batch form of the streaming
    windowed agg; streaming/ runs the same plan incrementally)."""
    e = t(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").start.alias("win_start"),
                      "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("sum_value")))


@query("join_asof_tolerance", """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT MAX(o.o_orderdate) FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          AND CAST(o.o_orderdate AS TIMESTAMP)
              >= CAST(e.ts AS TIMESTAMP) - INTERVAL 7 DAY)
       AS asof_o_orderdate
FROM events e
""")
def join_asof_tolerance(spark, sf_dir):
    """As-of join with max staleness (pandas merge_asof tolerance): the
    latest order at-or-before each event, but only if within 7 days —
    older matches are masked to NULL. The tolerance is a post-match mask
    on the one-shuffle union+window plan (operators/temporal.py), not an
    extra join."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(e, o, on="user_id", right_on="o_custkey",
                     left_time="ts", right_time="o_orderdate",
                     value_cols=["o_orderdate"],
                     tolerance_seconds=7 * 86400
                     ).select("event_id", "user_id", "ts", "asof_o_orderdate")


@query("window_hopping_agg", f"""
SELECT time_bucket(INTERVAL '30 minutes', ts)
         - u.k * INTERVAL '30 minutes' AS win_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events, (SELECT UNNEST(range(0, 2)) AS k) u
GROUP BY 1, 2
""")
def window_hopping_agg(spark, sf_dir):
    """Hopping (sliding) event-time windows: 1-hour windows every 30
    minutes — each event lands in exactly 2 overlapping windows
    (``F.window(ts, size, slide)``; the streaming form is the same
    expression under readStream). The oracle reproduces the window
    assignment by exploding each event into its size/slide bucket
    offsets — both engines' 30-minute buckets are epoch-aligned."""
    e = t(spark, sf_dir, "events")
    return (e.groupBy(
        F.window("ts", "1 hour", "30 minutes").start.alias("win_start"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value").alias("sum_value")))


@query("events_enriched_by_segment", f"""
SELECT c.c_mktsegment AS segment, e.event_type,
       COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
""")
def events_enriched_by_segment(spark, sf_dir):
    """Dimension enrichment of the event stream (batch twin of the
    stream-static broadcast join in streaming/): events ⋈ broadcast
    customer, aggregated by segment × type."""
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return (e.join(F.broadcast(c), e.user_id == c.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("sum_value")))


@query("agg_salted_skew", f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events
GROUP BY event_type
""")
def agg_salted_skew(spark, sf_dir):
    """Skew-resistant aggregation over the genuinely-skewed event_type key
    (5 hot keys): salted two-stage agg (operators/skew.py), value-checked
    against the plain GROUP BY oracle — salting must not change results."""
    from arangodb_java_parquet_spark.operators.skew import salted_agg
    e = t(spark, sf_dir, "events")
    dec = "decimal(30,8)"
    return salted_agg(
        e, key="event_type", salt_src="event_id", n_salts=16,
        aggs={
            "n_events": ("event_id", F.count, F.sum),
            "sum_value": ("value",
                          lambda c: F.sum(c.cast(dec)),
                          lambda c: F.sum(c).cast("double")),
            "max_value": ("value",
                          lambda c: F.max(c),
                          lambda c: F.max(c).cast("double")),
        })


@query("sessionize_events", """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts,
       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS session_seq
FROM flagged
""")
def sessionize_events(spark, sf_dir):
    """Sessionization with a 30-minute inactivity gap (lag + cumulative
    boundary flags; one shuffle on user_id)."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return (sessionize(e, key="user_id", time="ts", gap=F.lit(1800.0),
                       tiebreak=["event_id"])
            .select("user_id", "event_id", "ts", "session_seq"))
