"""COMPETING RISKS — the AALEN-JOHANSEN cumulative incidence
estimator (Aalen & Johansen 1978; Kalbfleisch & Prentice ch. 8) —
the multi-cause leg of the survival family beside Kaplan-Meier,
Nelson-Aalen, the log-rank test and the Weibull median-rank fit:
when churn can happen for MORE THAN ONE reason, 1−KM per cause
overestimates each cause's incidence (the classic competing-risks
fallacy); the AJ estimator allocates incidence correctly via

    CIF_k(t) = Σ_{s ≤ t}  S(s−) · d_{k,s} / n_s ,

with S the ALL-CAUSE KM survival evaluated just before each event
day.

Design (the KM entry's cohort conventions, event_analytics.py:949):
duration = whole days between a user's first and last event; users
whose last event falls in the final 2 hours are right-CENSORED;
cause 1 = the user's LAST event is an 'error' (churned in a broken
state), cause 2 = any other last event type (natural churn). The
last event is selected by a (ts, event_id)-desc window rank —
deterministic under ties.

Determinism ledger (all inherited from the KM recipe): S(s−) =
exp of the EXCLUSIVE-prefix exact-decimal running sum of round-9
ln(1 − d/n) terms, with the d = n absorbing-state fence carried as a
windowed flag; per-day CIF increments round(S(s−)·(d_k/n), 9) then
exact-decimal cumulative sums. Integer counts throughout; the only
rounds are the ln/exp pilot classes.

Scale: corpus-size work is ONE per-user min/max/last pass; the day
axis is bounded, so every window runs over a tiny frame. No driver
collect.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_CENSOR_US = 2 * 3600 * 1000000  # last-2-hours = still active

_AJ_SQL = f"""WITH b AS (
  SELECT epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS tmax FROM events
),
lastev AS (
  SELECT user_id, event_type AS last_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
),
life AS (
  SELECT e.user_id,
         (epoch_us(CAST(MAX(e.ts) AS TIMESTAMP))
          - epoch_us(CAST(MIN(e.ts) AS TIMESTAMP)))
           // 86400000000 AS dur,
         CASE WHEN epoch_us(CAST(MAX(e.ts) AS TIMESTAMP))
                   >= b.tmax - {_CENSOR_US} THEN 1 ELSE 0 END AS cens,
         CASE WHEN MAX(l.last_type) = 'error' THEN 1 ELSE 2 END
           AS cause
  FROM events e CROSS JOIN b
  JOIN lastev l ON e.user_id = l.user_id
  GROUP BY e.user_id, b.tmax
),
per_day AS (
  SELECT dur AS day,
         SUM(CASE WHEN cens = 0 AND cause = 1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN cens = 0 AND cause = 2 THEN 1 ELSE 0 END) AS d2,
         COUNT(*) AS ended
  FROM life GROUP BY dur
),
risk AS (
  SELECT day, d1, d2, d1 + d2 AS d,
         SUM(ended) OVER (ORDER BY day DESC) AS n_at_risk
  FROM per_day
),
km AS (
  SELECT day, d1, d2, d, n_at_risk,
         CASE WHEN d = n_at_risk THEN NULL
              ELSE ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk), 9)
         END AS lnterm,
         CASE WHEN d = n_at_risk THEN 1 ELSE 0 END AS iszero
  FROM risk WHERE d > 0
),
sprev AS (
  SELECT day, d1, d2, d, n_at_risk,
         CASE WHEN COALESCE(MAX(iszero) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) = 1 THEN CAST(0 AS DOUBLE)
              ELSE ROUND(exp(CAST(COALESCE(SUM(CAST(COALESCE(lnterm, 0)
                AS DECIMAL(20,9))) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS DOUBLE)), 9)
         END AS s_prev
  FROM km
),
inc AS (
  SELECT day, d1, d2, n_at_risk, s_prev,
         ROUND(s_prev * (CAST(d1 AS DOUBLE) / n_at_risk), 9) AS i1,
         ROUND(s_prev * (CAST(d2 AS DOUBLE) / n_at_risk), 9) AS i2
  FROM sprev
)
SELECT day AS churn_day,
       CAST(d1 AS BIGINT) AS d_error, CAST(d2 AS BIGINT) AS d_other,
       CAST(n_at_risk AS BIGINT) AS n_at_risk, s_prev,
       CAST(SUM(CAST(i1 AS DECIMAL(20,9)))
            OVER (ORDER BY day) AS DOUBLE) AS cif_error,
       CAST(SUM(CAST(i2 AS DECIMAL(20,9)))
            OVER (ORDER BY day) AS DOUBLE) AS cif_other
FROM inc
ORDER BY churn_day
"""


@query("survival_competing_risks", _AJ_SQL)
def survival_competing_risks(spark, sf_dir):
    """Aalen-Johansen CIFs for error-churn vs natural churn: per-user
    last-event classification, the KM ln-space running product for
    S(s-), and decimal-exact cumulative incidence sums."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = e.agg(F.max(us).alias("tmax"))
    wlast = W.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    lastev = (e.withColumn("rn", F.row_number().over(wlast))
              .filter(F.col("rn") == 1)
              .select("user_id",
                      F.col("event_type").alias("last_type")))
    life = (e.crossJoin(F.broadcast(b))
            .join(lastev, "user_id")
            .groupBy("user_id", "tmax")
            .agg(F.min(us).alias("f"), F.max(us).alias("l"),
                 F.max("last_type").alias("lt"))
            .select(F.expr("(l - f) div 86400000000").alias("dur"),
                    F.when(F.col("l") >= F.col("tmax") - _CENSOR_US,
                           1).otherwise(0).alias("cens"),
                    F.when(F.col("lt") == "error", 1).otherwise(2)
                    .alias("cause")))
    per_day = (life.groupBy(F.col("dur").alias("day"))
               .agg(F.sum(F.when((F.col("cens") == 0)
                                 & (F.col("cause") == 1), 1)
                          .otherwise(0)).alias("d1"),
                    F.sum(F.when((F.col("cens") == 0)
                                 & (F.col("cause") == 2), 1)
                          .otherwise(0)).alias("d2"),
                    F.count(F.lit(1)).alias("ended")))
    wdesc = W.orderBy(F.desc("day")).rowsBetween(
        W.unboundedPreceding, W.currentRow)
    risk = per_day.select(
        "day", "d1", "d2", (F.col("d1") + F.col("d2")).alias("d"),
        F.sum("ended").over(wdesc).alias("n_at_risk"))
    km = (risk.filter(F.col("d") > 0)
          .select("day", "d1", "d2", "d", "n_at_risk",
                  F.when(F.col("d") == F.col("n_at_risk"), None)
                  .otherwise(F.round(F.log(
                      F.lit(1.0) - F.col("d").cast("double")
                      / F.col("n_at_risk")), 9)).alias("lnterm"),
                  F.when(F.col("d") == F.col("n_at_risk"), 1)
                  .otherwise(0).alias("iszero")))
    wexc = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    s_prev = (F.when(
        F.coalesce(F.max("iszero").over(wexc), F.lit(0)) == 1,
        F.lit(0.0))
        .otherwise(F.round(F.exp(
            F.coalesce(
                F.sum(F.coalesce(F.col("lnterm"), F.lit(0.0))
                      .cast("decimal(20,9)")).over(wexc),
                F.lit(0).cast("decimal(20,9)")).cast("double")), 9)))
    inc = km.select(
        "day", "d1", "d2", "n_at_risk", s_prev.alias("s_prev"))
    inc = inc.select(
        "day", "d1", "d2", "n_at_risk", "s_prev",
        F.round(F.col("s_prev")
                * (F.col("d1").cast("double") / F.col("n_at_risk")),
                9).alias("i1"),
        F.round(F.col("s_prev")
                * (F.col("d2").cast("double") / F.col("n_at_risk")),
                9).alias("i2"))
    winc = W.orderBy("day").rowsBetween(W.unboundedPreceding,
                                        W.currentRow)
    return (inc.select(
        F.col("day").alias("churn_day"),
        F.col("d1").cast("bigint").alias("d_error"),
        F.col("d2").cast("bigint").alias("d_other"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        "s_prev",
        F.sum(F.col("i1").cast("decimal(20,9)")).over(winc)
        .cast("double").alias("cif_error"),
        F.sum(F.col("i2").cast("decimal(20,9)")).over(winc)
        .cast("double").alias("cif_other"))
        .orderBy("churn_day"))
