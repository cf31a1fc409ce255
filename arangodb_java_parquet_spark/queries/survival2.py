"""Nelson-Aalen cumulative hazard + Bland-Altman agreement (wave r12n).

NELSON-AALEN is the cumulative-HAZARD twin of the Kaplan-Meier survival
estimator already in the registry: H(t) = sum d_s/n_s needs no log/exp
machinery at all (every term is an exact rational), has better
small-risk-set behavior, and its slope reads off the hazard RATE — the
churn-acceleration signal KM's survival curve hides. The
Fleming-Harrington survival exp(-H) is emitted beside it for direct
comparison with the KM column. BLAND-ALTMAN (1986) limits of agreement
ask whether two MEASUREMENT METHODS of the same quantity can be used
interchangeably — here the chars/5 token-count proxy vs the real
whitespace token count, exactly the calibration question before
substituting the cheap estimator in a token-budget plan (a correlation
says they're related; Bland-Altman says how far apart they get).

Determinism: the hazard terms are round-9-fenced exact rationals summed
by one exact-decimal running window (the KM recipe, minus its ln/exp
legs); Bland-Altman moments ride the integer e = n_chars - 5*tokens, so
bias/limits are straight-line IEEE and the outside-count compares exact
integers against identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t
from arangodb_java_parquet_spark.queries.event_analytics import (
    _KM_CENSOR_US)

# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (right-censored, KM's censoring rule)
# ---------------------------------------------------------------------------

# shared prefix: per-user (duration, censored) lifetimes under the KM
# censoring rule — composed by Nelson-Aalen and the Weibull fit
_LIFE_SQL = f"""
WITH b AS (SELECT epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS tmax FROM events),
life AS (
  SELECT user_id,
         (epoch_us(CAST(MAX(ts) AS TIMESTAMP))
          - epoch_us(CAST(MIN(ts) AS TIMESTAMP))) // 86400000000 AS dur,
         CASE WHEN epoch_us(CAST(MAX(ts) AS TIMESTAMP))
                   >= b.tmax - {_KM_CENSOR_US} THEN 1 ELSE 0 END AS cens
  FROM events CROSS JOIN b GROUP BY user_id, b.tmax
)"""

_NA_SQL = _LIFE_SQL + """,
per_day AS (
  SELECT dur AS day, CAST(SUM(1 - cens) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS ended
  FROM life GROUP BY dur
),
risk AS (
  SELECT day, d,
         CAST(SUM(ended) OVER (ORDER BY day DESC) AS BIGINT) AS n_at_risk
  FROM per_day
),
na AS (
  SELECT day, d, n_at_risk,
         CAST(SUM(CAST(ROUND(d / CAST(n_at_risk AS DOUBLE), 9)
                       AS DECIMAL(20,9))) OVER (ORDER BY day)
              AS DOUBLE) AS cum_hazard
  FROM risk WHERE d > 0
)
SELECT day AS churn_day, d AS n_churned, n_at_risk, cum_hazard,
       ROUND(exp(-cum_hazard), 9) AS fh_survival
FROM na
"""


def _life(spark, sf_dir):
    """Spark twin of _LIFE_SQL: per-user (user_id, dur, cens) lifetimes
    under the KM censoring rule — the ONE source of truth consumed by
    Nelson-Aalen and the Weibull fit (review r13: the two entries
    previously carried hand-copied lineages that could silently
    diverge)."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = e.agg(F.max(us).alias("tmax"))
    return (e.crossJoin(F.broadcast(b))
            .groupBy("user_id", "tmax")
            .agg(F.min(us).alias("f"), F.max(us).alias("l"))
            .select("user_id",
                    F.expr("(l - f) div 86400000000").alias("dur"),
                    F.when(F.col("l") >= F.col("tmax") - _KM_CENSOR_US, 1)
                    .otherwise(0).alias("cens")))


@query("survival_nelson_aalen", _NA_SQL)
def survival_nelson_aalen(spark, sf_dir):
    """NELSON-AALEN cumulative hazard (Nelson 1972, Aalen 1978):
    H(t) = sum over churn days s<=t of d_s/n_s under the SAME
    right-censoring rule as the Kaplan-Meier entry (last-2-hours
    users are censored), plus the Fleming-Harrington survival
    exp(-H) — the hazard-space twin whose SLOPE is the churn rate
    (KM's survival curve integrates it away) and which never needs a
    zero-guard (KM's d = n day collapses S to 0; H just adds 1).
    Every hazard increment is an exact rational round-9 fenced into
    ONE exact-decimal running-sum window over the bounded day axis;
    at-risk counts are the KM descending running sum; the corpus-
    sized work is one per-user min/max pass. fh_survival is round-9
    exp of a fenced value (the piloted-safe exp rule)."""
    life = _life(spark, sf_dir)
    per_day = (life.groupBy(F.col("dur").alias("day"))
               .agg(F.sum(1 - F.col("cens")).cast("bigint").alias("d"),
                    F.count(F.lit(1)).cast("bigint").alias("ended")))
    risk = per_day.select(
        "day", "d",
        F.sum("ended").over(W.orderBy(F.desc("day"))
                            .rowsBetween(W.unboundedPreceding,
                                         W.currentRow))
        .cast("bigint").alias("n_at_risk"))
    na = (risk.filter(F.col("d") > 0)
          .select("day", "d", "n_at_risk",
                  F.sum(F.round(F.col("d")
                                / F.col("n_at_risk").cast("double"), 9)
                        .cast("decimal(20,9)"))
                  .over(W.orderBy("day").rowsBetween(
                      W.unboundedPreceding, W.currentRow))
                  .cast("double").alias("cum_hazard")))
    return na.select(
        F.col("day").alias("churn_day"), F.col("d").alias("n_churned"),
        "n_at_risk", "cum_hazard",
        F.round(F.exp(-F.col("cum_hazard")), 9).alias("fh_survival"))


# ---------------------------------------------------------------------------
# Bland-Altman limits of agreement: chars/5 proxy vs real token count
# ---------------------------------------------------------------------------

_BA_SQL = """
WITH e AS (
  SELECT CAST(n_chars AS BIGINT)
           - 5 * CAST(len(string_split(text, ' ')) AS BIGINT) AS e5
  FROM documents
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(e5) AS BIGINT) AS s1,
         CAST(SUM(e5 * e5) AS BIGINT) AS s2
  FROM e
),
st AS (
  SELECT n, s1 / CAST(n AS DOUBLE) AS me,
         sqrt((s2 - s1 / CAST(n AS DOUBLE) * s1) / (n - 1)) AS sde
  FROM m
),
lim AS (
  SELECT n, me, sde,
         me - (CAST(196 AS DOUBLE) / 100) * sde AS lo_e,
         me + (CAST(196 AS DOUBLE) / 100) * sde AS hi_e
  FROM st
),
outside AS (
  SELECT CAST(SUM(CASE WHEN e.e5 < l.lo_e OR e.e5 > l.hi_e
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
  FROM e CROSS JOIN lim l
)
SELECT l.n AS n_docs,
       l.me / 5 AS mean_bias_tokens,
       l.lo_e / 5 AS loa_low_tokens,
       l.hi_e / 5 AS loa_high_tokens,
       o.n_outside,
       o.n_outside / CAST(l.n AS DOUBLE) AS frac_outside
FROM lim l CROSS JOIN outside o
"""


@query("eval_bland_altman", _BA_SQL)
def eval_bland_altman(spark, sf_dir):
    """BLAND-ALTMAN limits of agreement (Bland & Altman, Lancet 1986):
    mean bias +- 1.96 sd of the per-document difference between the
    chars/5 token-count PROXY and the real whitespace token count —
    the method-comparison statistic that answers "can the cheap
    estimator replace the real count in a token-budget plan", which a
    correlation cannot (two methods can correlate at .99 and still
    disagree by 30%). Differences ride the exact integer
    e = n_chars - 5*tokens (no fifths ever materialize), so moments
    are exact bigint sums; 1.96 is the integer-ratio 196/100 (the AUC
    CI recipe); the outside-count compares exact integers to the
    identical limit doubles. Two combinable scans, one row out."""
    d = t(spark, sf_dir, "documents")
    e = d.select(
        (F.col("n_chars").cast("bigint")
         - 5 * F.size(F.split(F.col("text"), " ")).cast("bigint"))
        .alias("e5")).transform(materialize)  # feeds m + outside
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("e5").cast("bigint").alias("s1"),
              F.sum(F.col("e5") * F.col("e5")).cast("bigint").alias("s2"))
    st = m.select(
        "n", (F.col("s1") / F.col("n").cast("double")).alias("me"),
        F.sqrt((F.col("s2") - F.col("s1") / F.col("n").cast("double")
                * F.col("s1")) / (F.col("n") - 1)).alias("sde"))
    z = F.lit(196).cast("double") / 100
    lim = st.select("n", "me", "sde",
                    (F.col("me") - z * F.col("sde")).alias("lo_e"),
                    (F.col("me") + z * F.col("sde")).alias("hi_e"))
    outside = (e.crossJoin(F.broadcast(lim))
               .agg(F.sum(F.when((F.col("e5") < F.col("lo_e"))
                                 | (F.col("e5") > F.col("hi_e")), 1)
                          .otherwise(0)).cast("bigint").alias("n_outside")))
    return (lim.crossJoin(F.broadcast(outside))
            .select(F.col("n").alias("n_docs"),
                    (F.col("me") / 5).alias("mean_bias_tokens"),
                    (F.col("lo_e") / 5).alias("loa_low_tokens"),
                    (F.col("hi_e") / 5).alias("loa_high_tokens"),
                    "n_outside",
                    (F.col("n_outside") / F.col("n").cast("double"))
                    .alias("frac_outside")))


# ---------------------------------------------------------------------------
# Weibull fit by median-rank regression over the uncensored lifetimes
# ---------------------------------------------------------------------------

@query("survival_weibull_medianrank", _LIFE_SQL + """,
unc AS (SELECT user_id, dur FROM life WHERE cens = 0 AND dur >= 1),
rk AS (
  SELECT dur,
         ROW_NUMBER() OVER (ORDER BY dur, user_id) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM unc
),
pts AS (
  SELECT n,
         ROUND(LN(CAST(dur AS DOUBLE)), 9) AS x,
         ROUND(LN(0 - ROUND(LN(CAST(8 * n - 8 * i + 5 AS DOUBLE)
                               / (8 * n + 2)), 9)), 9) AS y
  FROM rk
),
m AS (
  SELECT MAX(n) AS n,
         CAST(SUM(CAST(x AS DECIMAL(20,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(20,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sxx
  FROM pts
),
fit AS (
  SELECT n,
         (n * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS k,
         sy / CAST(n AS DOUBLE)
           - (n * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * (sx / CAST(n AS DOUBLE)) AS a
  FROM fit0
)
SELECT CAST(n AS BIGINT) AS n_events, k AS shape_k,
       ROUND(exp(0 - a / k), 9) AS scale_days,
       ROUND(exp(0 - a / k), 9)
         * ROUND(exp(ROUND(LN(0 - ROUND(LN(CAST(1 AS DOUBLE) / 2), 9)), 9)
                     / k), 9) AS median_days
FROM fit
""".replace("FROM fit0", "FROM m"))
def survival_weibull_medianrank(spark, sf_dir):
    """WEIBULL LIFETIME FIT by median-rank regression (the Weibull-plot
    method every reliability text opens with): for the UNCENSORED user
    lifetimes, plot x = ln t against y = ln(-ln(1 - F_i)) at Bernard's
    median ranks F_i = (i - 0.375)/(n + 0.25) and read the shape k off
    the OLS slope — k < 1 means churn hazard FALLS with tenure
    (survive-the-first-week dynamics), k > 1 means wear-out. Emits
    shape, the scale exp(-intercept/k) in days, and the fitted median
    lifetime scale*(ln 2)^(1/k). Completes the survival family with a
    PARAMETRIC fit beside KM / Nelson-Aalen / log-rank.

    Determinism: median ranks ride the integer-scaled exact rational
    (8n - 8i + 5)/(8n + 2) (one IEEE division); every ln is round-9
    fenced, fence-products decimal-summed (float operands rounded
    BEFORE the decimal cast); slope/intercept are straight-line IEEE on
    the identical moments and both exp legs are round-9 of
    already-identical arguments — including the (ln 2)^(1/k) power,
    expressed as exp(ln(ln 2)/k) because libm pow() is not identical
    across engines. One per-user rollup + one rank window."""
    unc = _life(spark, sf_dir).filter(
        (F.col("cens") == 0) & (F.col("dur") >= 1))
    rk = unc.select(
        "dur",
        F.row_number().over(W.orderBy("dur", "user_id")).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1)))
        .cast("bigint").alias("n"))
    q = ((8 * F.col("n") - 8 * F.col("i") + 5).cast("double")
         / (8 * F.col("n") + 2))
    pts = rk.select(
        "n",
        F.round(F.log(F.col("dur").cast("double")), 9).alias("x"),
        F.round(F.log(-F.round(F.log(q), 9)), 9).alias("y"))
    d9 = lambda c: F.sum(c.cast("decimal(20,9)")).cast("double")  # noqa: E731
    m = pts.agg(F.max("n").alias("n"),
                d9(F.col("x")).alias("sx"), d9(F.col("y")).alias("sy"),
                d9(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
                d9(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    k = ((n * F.col("sxy") - sx * sy)
         / (n.cast("double") * F.col("sxx") - sx.cast("double") * sx))
    a = sy / n.cast("double") - k * (sx / n.cast("double"))
    fit = m.select("n", k.alias("k"), a.alias("a"))
    scale = F.round(F.exp(-F.col("a") / F.col("k")), 9)
    lnln2 = F.round(F.log(-F.round(F.log(F.lit(1.0) / 2), 9)), 9)
    return fit.select(
        n.cast("bigint").alias("n_events"), F.col("k").alias("shape_k"),
        scale.alias("scale_days"),
        (scale * F.round(F.exp(lnln2 / F.col("k")), 9)).alias("median_days"))
