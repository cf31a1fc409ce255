"""OLS residual diagnostics: Durbin-Watson + Breusch-Pagan (wave r12o).

Fitting a trend is the easy half; TRUSTING it needs the residual
diagnostics: DURBIN-WATSON (serial correlation in the residuals — if
present, every OLS standard error in the trend family is understated)
and BREUSCH-PAGAN (heteroskedasticity — if variance grows with the
regressor, prediction intervals must widen with it). Both run on the
same closed-form OLS of daily revenue (whole currency units) on the day
index that the trend entries fit.

Determinism: the OLS coefficients come from exact integer moments
(t index, integer revenue units), so every residual is the identical
IEEE double on both engines; residuals are pre-scaled by an exact binary
2^-20 (both statistics are scale-invariant) so squares sit far below the
round-9 fence ceiling, and every reduction is a fenced decimal sum.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# shared SQL prefix: daily integer series, exact-moment OLS, scaled
# residuals e' = (y - a - b t) / 2^20
_OLS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS y
  FROM orders GROUP BY 1
),
idx AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS tt
       FROM daily),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tt) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(tt * tt) AS BIGINT) AS stt,
         CAST(SUM(tt * y) AS BIGINT) AS sty
  FROM idx
),
fit AS (
  SELECT n,
         (n * sty - st * sy) / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
         sy / CAST(n AS DOUBLE)
           - (n * sty - st * sy)
             / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
             * (st / CAST(n AS DOUBLE)) AS a
  FROM m
),
resid AS (
  SELECT i.day, i.tt, f.n,
         (i.y - (f.a + f.b * i.tt)) / CAST(1048576 AS DOUBLE) AS ep
  FROM idx i CROSS JOIN fit f
)
"""


@query("stats_durbin_watson", _OLS_SQL + """
, dw AS (
  SELECT n, ep,
         ep - LAG(ep) OVER (ORDER BY tt) AS de
  FROM resid
)
SELECT MAX(n) AS n_days,
       CAST(SUM(CAST(ROUND(de * de, 9) AS DECIMAL(30,9))) AS DOUBLE)
         / NULLIF(CAST(SUM(CAST(ROUND(ep * ep, 9) AS DECIMAL(30,9)))
                       AS DOUBLE), 0) AS dw_stat
FROM dw
""")
def stats_durbin_watson(spark, sf_dir):
    """DURBIN-WATSON statistic (Durbin & Watson 1950): DW =
    sum (e_t - e_{t-1})^2 / sum e_t^2 over the residuals of the daily
    revenue-on-time OLS — ~2 means no serial correlation, << 2 means
    positive autocorrelation (and every trend-entry standard error is
    then optimistic; the regression must move to robust/Newey-West
    errors). OLS coefficients come from exact integer moments so
    every residual is the identical double; residuals are pre-scaled
    by the exact binary 2^-20 (DW is scale-invariant) so their
    squares round-9 fence safely, and both reductions are exact
    decimal sums. One daily rollup + one lag window over the tiny
    day table."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("y")))
    idx = daily.select(
        "y", F.row_number().over(W.orderBy("day")).alias("tt"))
    m = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("tt").cast("bigint").alias("st"),
                F.sum("y").cast("bigint").alias("sy"),
                F.sum(F.col("tt") * F.col("tt")).cast("bigint")
                .alias("stt"),
                F.sum(F.col("tt") * F.col("y")).cast("bigint")
                .alias("sty"))
    b = ((F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
         / (F.col("n").cast("double") * F.col("stt")
            - F.col("st").cast("double") * F.col("st")))
    a = (F.col("sy") / F.col("n").cast("double")
         - b * (F.col("st") / F.col("n").cast("double")))
    fit = m.select("n", b.alias("b"), a.alias("a"))
    resid = (idx.crossJoin(F.broadcast(fit))
             .select("tt", "n",
                     ((F.col("y") - (F.col("a") + F.col("b") * F.col("tt")))
                      / F.lit(float(1 << 20))).alias("ep")))
    de = F.col("ep") - F.lag("ep").over(W.orderBy("tt"))
    dw = resid.select("n", "ep", de.alias("de"))
    return dw.agg(
        F.max("n").alias("n_days"),
        (F.sum(F.round(F.col("de") * F.col("de"), 9)
               .cast("decimal(30,9)")).cast("double")
         / F.nullif(F.sum(F.round(F.col("ep") * F.col("ep"), 9)
                          .cast("decimal(30,9)")).cast("double"),
                    F.lit(0.0))).alias("dw_stat"))


@query("stats_breusch_pagan", _OLS_SQL + """
, sq AS (
  SELECT tt, n, ROUND(ep * ep, 9) AS e2 FROM resid
),
bm AS (
  SELECT MAX(n) AS n,
         CAST(SUM(tt) AS BIGINT) AS st,
         CAST(SUM(CAST(tt AS BIGINT) * tt) AS BIGINT) AS stt,
         CAST(SUM(CAST(e2 AS DECIMAL(30,9))) AS DOUBLE) AS se,
         CAST(SUM(CAST(ROUND(e2 * e2, 9) AS DECIMAL(30,9))) AS DOUBLE)
           AS see,
         CAST(SUM(CAST(ROUND(tt * e2, 6) AS DECIMAL(30,6))) AS DOUBLE)
           AS ste
  FROM sq
)
SELECT n AS n_days,
       (n * ste - st * se) * (n * ste - st * se)
         / NULLIF((CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
                  * (n * see - se * se), 0) AS r2_aux,
       n * ((n * ste - st * se) * (n * ste - st * se)
            / NULLIF((CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
                     * (n * see - se * se), 0)) AS bp_stat
FROM bm
""")
def stats_breusch_pagan(spark, sf_dir):
    """BREUSCH-PAGAN test (Breusch & Pagan 1979, Koenker's studentized
    n*R^2 form): regress the squared OLS residuals on the day index
    and report the auxiliary R^2 and BP = n R^2 (chi-square(1) under
    homoskedasticity) — if revenue-trend residual VARIANCE grows with
    time, every fixed-width prediction interval from the trend family
    is wrong in exactly the direction that bites capacity planning.
    Residuals are the identical exact-moment OLS doubles pre-scaled
    by binary 2^-20 (R^2 is scale-invariant), their squares round-9
    fenced; the auxiliary-regression moments are fenced decimal sums
    (tt*e2 round-6: magnitude ~n) and the statistic is straight-line
    IEEE on them. Same single-rollup shape as Durbin-Watson."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("y")))
    idx = daily.select(
        "y", F.row_number().over(W.orderBy("day")).alias("tt"))
    m = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("tt").cast("bigint").alias("st"),
                F.sum("y").cast("bigint").alias("sy"),
                F.sum(F.col("tt") * F.col("tt")).cast("bigint")
                .alias("stt"),
                F.sum(F.col("tt") * F.col("y")).cast("bigint")
                .alias("sty"))
    b = ((F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
         / (F.col("n").cast("double") * F.col("stt")
            - F.col("st").cast("double") * F.col("st")))
    a = (F.col("sy") / F.col("n").cast("double")
         - b * (F.col("st") / F.col("n").cast("double")))
    fit = m.select("n", b.alias("b"), a.alias("a"))
    sq = (idx.crossJoin(F.broadcast(fit))
          .select("tt", "n",
                  F.round(((F.col("y") - (F.col("a")
                                          + F.col("b") * F.col("tt")))
                           / F.lit(float(1 << 20)))
                          * ((F.col("y") - (F.col("a")
                                            + F.col("b") * F.col("tt")))
                             / F.lit(float(1 << 20))), 9).alias("e2")))
    bm = sq.agg(
        F.max("n").alias("n"),
        F.sum("tt").cast("bigint").alias("st"),
        F.sum(F.col("tt").cast("bigint") * F.col("tt")).cast("bigint")
        .alias("stt"),
        F.sum(F.col("e2").cast("decimal(30,9)")).cast("double")
        .alias("se"),
        F.sum(F.round(F.col("e2") * F.col("e2"), 9)
              .cast("decimal(30,9)")).cast("double").alias("see"),
        F.sum(F.round(F.col("tt") * F.col("e2"), 6)
              .cast("decimal(30,6)")).cast("double").alias("ste"))
    n, st, stt = F.col("n"), F.col("st"), F.col("stt")
    se, see, ste = F.col("se"), F.col("see"), F.col("ste")
    num = (n * ste - st * se) * (n * ste - st * se)
    den = ((n.cast("double") * stt - st.cast("double") * st)
           * (n * see - se * se))
    r2 = num / F.nullif(den, F.lit(0.0))
    return bm.select(n.alias("n_days"), r2.alias("r2_aux"),
                     (n * r2).alias("bp_stat"))


@query("stats_cooks_distance", _OLS_SQL + """
, s2 AS (
  SELECT CAST(SUM(CAST(ROUND(ep * ep, 9) AS DECIMAL(30,9))) AS DOUBLE)
           / (MAX(n) - 2) AS s2
  FROM resid
),
lev AS (
  SELECT r.day, r.tt, r.n, ROUND(r.ep * r.ep, 9) AS e2,
         CAST(1 AS DOUBLE) / r.n
           + (r.tt - m.st / CAST(r.n AS DOUBLE))
             * (r.tt - m.st / CAST(r.n AS DOUBLE))
             / (m.stt - m.st * (m.st / CAST(r.n AS DOUBLE))) AS h
  FROM resid r CROSS JOIN m
)
SELECT day, tt, h AS leverage,
       e2 * h / (2 * s.s2 * (1 - h) * (1 - h)) AS cooks_d
FROM lev CROSS JOIN s2 s
ORDER BY cooks_d DESC, tt
LIMIT 10
""")
def stats_cooks_distance(spark, sf_dir):
    """COOK'S DISTANCE top-10 (Cook 1977): D_i = e_i^2 h_i /
    (p s^2 (1 - h_i)^2) with p = 2 over the daily revenue-on-time OLS
    — WHICH days single-handedly move the fitted trend (a residual
    outlier far from the time centroid bends the line; one near the
    middle barely does). The influence companion to the DW/BP residual
    diagnostics on the same exact-moment fit: leverage h_i = 1/n +
    (t - tbar)^2/S_tt comes from the identical integer moments,
    residuals are the 2^-20-scaled identical doubles (D is
    scale-invariant), s^2 is a fenced decimal sum, and D itself is
    straight-line IEEE on identical doubles — deterministic ORDER BY
    (D desc, day-index asc) with a TakeOrdered top-10."""
    daily = (t(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("y")))
    idx = daily.select(
        "day", "y", F.row_number().over(W.orderBy("day")).alias("tt"))
    m = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("tt").cast("bigint").alias("st"),
                F.sum("y").cast("bigint").alias("sy"),
                F.sum(F.col("tt") * F.col("tt")).cast("bigint")
                .alias("stt"),
                F.sum(F.col("tt") * F.col("y")).cast("bigint")
                .alias("sty"))
    b = ((F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
         / (F.col("n").cast("double") * F.col("stt")
            - F.col("st").cast("double") * F.col("st")))
    a = (F.col("sy") / F.col("n").cast("double")
         - b * (F.col("st") / F.col("n").cast("double")))
    fit = m.select("n", "st", "stt", b.alias("b"), a.alias("a"))
    resid = (idx.crossJoin(F.broadcast(fit))
             .select("day", "tt", "n", "st", "stt",
                     ((F.col("y") - (F.col("a") + F.col("b") * F.col("tt")))
                      / F.lit(float(1 << 20))).alias("ep"))
             .transform(materialize))  # feeds s2 + the row leg
    s2 = resid.agg(
        (F.sum(F.round(F.col("ep") * F.col("ep"), 9)
               .cast("decimal(30,9)")).cast("double")
         / (F.max("n") - 2)).alias("s2"))
    nd = F.col("n").cast("double")
    h = (F.lit(1.0) / F.col("n")
         + (F.col("tt") - F.col("st") / nd)
         * (F.col("tt") - F.col("st") / nd)
         / (F.col("stt") - F.col("st") * (F.col("st") / nd)))
    lev = resid.select("day", "tt",
                       F.round(F.col("ep") * F.col("ep"), 9).alias("e2"),
                       h.alias("h"))
    d = (F.col("e2") * F.col("h")
         / (2 * F.col("s2") * (1 - F.col("h")) * (1 - F.col("h"))))
    return (lev.crossJoin(F.broadcast(s2))
            .select("day", "tt", F.col("h").alias("leverage"),
                    d.alias("cooks_d"))
            .orderBy(F.desc("cooks_d"), F.asc("tt"))
            .limit(10))
