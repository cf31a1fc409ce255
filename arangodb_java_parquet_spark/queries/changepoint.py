"""Changepoint / randomness diagnostics + the theta forecaster (wave r13a).

A drift monitor says the distribution moved; a CHANGEPOINT test says
WHEN. PETTITT (1979) is the standard nonparametric single-changepoint
test — a Mann-Whitney statistic swept over every split point, maximized
— and the first thing an on-call runs when a daily KPI looks broken:
it returns the most likely break day plus an approximate significance.
The TURNING-POINT test (Wald-Wolfowitz 1943) is the cheapest
pure-randomness check for a series — count local extrema, compare to
the exact 2(n-2)/3 expectation — and reads out whether the daily series
has any serial structure worth modeling at all. THETA (Assimakopoulos &
Nikolopoulos 2000, the M3 winner) completes the forecast bench: the
average of a fitted linear trend and an SES run on the theta=2 line
2y - trend, scored on the same half-split holdout as Holt/naive so the
forecast family is directly comparable.

Determinism: Pettitt's U_t rides doubled midranks (exact integers, the
CvM recipe); the turning-point count is pure integer comparisons; the
theta fit is exact-integer-moment OLS plus an aggregate()/list_reduce
fold of identical IEEE doubles (the Holt recipe); significance legs are
round-9 exp of already-identical rationals (the piloted exp rule).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# shared SQL: the daily order-count series (exact integers, one day table)
_DAILY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
)
"""


def _daily(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("y")))


@query("changepoint_pettitt", _DAILY_SQL + """
, rk AS (
  SELECT day, y,
         CAST(2 * RANK() OVER (ORDER BY y)
              + (COUNT(*) OVER (PARTITION BY y) - 1) AS BIGINT) AS r2,
         ROW_NUMBER() OVER (ORDER BY day) AS tt,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
u AS (
  SELECT day, tt, n,
         CAST(SUM(r2) OVER (ORDER BY tt) - tt * (n + 1) AS BIGINT) AS ut
  FROM rk
),
k AS (
  SELECT MAX(n) AS n, CAST(MAX(abs(ut)) AS BIGINT) AS k_stat FROM u
)
SELECT k.n AS n_days, k.k_stat,
       (SELECT MIN(day) FROM u WHERE abs(ut) = k.k_stat) AS change_day,
       LEAST(CAST(1 AS DOUBLE),
             2 * ROUND(exp(0 - CAST(6 AS DOUBLE) * k.k_stat * k.k_stat
                           / (CAST(k.n AS DOUBLE) * k.n * k.n
                              + CAST(k.n AS DOUBLE) * k.n)), 9))
         AS p_approx
FROM k
""")
def changepoint_pettitt(spark, sf_dir):
    """PETTITT single-changepoint test (Pettitt 1979) on the daily order
    count: U_t = 2*sum_{i<=t} r_i - t(n+1) over pooled midranks, K =
    max|U_t|, the arg-max day is the most probable break point, and the
    standard approximation p ~ 2 exp(-6K^2/(n^3+n^2)) gates it. Doubled
    midranks (rank + tie count) keep U_t an exact integer — the
    Cramer-von-Mises recipe — so K and the break day are exact on both
    engines; the exp leg is round-9 of an already-identical exact
    rational (the piloted exp rule). One day-level rollup + two windows
    over the tiny day table; at 100 TB the only corpus-sized work is
    the daily aggregation."""
    daily = _daily(spark, sf_dir)
    r2 = (2 * F.rank().over(W.orderBy("y"))
          + (F.count(F.lit(1)).over(W.partitionBy("y")) - 1)).cast("bigint")
    rk = daily.select(
        "day", r2.alias("r2"),
        F.row_number().over(W.orderBy("day")).alias("tt"),
        F.count(F.lit(1)).over(
            W.partitionBy(F.lit(1))).cast("bigint").alias("n"))
    u = (rk.select(
        "day", "n",
        (F.sum("r2").over(W.orderBy("tt"))
         - F.col("tt") * (F.col("n") + 1)).cast("bigint").alias("ut"))
        .transform(materialize))  # feeds the max + the arg-min day
    k = u.agg(F.max("n").alias("n"),
              F.max(F.abs(F.col("ut"))).cast("bigint").alias("k_stat"))
    hit = (u.join(F.broadcast(k), F.abs(F.col("ut")) == F.col("k_stat"))
           .agg(F.min("day").alias("change_day")))
    n = F.col("n").cast("double")
    p = 2 * F.round(F.exp(
        -6.0 * F.col("k_stat") * F.col("k_stat")
        / (n * F.col("n") * F.col("n") + n * F.col("n"))), 9)
    return (k.crossJoin(F.broadcast(hit))
            .select(F.col("n").alias("n_days"), "k_stat", "change_day",
                    F.least(F.lit(1.0), p).alias("p_approx")))


@query("timeseries_turning_points", _DAILY_SQL + """
, s AS (
  SELECT y,
         LAG(y)  OVER (ORDER BY day) AS yp,
         LEAD(y) OVER (ORDER BY day) AS yn
  FROM daily
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN (y - yp) * (yn - y) < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tp
  FROM s
)
SELECT n AS n_days, n_tp,
       2 * (CAST(n AS DOUBLE) - 2) / 3 AS expected_tp,
       (n_tp - 2 * (CAST(n AS DOUBLE) - 2) / 3)
         / sqrt((16 * CAST(n AS DOUBLE) - 29) / 90) AS z_stat
FROM c
""")
def timeseries_turning_points(spark, sf_dir):
    """TURNING-POINT randomness test (Wald & Wolfowitz 1943) on the
    daily order count: count the strict local extrema
    ((y_t - y_{t-1})(y_{t+1} - y_t) < 0; flat steps are not turning
    points, the integer-series convention), compare to the exact i.i.d.
    expectation 2(n-2)/3 with variance (16n-29)/90 — |z| >> 0 means the
    series has serial structure worth a real model, z ~ 0 means the
    forecast family can stop at the naive bench. The count is pure
    integer comparisons; expectation/variance/z are straight-line IEEE
    on exact integers (n well under 2^53), so no fences are needed
    anywhere. One rollup + one lag/lead window over the day table."""
    daily = _daily(spark, sf_dir)
    w = W.orderBy("day")
    s = daily.select(
        "y", F.lag("y").over(w).alias("yp"), F.lead("y").over(w).alias("yn"))
    c = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("y") - F.col("yp"))
                     * (F.col("yn") - F.col("y")) < 0, 1).otherwise(0))
        .cast("bigint").alias("n_tp"))
    n = F.col("n").cast("double")
    e = 2 * (n - 2) / 3
    v = (16 * n - 29) / 90
    return c.select(F.col("n").alias("n_days"), "n_tp",
                    e.alias("expected_tp"),
                    ((F.col("n_tp") - e) / F.sqrt(v)).alias("z_stat"))


# ---------------------------------------------------------------------------
# theta-method forecast (M3 winner), scored on the Holt/naive holdout
# ---------------------------------------------------------------------------

@query("forecast_theta_method", """
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, d, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
  FROM daily
),
m AS (
  SELECT event_type, CAST(nd // 2 AS BIGINT) AS n_train,
         CAST(SUM(rn) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(rn * rn) AS BIGINT) AS stt,
         CAST(SUM(rn * y) AS BIGINT) AS sty,
         list(CAST(y AS DOUBLE) ORDER BY rn) AS ys
  FROM rk WHERE rn <= nd // 2
  GROUP BY event_type, nd // 2
),
fit AS (
  SELECT event_type, n_train, ys,
         (n_train * sty - st * sy)
           / (CAST(n_train AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
         sy / CAST(n_train AS DOUBLE)
           - (n_train * sty - st * sy)
             / (CAST(n_train AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
             * (st / CAST(n_train AS DOUBLE)) AS a
  FROM m WHERE n_train >= 3
),
ses AS (
  -- SES (alpha = 1/2, exact binary) folded over the theta=2 line
  -- 2y_k - (a + b k); seed = first theta2 value, identical
  -- left-to-right IEEE chain on both engines (the Holt fold recipe).
  SELECT event_type, n_train, a, b,
         list_reduce(
           list_transform(range(1, CAST(n_train AS BIGINT) + 1),
                          k -> 2 * ys[k] - (a + b * k)),
           (acc, e) -> (e + acc) / 2) AS l
  FROM fit
)
SELECT f.event_type, f.a, f.b, f.l AS ses_level,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CAST(ROUND((t.y - ((f.a + f.b * t.rn) + f.l) / 2)
                           * (t.y - ((f.a + f.b * t.rn) + f.l) / 2),
                           6) AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(*) AS mse,
       CAST(SUM(CAST(ROUND(ABS(t.y - ((f.a + f.b * t.rn) + f.l) / 2), 9)
                     AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*) AS mae
FROM rk t JOIN ses f USING (event_type)
WHERE t.rn > f.n_train
GROUP BY f.event_type, f.a, f.b, f.l
""")
def forecast_theta_method(spark, sf_dir):
    """THETA-METHOD forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner): fit a linear trend a + b t on the first
    half of each event type's daily series by exact-integer-moment OLS,
    run SES (alpha = 1/2, exact binary halving) over the theta=2 line
    2y_t - (a + b t), and forecast the AVERAGE of the extrapolated
    trend and the flat SES level — scored on the same second-half
    holdout as forecast_holt_linear / forecast_naive_benchmarks so the
    whole forecast bench is one comparable family. The SES recurrence
    is the Holt fold recipe: aggregate()/list_reduce walk the identical
    left-to-right chain of IEEE doubles (theta2 values are exact
    arithmetic on integer counts and the identical OLS doubles), MSE is
    round-6 fenced (squared residuals), MAE round-9. The fold runs on
    one row per event type over a calendar-bounded array; the
    corpus-sized work is the daily aggregation."""
    ev = t(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts").cast("timestamp"))
                        .alias("d"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    wt = W.partitionBy("event_type")
    rk = (daily.select(
        "event_type", "d", "y",
        F.row_number().over(wt.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("nd"))
        .transform(materialize))  # feeds the fit + the holdout
    m = (rk.where(F.col("rn") <= F.expr("nd div 2"))
         .groupBy("event_type", F.expr("nd div 2").alias("n_train"))
         .agg(F.sum("rn").cast("bigint").alias("st"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum(F.col("rn") * F.col("rn")).cast("bigint").alias("stt"),
              F.sum(F.col("rn") * F.col("y")).cast("bigint").alias("sty"),
              F.expr("transform(array_sort(collect_list(struct(rn, y))),"
                     " s -> CAST(s.y AS DOUBLE))").alias("ys")))
    nt = F.col("n_train")
    b = ((nt * F.col("sty") - F.col("st") * F.col("sy"))
         / (nt.cast("double") * F.col("stt")
            - F.col("st").cast("double") * F.col("st")))
    a = (F.col("sy") / nt.cast("double")
         - b * (F.col("st") / nt.cast("double")))
    fit = (m.where(nt >= 3)
           .select("event_type", "n_train", "ys",
                   b.alias("b"), a.alias("a")))
    ses = fit.select(
        "event_type", "n_train", "a", "b",
        F.expr("""
        aggregate(
          slice(transform(sequence(1, CAST(n_train AS INT)),
                          k -> 2 * element_at(ys, k) - (a + b * k)),
                2, CAST(n_train AS INT) - 1),
          transform(sequence(1, CAST(n_train AS INT)),
                    k -> 2 * element_at(ys, k) - (a + b * k))[0],
          (acc, e) -> (e + acc) / 2)
        """).alias("l"))
    fc = (F.col("a") + F.col("b") * F.col("rn") + F.col("l")) / 2
    resid = F.col("y") - fc
    return (rk.join(ses, "event_type")
            .where(F.col("rn") > F.col("n_train"))
            .groupBy("event_type", "a", "b", F.col("l").alias("ses_level"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"),
                 (F.sum(F.round(resid * resid, 6).cast("decimal(30,6)"))
                  .cast("double") / F.count(F.lit(1))).alias("mse"),
                 (F.sum(F.round(F.abs(resid), 9).cast("decimal(30,9)"))
                  .cast("double") / F.count(F.lit(1))).alias("mae"))
            .select("event_type", "a", "b", "ses_level", "n_test",
                    "mse", "mae"))


@query("timeseries_dickey_fuller", _DAILY_SQL + """
, idx AS (
  SELECT y,
         LAG(y) OVER (ORDER BY day) AS yl
  FROM daily
),
p AS (SELECT CAST(yl AS BIGINT) AS x, CAST(y - yl AS BIGINT) AS dy
      FROM idx WHERE yl IS NOT NULL),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * dy) AS BIGINT) AS sxy,
         CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM p
)
SELECT n AS n_obs,
       (n * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS rho_hat,
       (n * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         / sqrt(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                 - (n * sxy - sx * sy)
                   * ((n * sxy - sx * sy)
                      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)))
                / (n - 2)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
         AS df_tstat
FROM m
""")
def timeseries_dickey_fuller(spark, sf_dir):
    """DICKEY-FULLER unit-root test (Dickey & Fuller 1979, zero-lag,
    with intercept): regress the day-over-day difference on the lagged
    level, dy_t = c + rho*y_{t-1} + e; rho ~ 0 means the daily series
    is a random walk (differencing needed before any trend fit), rho
    strongly negative means mean-reversion — the stationarity gate the
    forecast family assumes, complementing Hurst R/S (long-memory) and
    the turning-point test (pure randomness). The t-statistic compares
    against Dickey-Fuller (not normal) critical values (~-2.86 at 5%).
    Every moment is an exact bigint sum over the calendar-bounded day
    table; rho and its standard error are straight-line IEEE on the
    identical centered moments (n*SSE and n*Sxx keep everything in the
    n-scaled integer-moment form), no fences needed."""
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        "y", F.lag("y").over(W.orderBy("day")).alias("yl"))
    p = (idx.where(F.col("yl").isNotNull())
         .select(F.col("yl").cast("bigint").alias("x"),
                 (F.col("y") - F.col("yl")).cast("bigint").alias("dy")))
    m = p.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("dy").cast("bigint").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
              F.sum(F.col("x") * F.col("dy")).cast("bigint").alias("sxy"),
              F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy
    varx_n = n.cast("double") * sxx - sx.cast("double") * sx
    vary_n = n.cast("double") * syy - sy.cast("double") * sy
    rho = cov_n / varx_n
    # se^2 = SSE/((n-2)*Sxx_c): with Syy_c = vary_n/n and Sxx_c =
    # varx_n/n the n factors CANCEL — (vary_n - cov_n*rho)/((n-2)*varx_n)
    # is exactly SSE/((n-2)*Sxx_c), no residual n factor (a spurious *n
    # deflated the t-stat by sqrt(n) in the first cut; caught by review,
    # pinned against a plain-python OLS in tests/test_round13.py)
    se = F.sqrt((vary_n - cov_n * (cov_n / varx_n))
                / (n - 2) / varx_n)
    return m.select(n.alias("n_obs"), rho.alias("rho_hat"),
                    (rho / se).alias("df_tstat"))
