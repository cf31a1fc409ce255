"""Time-series identification + randomness/median tests (wave r12h).

Four more standard decision statistics: the PARTIAL autocorrelation
function via Durbin-Levinson (the AR-order identifier that, with the ACF,
is how practitioners read off ARIMA(p, q) — the repo has the ACF and the
Ljung-Box gate; this closes the identification pair), the Wald-Wolfowitz
RUNS test (is the daily revenue's above/below-median pattern random, the
nonparametric serial-dependence check that needs no moments at all), the
lead-lag CROSS-correlation function between order volume and revenue
(which signal moves first), and MOOD'S MEDIAN test (the k-group location
test that is even more outlier-robust than Kruskal-Wallis: it only uses
above/below the grand median).

Determinism: ACF/PACF legs reuse the Ljung-Box fenced-moment recipe
verbatim; the CCF's two series are exact integers (whole-currency daily
revenue via integer division, daily order counts), so its moments are
exact; runs/median tests are pure integer counting with IEEE closed
forms; the one data-dependent cross-group sum (Mood's 2k cells) is a
round-9-fenced decimal sum.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, sql_dsum, t

# ---------------------------------------------------------------------------
# PACF lags 1..3 by Durbin-Levinson from the fenced ACF
# ---------------------------------------------------------------------------


def _acf_legs_sql() -> str:
    legs = []
    for lag in (1, 2, 3):
        legs.append(f"""
SELECT {lag} AS lag, ROUND((n * sxy - sx * sy)
       / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS acf
FROM (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(x, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 2) AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(y * y, 2) AS DECIMAL(30,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(ROUND(x * y, 2) AS DECIMAL(30,2))) AS DOUBLE) AS sxy
  FROM (SELECT rev AS x,
               LAG(rev, {lag}) OVER (ORDER BY day) AS y
        FROM daily)
  WHERE y IS NOT NULL
)""")
    return "UNION ALL".join(legs)


_PACF_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         {sql_dsum('o_totalprice')} AS rev
  FROM orders GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
acfs AS ({_acf_legs_sql()}),
piv AS (
  SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
         MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
         MAX(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acfs
),
dl AS (
  SELECT r1, r2, r3,
         (r2 - r1 * r1) / NULLIF(1 - r1 * r1, 0) AS phi22
  FROM piv
),
dl2 AS (
  SELECT r1, r2, r3, phi22, r1 * (1 - phi22) AS phi21 FROM dl
)
SELECT nn.n AS n_days, r1 AS acf_1, r2 AS acf_2, r3 AS acf_3,
       r1 AS pacf_1, phi22 AS pacf_2,
       (r3 - phi21 * r2 - phi22 * r1)
         / NULLIF(1 - phi21 * r1 - phi22 * r2, 0) AS pacf_3
FROM dl2 CROSS JOIN nn
"""


@query("timeseries_pacf", _PACF_SQL)
def timeseries_pacf(spark, sf_dir):
    """PARTIAL AUTOCORRELATION function at lags 1-3 via the
    Durbin-Levinson recursion (Durbin 1960) applied to the fenced ACF:
    pacf_k is the correlation between x_t and x_{t-k} AFTER removing
    the intermediate lags — the statistic whose cutoff identifies the
    AR order p (the ACF's cutoff identifies MA q); together with
    timeseries_acf and the Ljung-Box gate this completes the classical
    Box-Jenkins identification toolkit. The three ACF legs reuse the
    Ljung-Box moment recipe verbatim (round-4 revenue, round-2
    products, exact decimal sums, round-9 fence); the recursion
    phi22 = (r2-r1^2)/(1-r1^2), phi21 = r1(1-phi22), pacf_3 =
    (r3 - phi21 r2 - phi22 r1)/(1 - phi21 r1 - phi22 r2) is
    straight-line IEEE on the identical fenced ACFs with NULLIF
    guards. One daily rollup + three window legs."""
    from arangodb_java_parquet_spark.queries.common import dsum
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(dsum("o_totalprice").alias("rev"))
             .transform(materialize))
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = W.orderBy("day")
    acfs = None
    for lag in (1, 2, 3):
        p = (daily.select(F.col("rev").alias("x"),
                          F.lag("rev", lag).over(w).alias("y"))
             .filter(F.col("y").isNotNull()))
        m = p.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("x"), 4).cast("decimal(30,4)"))
            .cast("double").alias("sx"),
            F.sum(F.round(F.col("y"), 4).cast("decimal(30,4)"))
            .cast("double").alias("sy"),
            F.sum(F.round(F.col("x") * F.col("x"), 2)
                  .cast("decimal(30,2)")).cast("double").alias("sxx"),
            F.sum(F.round(F.col("y") * F.col("y"), 2)
                  .cast("decimal(30,2)")).cast("double").alias("syy"),
            F.sum(F.round(F.col("x") * F.col("y"), 2)
                  .cast("decimal(30,2)")).cast("double").alias("sxy"))
        leg = m.select(
            F.lit(lag).alias("lag"),
            F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / F.sqrt((F.col("n") * F.col("sxx")
                              - F.col("sx") * F.col("sx"))
                             * (F.col("n") * F.col("syy")
                                - F.col("sy") * F.col("sy"))), 9)
            .alias("acf"))
        acfs = leg if acfs is None else acfs.unionAll(leg)
    piv = acfs.agg(
        F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    dl = piv.select(r1.alias("r1"), r2.alias("r2"), r3.alias("r3"),
                    ((r2 - r1 * r1)
                     / F.nullif(1 - r1 * r1, F.lit(0.0))).alias("phi22"))
    dl2 = dl.select("r1", "r2", "r3", "phi22",
                    (F.col("r1") * (1 - F.col("phi22"))).alias("phi21"))
    pacf3 = ((F.col("r3") - F.col("phi21") * F.col("r2")
              - F.col("phi22") * F.col("r1"))
             / F.nullif(1 - F.col("phi21") * F.col("r1")
                        - F.col("phi22") * F.col("r2"), F.lit(0.0)))
    return (dl2.crossJoin(F.broadcast(nn))
            .select(F.col("n").alias("n_days"),
                    F.col("r1").alias("acf_1"), F.col("r2").alias("acf_2"),
                    F.col("r3").alias("acf_3"),
                    F.col("r1").alias("pacf_1"),
                    F.col("phi22").alias("pacf_2"),
                    pacf3.alias("pacf_3")))


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue above/below its median
# ---------------------------------------------------------------------------

_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
med AS (SELECT quantile_cont(cents, 0.5) AS med FROM daily),
s AS (
  SELECT day, CASE WHEN cents > med THEN 1 ELSE 0 END AS above
  FROM daily CROSS JOIN med
  WHERE cents != med
),
runs AS (
  SELECT above,
         CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                OR above != LAG(above) OVER (ORDER BY day)
              THEN 1 ELSE 0 END AS new_run
  FROM s
),
agg AS (
  SELECT CAST(SUM(above) AS BIGINT) AS n1,
         CAST(SUM(1 - above) AS BIGINT) AS n2,
         CAST(SUM(new_run) AS BIGINT) AS r
  FROM runs
)
SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
       1 + 2 * n1 * n2 / CAST(n1 + n2 AS DOUBLE) AS expected_runs,
       (r - (1 + 2 * n1 * n2 / CAST(n1 + n2 AS DOUBLE)))
         / NULLIF(sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                       * (2 * n1 * n2 - n1 - n2)
                       / ((n1 + n2) * (n1 + n2))
                       / (n1 + n2 - 1)), 0) AS z_score
FROM agg
"""


@query("stats_runs_test", _RUNS_SQL)
def stats_runs_test(spark, sf_dir):
    """WALD-WOLFOWITZ RUNS test (1940): dichotomize daily revenue at
    its median and count runs of consecutive same-side days; too FEW
    runs means positive serial dependence (trends/regimes), too MANY
    means oscillation — the assumption-free randomness check that
    validates the iid premise behind bootstrap CIs and control charts
    (complements Ljung-Box, which needs second moments). Daily cents
    are exact integers and the median an exact half-multiple, so the
    above/below indicator, run starts (one LAG window over days), n1,
    n2 and R are pure integers; E[R] and the z-score are closed-form
    IEEE on identical operands (median-equal days are dropped, the
    standard convention, identically on both engines)."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                  .cast("bigint").alias("cents")))
    med = daily.agg(F.expr("percentile(cents, 0.5)").alias("med"))
    s = (daily.crossJoin(F.broadcast(med))
         .filter(F.col("cents") != F.col("med"))
         .select("day", F.when(F.col("cents") > F.col("med"), 1)
                 .otherwise(0).alias("above")))
    lag_above = F.lag("above").over(W.orderBy("day"))
    runs = s.select(
        "above",
        F.when(lag_above.isNull() | (F.col("above") != lag_above), 1)
        .otherwise(0).alias("new_run"))
    agg = runs.agg(F.sum("above").cast("bigint").alias("n1"),
                   F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
                   F.sum("new_run").cast("bigint").alias("r"))
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 1 + 2 * n1 * n2 / (n1 + n2).cast("double")
    sd = F.sqrt((2 * n1 * n2).cast("double")
                * (2 * n1 * n2 - n1 - n2)
                / ((n1 + n2) * (n1 + n2))
                / (n1 + n2 - 1))
    return agg.select(
        n1.alias("n_above"), n2.alias("n_below"), r.alias("n_runs"),
        er.alias("expected_runs"),
        ((r - er) / F.nullif(sd, F.lit(0.0))).alias("z_score"))


# ---------------------------------------------------------------------------
# Cross-correlation function: daily order count vs daily revenue
# ---------------------------------------------------------------------------

_CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def _ccf_sql() -> str:
    legs = []
    for lag in _CCF_LAGS:
        shift = (f"LAG(y, {-lag})" if lag < 0 else f"LEAD(y, {lag})")
        legs.append(f"""
SELECT {lag} AS lag, CAST(n AS BIGINT) AS n_pairs,
       (n * sxy - sx * sy)
         / NULLIF(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy),
                  0) AS ccf
FROM (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yl) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(yl * yl) AS BIGINT) AS syy,
         CAST(SUM(x * yl) AS BIGINT) AS sxy
  FROM (SELECT x, {shift} OVER (ORDER BY day) AS yl FROM daily)
  WHERE yl IS NOT NULL
)""")
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS y
  FROM orders GROUP BY 1
)
{'UNION ALL'.join(legs)}
"""


@query("timeseries_crosscorr", _ccf_sql())
def timeseries_crosscorr(spark, sf_dir):
    """CROSS-CORRELATION function at lags -3..+3 between daily order
    COUNT and daily REVENUE (in whole currency units): ccf(l) =
    corr(count_t, revenue_{t+l}) — the lead-lag detector (a peak at
    l>0 means volume leads revenue; at l=0 they co-move) that decides
    whether one series is a usable leading indicator for the other
    before fitting any transfer-function model. Both series are exact
    integers (counts; exact cents integer-divided to units), so every
    moment in every lag leg is an EXACT bigint sum and each ccf is
    one closed-form IEEE expression — no rounding fences needed
    anywhere. One daily rollup + seven window legs over the tiny day
    table."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("x"),
                  F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("y"))
             .transform(materialize))
    w = W.orderBy("day")
    out = None
    for lag in _CCF_LAGS:
        yl = (F.lag("y", -lag).over(w) if lag < 0
              else F.lead("y", lag).over(w))
        p = (daily.select("x", yl.alias("yl"))
             .filter(F.col("yl").isNotNull()))
        m = p.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("x").cast("bigint").alias("sx"),
                  F.sum("yl").cast("bigint").alias("sy"),
                  F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
                  F.sum(F.col("yl") * F.col("yl")).cast("bigint")
                  .alias("syy"),
                  F.sum(F.col("x") * F.col("yl")).cast("bigint")
                  .alias("sxy"))
        n = F.col("n")
        num = n * F.col("sxy") - F.col("sx") * F.col("sy")
        den = (F.sqrt(n.cast("double") * F.col("sxx")
                      - F.col("sx").cast("double") * F.col("sx"))
               * F.sqrt(n.cast("double") * F.col("syy")
                        - F.col("sy").cast("double") * F.col("sy")))
        leg = m.select(F.lit(lag).alias("lag"),
                       n.cast("bigint").alias("n_pairs"),
                       (num / F.nullif(den, F.lit(0.0))).alias("ccf"))
        out = leg if out is None else out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# Mood's median test: document length location across languages
# ---------------------------------------------------------------------------

_MOOD_SQL = """
WITH base AS (SELECT lang, n_chars AS x FROM documents),
med AS (SELECT quantile_cont(x, 0.5) AS med FROM base),
cls AS (
  SELECT lang, CASE WHEN x > med THEN 1 ELSE 0 END AS above
  FROM base CROSS JOIN med
),
grp AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(above) AS BIGINT) AS a_j
  FROM cls GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(SUM(a_j) AS BIGINT) AS a,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
)
SELECT tot.n AS n_docs, tot.k AS k_groups,
       tot.a AS n_above_total,
       CAST(SUM(CAST(ROUND(
           (g.a_j - g.n_j * tot.a / CAST(tot.n AS DOUBLE))
             * (g.a_j - g.n_j * tot.a / CAST(tot.n AS DOUBLE))
             / (g.n_j * tot.a / CAST(tot.n AS DOUBLE)), 9)
           AS DECIMAL(30,9))) AS DOUBLE)
       + CAST(SUM(CAST(ROUND(
           ((g.n_j - g.a_j) - g.n_j * (tot.n - tot.a)
              / CAST(tot.n AS DOUBLE))
             * ((g.n_j - g.a_j) - g.n_j * (tot.n - tot.a)
                / CAST(tot.n AS DOUBLE))
             / (g.n_j * (tot.n - tot.a) / CAST(tot.n AS DOUBLE)), 9)
           AS DECIMAL(30,9))) AS DOUBLE) AS chi2_mood
FROM grp g CROSS JOIN tot
GROUP BY tot.n, tot.k, tot.a
"""


@query("stats_mood_median", _MOOD_SQL)
def stats_mood_median(spark, sf_dir):
    """MOOD'S MEDIAN test (Mood 1950): classify every document as
    above/not-above the GRAND median length, then chi-square the k
    language strata's above-counts against expectation — the k-group
    location test that uses ONLY median crossings, making it robust to
    arbitrary tail contamination (the coarser, sturdier sibling of
    Kruskal-Wallis; when the two disagree, the tails differ, not the
    centers). The grand median of integers is an exact half-multiple,
    indicators and group counts are exact integers, expectations are
    exact-rational doubles, and the 2k chi-square cells are round-9
    fenced decimal sums. One median + one combinable aggregation."""
    base = t(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").alias("x"))
    med = base.agg(F.expr("percentile(x, 0.5)").alias("med"))
    cls = (base.crossJoin(F.broadcast(med))
           .select("lang", F.when(F.col("x") > F.col("med"), 1)
                   .otherwise(0).alias("above")))
    grp = cls.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("above").cast("bigint").alias("a_j"))
    tot = grp.agg(F.sum("n_j").cast("bigint").alias("n"),
                  F.sum("a_j").cast("bigint").alias("a"),
                  F.count(F.lit(1)).cast("bigint").alias("k"))
    j = grp.crossJoin(F.broadcast(tot))
    ea = F.col("n_j") * F.col("a") / F.col("n").cast("double")
    eb = (F.col("n_j") * (F.col("n") - F.col("a"))
          / F.col("n").cast("double"))
    ta = F.round((F.col("a_j") - ea) * (F.col("a_j") - ea) / ea, 9)
    tb = F.round(((F.col("n_j") - F.col("a_j")) - eb)
                 * ((F.col("n_j") - F.col("a_j")) - eb) / eb, 9)
    return (j.groupBy("n", "k", "a")
            .agg((F.sum(ta.cast("decimal(30,9)")).cast("double")
                  + F.sum(tb.cast("decimal(30,9)")).cast("double"))
                 .alias("chi2_mood"))
            .select(F.col("n").alias("n_docs"),
                    F.col("k").alias("k_groups"),
                    F.col("a").alias("n_above_total"),
                    "chi2_mood"))
