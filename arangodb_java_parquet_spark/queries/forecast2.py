"""Seasonal forecasting + the two missing unpaired tests (wave r12k).

HOLT-WINTERS additive seasonal smoothing (the workhorse operational
forecast — level + trend + weekly seasonality — extending the repo's Holt
linear chain with the m=7 seasonal state), the MANN-WHITNEY U test (the
unpaired rank test; the repo had the PAIRED Wilcoxon and the k-group
Kruskal-Wallis but not the canonical two-sample U), and the two-proportion
z-test (the significance companion to the Cohen's h effect size).

Determinism: the Holt-Winters recurrence is the proven fold shape
(forecast_holt_linear, advanced3.py:1034) — Spark aggregate() and DuckDB
list_reduce() walk the identical left-to-right chain of IEEE ops on exact
integer counts, with the seasonal state kept in rotation order so no slot
arithmetic enters the fold; U and z are pure integer midrank/count
closed forms.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# Holt-Winters additive (alpha=3/10, beta=1/10, gamma=2/10, m=7)
# ---------------------------------------------------------------------------

# state = [l, b, s1..s7] with s1 the CURRENT step's seasonal; each step
# rotates the seasonal ring left and appends the updated seasonal, so the
# fold never needs slot indices. l' is written out three times (it feeds
# b' and s1') — the fold is a chain of identical IEEE ops on both engines.
_HW_A = "(CAST(3 AS DOUBLE) / 10)"
_HW_B = "(CAST(1 AS DOUBLE) / 10)"
_HW_G = "(CAST(2 AS DOUBLE) / 10)"


def _hw_lnew(acc, e):
    return (f"{_HW_A} * ({e} - {acc}[3])"
            f" + (1 - {_HW_A}) * ({acc}[1] + {acc}[2])")


def _hw_step_sql() -> str:
    ln = _hw_lnew("acc", "ee[1]")
    return (f"[{ln},\n"
            f" {_HW_B} * (({ln}) - acc[1]) + (1 - {_HW_B}) * acc[2],\n"
            " acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],\n"
            f" {_HW_G} * (ee[1] - ({ln})) + (1 - {_HW_G}) * acc[3]]")


def _hw_step_spark() -> str:
    ln = (f"{_HW_A} * (e - element_at(acc, 3))"
          f" + (1 - {_HW_A}) * (element_at(acc, 1) + element_at(acc, 2))")
    return (f"array({ln},\n"
            f" {_HW_B} * (({ln}) - element_at(acc, 1))"
            f" + (1 - {_HW_B}) * element_at(acc, 2),\n"
            " element_at(acc, 4), element_at(acc, 5), element_at(acc, 6),"
            " element_at(acc, 7), element_at(acc, 8), element_at(acc, 9),\n"
            f" {_HW_G} * (e - ({ln})) + (1 - {_HW_G})"
            " * element_at(acc, 3))")


_HW_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
rk AS (
  SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS nd
  FROM daily
),
series AS (
  SELECT CAST(nd // 2 AS BIGINT) AS n_train,
         list(CAST(y AS DOUBLE) ORDER BY rn) AS ys
  FROM rk WHERE rn <= nd // 2
  GROUP BY nd // 2
),
init AS (
  SELECT n_train, ys,
         list_sum(ys[1:7]) / CAST(7 AS DOUBLE) AS m1,
         (list_sum(ys[8:14]) / CAST(7 AS DOUBLE)
          - list_sum(ys[1:7]) / CAST(7 AS DOUBLE))
           / CAST(7 AS DOUBLE) AS b0
  FROM series WHERE n_train >= 15
),
fitted AS (
  SELECT n_train,
         list_reduce(
           list_prepend(
             [m1, b0,
              ys[1] - m1, ys[2] - m1, ys[3] - m1, ys[4] - m1,
              ys[5] - m1, ys[6] - m1, ys[7] - m1],
             list_transform(ys[8 : CAST(n_train AS BIGINT)], v -> [v])),
           (acc, ee) -> {_hw_step_sql()}) AS st
  FROM init
),
fc AS (
  SELECT n_train, st[1] AS level_fit, st[2] AS trend_fit, st AS state
  FROM fitted
)
SELECT f.n_train, f.level_fit, f.trend_fit,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CAST(ROUND(ABS(t.y - (f.level_fit
                 + (t.rn - f.n_train) * f.trend_fit
                 + f.state[3 + (t.rn - f.n_train - 1) % 7])), 9)
                     AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*) AS mae,
       CAST(SUM(CAST(ROUND((t.y - (f.level_fit
                 + (t.rn - f.n_train) * f.trend_fit
                 + f.state[3 + (t.rn - f.n_train - 1) % 7]))
               * (t.y - (f.level_fit
                 + (t.rn - f.n_train) * f.trend_fit
                 + f.state[3 + (t.rn - f.n_train - 1) % 7])), 6)
                     AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS mse
FROM rk t CROSS JOIN fc f
WHERE t.rn > f.n_train
GROUP BY f.n_train, f.level_fit, f.trend_fit
"""


@query("forecast_holt_winters", _HW_SQL)
def forecast_holt_winters(spark, sf_dir):
    """HOLT-WINTERS additive seasonal smoothing (Winters 1960), m=7:
    level + trend + a weekly seasonal ring fit on the first half of
    the daily order-count series (alpha=3/10, beta=1/10, gamma=2/10 —
    integer-ratio literals), scored frozen on the second half with the
    h-step forecast l + h b + s_{(h-1) mod 7} — the operational
    capacity forecast that Holt's linear chain cannot make when demand
    has a weekly shape. The seasonal state rides IN ROTATION ORDER
    inside the fold state [l, b, s1..s7] (each step consumes s1,
    rotates, appends the update), so the inherently sequential
    recurrence stays the proven one-row fold: Spark aggregate() and
    DuckDB list_reduce() walk the identical left-to-right IEEE chain
    on exact integer counts (the holt_linear recipe, including
    DuckDB's no-initial-value list_prepend and the DOUBLE-list-not-
    struct accumulator rule). Initialization is the classical first/
    second-week means. Corpus-sized work is one daily rollup; the
    fold is one row."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
    rk = (daily.select(
        "d", "y", F.row_number().over(W.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("nd"))
        .transform(materialize))  # feeds the fit + the holdout
    series = (rk.where(F.col("rn") <= F.expr("nd div 2"))
              .groupBy(F.expr("CAST(nd div 2 AS BIGINT)").alias("n_train"))
              .agg(F.expr(
                  "transform(array_sort(collect_list(struct(rn, y))),"
                  " s -> CAST(s.y AS DOUBLE))").alias("ys")))
    init = (series.where(F.col("n_train") >= 15)
            .withColumn("m1", F.expr(
                "aggregate(slice(ys, 1, 7), 0.0D, (a, v) -> a + v)"
                " / CAST(7 AS DOUBLE)"))
            .withColumn("b0", F.expr(
                "(aggregate(slice(ys, 8, 7), 0.0D, (a, v) -> a + v)"
                " / CAST(7 AS DOUBLE) -"
                " aggregate(slice(ys, 1, 7), 0.0D, (a, v) -> a + v)"
                " / CAST(7 AS DOUBLE)) / CAST(7 AS DOUBLE)")))
    fitted = init.withColumn("st", F.expr(f"""
        aggregate(
          slice(ys, 8, CAST(n_train AS INT) - 7),
          array(m1, b0,
                element_at(ys, 1) - m1, element_at(ys, 2) - m1,
                element_at(ys, 3) - m1, element_at(ys, 4) - m1,
                element_at(ys, 5) - m1, element_at(ys, 6) - m1,
                element_at(ys, 7) - m1),
          (acc, e) -> {_hw_step_spark()})"""))
    fc = fitted.select("n_train",
                       F.element_at("st", 1).alias("level_fit"),
                       F.element_at("st", 2).alias("trend_fit"),
                       F.col("st").alias("state"))
    test = (rk.crossJoin(F.broadcast(fc))
            .where(F.col("rn") > F.col("n_train")))
    h = F.col("rn") - F.col("n_train")
    seas = F.element_at(
        "state", (3 + (h - 1) % 7).cast("int"))
    resid = F.col("y") - (F.col("level_fit") + h * F.col("trend_fit")
                          + seas)
    return (test.groupBy("n_train", "level_fit", "trend_fit")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"),
                 (F.sum(F.round(F.abs(resid), 9).cast("decimal(30,9)"))
                  .cast("double") / F.count(F.lit(1))).alias("mae"),
                 (F.sum(F.round(resid * resid, 6).cast("decimal(30,6)"))
                  .cast("double") / F.count(F.lit(1))).alias("mse"))
            .select("n_train", "level_fit", "trend_fit", "n_test",
                    "mae", "mse"))


# ---------------------------------------------------------------------------
# Mann-Whitney U: en vs rest document length (unpaired rank test)
# ---------------------------------------------------------------------------

_MWU_SQL = """
WITH g AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
),
ranked AS (
  SELECT grp, x,
         RANK() OVER (ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS midrank
  FROM g
),
s AS (
  SELECT CAST(SUM(CASE WHEN grp = 1
                       THEN CAST(2 * midrank AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2_1,
         CAST(SUM(grp) AS BIGINT) AS n1,
         CAST(SUM(1 - grp) AS BIGINT) AS n0,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked
),
ties AS (
  SELECT CAST(SUM(tt * tt * tt - tt) AS BIGINT) AS ts
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM g GROUP BY x)
)
SELECT n1 AS n_en, n0 AS n_other,
       r2_1 / CAST(2 AS DOUBLE) - n1 * (n1 + 1) / CAST(2 AS DOUBLE)
         AS u_stat,
       (r2_1 / CAST(2 AS DOUBLE) - n1 * (n1 + 1) / CAST(2 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) * n0) AS cl_effect,
       (r2_1 / CAST(2 AS DOUBLE) - n1 * (n1 + 1) / CAST(2 AS DOUBLE)
        - CAST(n1 AS DOUBLE) * n0 / 2)
         / NULLIF(sqrt(CAST(n1 AS DOUBLE) * n0 / 12
                       * ((n + 1) - ts / (CAST(n AS DOUBLE) * (n - 1)))),
                  0) AS z_score
FROM s CROSS JOIN ties
"""


@query("eval_mann_whitney_u", _MWU_SQL)
def eval_mann_whitney_u(spark, sf_dir):
    """MANN-WHITNEY U (Mann & Whitney 1947): the unpaired two-sample
    rank test on document length, en vs the rest — completes the
    nonparametric family (the repo had the PAIRED Wilcoxon signed-rank
    and the k-group Kruskal-Wallis; U is the canonical two-group
    member), with the tie-corrected normal approximation and the
    common-language effect size U/(n1 n0) = P(random en doc longer
    than random other doc). Midranks are exact halves so the rank sum
    is an exact bigint of 2*midrank; the tie term is pure integer; U,
    the effect size and z are closed-form IEEE on identical
    operands. One global rank + one combinable rollup."""
    g = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.col("n_chars").cast("bigint").alias("x"))
    midrank = (F.rank().over(W.orderBy("x"))
               + (F.count(F.lit(1)).over(W.partitionBy("x")) - 1) / 2.0)
    ranked = g.select("grp", "x", midrank.alias("midrank"))
    s = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, (2 * F.col("midrank"))
                     .cast("bigint")).otherwise(0))
        .cast("bigint").alias("r2_1"),
        F.sum("grp").cast("bigint").alias("n1"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("n0"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (g.groupBy("x")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
            .agg(F.sum(F.col("tt") * F.col("tt") * F.col("tt")
                       - F.col("tt")).cast("bigint").alias("ts")))
    n1, n0, n = F.col("n1"), F.col("n0"), F.col("n")
    u = (F.col("r2_1") / F.lit(2.0) - n1 * (n1 + 1) / F.lit(2.0))
    sd = F.sqrt(n1.cast("double") * n0 / 12
                * ((n + 1) - F.col("ts") / (n.cast("double") * (n - 1))))
    return (s.crossJoin(F.broadcast(ties))
            .select(n1.alias("n_en"), n0.alias("n_other"),
                    u.alias("u_stat"),
                    (u / (n1.cast("double") * n0)).alias("cl_effect"),
                    ((u - n1.cast("double") * n0 / 2)
                     / F.nullif(sd, F.lit(0.0))).alias("z_score")))


# ---------------------------------------------------------------------------
# two-proportion z-test: length-gate pass rate, en vs rest
# ---------------------------------------------------------------------------

_PZ_SQL = """
WITH g AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pass
  FROM documents
),
m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pass) AS BIGINT) AS k
  FROM g GROUP BY grp
),
p AS (
  SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN k END) AS k1,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN k END) AS k0
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n0 AS BIGINT) AS n_other,
       k1 / CAST(n1 AS DOUBLE) - k0 / CAST(n0 AS DOUBLE) AS rate_diff,
       (k1 / CAST(n1 AS DOUBLE) - k0 / CAST(n0 AS DOUBLE))
         / NULLIF(sqrt(((k1 + k0) / CAST(n1 + n0 AS DOUBLE))
                       * (1 - (k1 + k0) / CAST(n1 + n0 AS DOUBLE))
                       * (1.0 / n1 + 1.0 / n0)), 0) AS z_pooled,
       (ABS(k1 / CAST(n1 AS DOUBLE) - k0 / CAST(n0 AS DOUBLE))
        - (1.0 / n1 + 1.0 / n0) / 2)
         / NULLIF(sqrt(((k1 + k0) / CAST(n1 + n0 AS DOUBLE))
                       * (1 - (k1 + k0) / CAST(n1 + n0 AS DOUBLE))
                       * (1.0 / n1 + 1.0 / n0)), 0) AS z_continuity
FROM p
"""


@query("eval_proportions_ztest", _PZ_SQL)
def eval_proportions_ztest(spark, sf_dir):
    """TWO-PROPORTION z-test (pooled SE, with the Yates continuity-
    corrected variant): is the length-gate pass rate different for
    English vs the rest — the significance TEST that pairs with the
    Cohen's h effect SIZE on the identical contingency (the repo's
    test+magnitude pattern: Welch t + Cohen's d, here z + h). All
    counts are exact integers from one combinable aggregation; rates,
    the pooled SE and both z variants are straight-line IEEE on
    identical operands."""
    d = t(spark, sf_dir, "documents")
    g = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pass"))
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pass").cast("bigint").alias("k"))
    p = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("k"))).alias("k1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("k"))).alias("k0"))
    n1, k1, n0, k0 = (F.col("n1"), F.col("k1"), F.col("n0"), F.col("k0"))
    diff = k1 / n1.cast("double") - k0 / n0.cast("double")
    pp = (k1 + k0) / (n1 + n0).cast("double")
    se = F.sqrt(pp * (1 - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n0))
    cc = (F.lit(1.0) / n1 + F.lit(1.0) / n0) / 2
    return p.select(
        n1.cast("bigint").alias("n_en"), n0.cast("bigint").alias("n_other"),
        diff.alias("rate_diff"),
        (diff / F.nullif(se, F.lit(0.0))).alias("z_pooled"),
        ((F.abs(diff) - cc) / F.nullif(se, F.lit(0.0)))
        .alias("z_continuity"))
