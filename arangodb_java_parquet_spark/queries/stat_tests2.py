"""Second classical-tests wave (r13b): variance homogeneity (Bartlett),
heteroscedastic one-way ANOVA (Welch), the Hill tail-index estimator,
Fisher's EXACT 2x2 test, and sample entropy.

Why these: Bartlett is the parametric variance-homogeneity gate whose
verdict decides between plain and Welch ANOVA (Brown-Forsythe, already
in the registry, is its robust twin); WELCH's F* is what you run when
that gate fails — the default recommendation in modern texts; the HILL
estimator reads the Pareto tail index off the top order statistics —
the heavy-tail diagnostic for value/revenue columns that moments can't
see (a tail index < 2 means the variance every other entry reports is
unstable); FISHER's exact test replaces the chi-square 2x2 when cells
are small — done here entirely in-engine via an exact log-factorial
table (a window cumsum), which is the part engines usually punt to
scipy; SAMPLE ENTROPY (Richman & Moorman 2000) is the
regularity/complexity readout for the daily series beside spectral
entropy and Hurst — low SampEn means the series repeats its own
templates and is predictable.

Determinism: group moments are exact integer sums; variance ratios are
single-shape IEEE expressions; every ln/exp is round-9 fenced and every
cross-group reduction an exact decimal sum; Bartlett pre-scales by the
exact binary 2^-20 (scale-invariant statistic, keeps squared sums under
the round-9 fence ceiling); Fisher's log-factorials are one round-9
decimal cumsum reused by every pmf term; SampEn counts are pure integer
comparisons against an identical double tolerance.
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.changepoint import (
    _DAILY_SQL, _daily)
from arangodb_java_parquet_spark.queries.common import query, t

# shared SQL: per-language exact moments of n_chars (k = 5 groups)
_LANG_MOMENTS_SQL = """
WITH g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang
)
"""


def _lang_moments(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint")
        .alias("s2"))


@query("stats_bartlett", _LANG_MOMENTS_SQL + """
, per AS (
  SELECT n,
         -- 2^-20-prescaled group variance (scale cancels in the stat).
         -- Multiplied in DOUBLE: n*s2 grows quadratically with docs and
         -- overflows BIGINT ~10x past sf1 (DuckDB raises, non-ANSI
         -- Spark wraps) — operands are individually exact, the IEEE
         -- product is deterministic (the drift_cramer_von_mises rule)
         (n * CAST(s2 AS DOUBLE) - s1 * CAST(s1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * (n - 1))
           / CAST(1048576 AS DOUBLE) AS v
  FROM g
),
acc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(CAST(ROUND((n - 1) * v, 6) AS DECIMAL(30,6)))
              AS DOUBLE) AS ssw,
         CAST(SUM(CAST(ROUND((n - 1) * ROUND(LN(v), 9), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sln,
         CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / (n - 1), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS sinv
  FROM per
)
SELECT k AS k_groups, nt AS n_total,
       ((nt - k) * ROUND(LN(ssw / (nt - k)), 9) - sln)
         / (1 + (sinv - CAST(1 AS DOUBLE) / (nt - k)) / (3 * (k - 1)))
         AS bartlett_stat,
       CAST(k - 1 AS BIGINT) AS df
FROM acc
""")
def stats_bartlett(spark, sf_dir):
    """BARTLETT'S TEST of variance homogeneity (Bartlett 1937) for
    n_chars across the 5 languages: M/C with M = (N-k) ln s_p^2 -
    sum (n_i-1) ln s_i^2 — the parametric gate whose rejection sends
    the analysis to Welch's ANOVA / Brown-Forsythe (both beside it in
    the registry). Group variances come from exact integer moments
    prescaled by the exact binary 2^-20 (the statistic is
    scale-invariant: the ln shift multiplies (N-k) - sum(n_i-1) = 0);
    each ln is round-9 fenced, the three cross-group reductions are
    exact decimal sums (round-6 for the ~1e4-magnitude weighted-ln
    terms), and M/C is straight-line IEEE on identical doubles. One
    combinable group rollup + one 5-row reduction."""
    g = _lang_moments(spark, sf_dir)
    v = ((F.col("n") * F.col("s2").cast("double")
          - F.col("s1") * F.col("s1").cast("double"))
         / (F.col("n").cast("double") * (F.col("n") - 1))
         / F.lit(float(1 << 20)))
    per = g.select("n", v.alias("v"))
    acc = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.round((F.col("n") - 1) * F.col("v"), 6)
              .cast("decimal(30,6)")).cast("double").alias("ssw"),
        F.sum(F.round((F.col("n") - 1) * F.round(F.log("v"), 9), 6)
              .cast("decimal(30,6)")).cast("double").alias("sln"),
        F.sum(F.round(F.lit(1.0) / (F.col("n") - 1), 9)
              .cast("decimal(20,9)")).cast("double").alias("sinv"))
    k, nt = F.col("k"), F.col("nt")
    m = ((nt - k) * F.round(F.log(F.col("ssw") / (nt - k)), 9)
         - F.col("sln"))
    c = 1 + (F.col("sinv") - F.lit(1.0) / (nt - k)) / (3 * (k - 1))
    return acc.select(k.alias("k_groups"), nt.alias("n_total"),
                      (m / c).alias("bartlett_stat"),
                      (k - 1).cast("bigint").alias("df"))


@query("stats_welch_anova", _LANG_MOMENTS_SQL + """
, per AS (
  SELECT n,
         s1 / CAST(n AS DOUBLE) AS m,
         -- variance multiplied in DOUBLE (BIGINT n*s2 overflows at
         -- scale; the drift_cramer_von_mises rule)
         n / ((n * CAST(s2 AS DOUBLE) - s1 * CAST(s1 AS DOUBLE))
              / (CAST(n AS DOUBLE) * (n - 1))) AS w
  FROM g
),
t1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(w, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(ROUND(w * m, 6) AS DECIMAL(30,6))) AS DOUBLE) AS swm
  FROM per
),
t2 AS (
  SELECT t1.k, t1.sw,
         CAST(SUM(CAST(ROUND(p.w * (p.m - t1.swm / t1.sw)
                             * (p.m - t1.swm / t1.sw), 6)
                       AS DECIMAL(30,6))) AS DOUBLE) AS sb,
         CAST(SUM(CAST(ROUND((1 - p.w / t1.sw) * (1 - p.w / t1.sw)
                             / (p.n - 1), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS sl
  FROM per p CROSS JOIN t1
  GROUP BY t1.k, t1.sw
)
SELECT k AS k_groups,
       (sb / (k - 1))
         / (1 + 2 * CAST(k - 2 AS DOUBLE) / (k * k - 1) * sl)
         AS welch_f,
       (CAST(k AS DOUBLE) * k - 1) / (3 * sl) AS df_denom
FROM t2
""")
def stats_welch_anova(spark, sf_dir):
    """WELCH'S HETEROSCEDASTIC ONE-WAY ANOVA (Welch 1951) of n_chars
    across languages: F* = [sum w_i (m_i - mbar)^2/(k-1)] /
    [1 + 2(k-2)/(k^2-1) * sum (1-w_i/W)^2/(n_i-1)] with precision
    weights w_i = n_i/s_i^2 — what you run when Bartlett (beside it)
    rejects equal variances; completes the one-way family
    (Kruskal-Wallis rank-based, Brown-Forsythe robust, Welch
    parametric-unequal). Group means/variances are single-shape IEEE
    on exact integer moments; the two 5-row reductions fence each
    term round-9/round-6 into exact decimal sums (weighted squared
    deviations sit at ~1e4 magnitude — round-6 per the squared-
    deviation rule); the weighted grand mean enters as the IDENTICAL
    swm/sw double on both engines. Emits the Welch-Satterthwaite
    denominator df alongside."""
    g = _lang_moments(spark, sf_dir)
    per = g.select(
        "n",
        (F.col("s1") / F.col("n").cast("double")).alias("m"),
        (F.col("n") / ((F.col("n") * F.col("s2").cast("double")
                        - F.col("s1") * F.col("s1").cast("double"))
                       / (F.col("n").cast("double")
                          * (F.col("n") - 1)))).alias("w"))
    t1 = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round(F.col("w"), 9).cast("decimal(20,9)"))
        .cast("double").alias("sw"),
        F.sum(F.round(F.col("w") * F.col("m"), 6).cast("decimal(30,6)"))
        .cast("double").alias("swm"))
    dev = F.col("m") - F.col("swm") / F.col("sw")
    t2 = (per.crossJoin(F.broadcast(t1))
          .groupBy("k", "sw")
          .agg(F.sum(F.round(F.col("w") * dev * dev, 6)
                     .cast("decimal(30,6)")).cast("double").alias("sb"),
               F.sum(F.round((1 - F.col("w") / F.col("sw"))
                             * (1 - F.col("w") / F.col("sw"))
                             / (F.col("n") - 1), 9)
                     .cast("decimal(20,9)")).cast("double").alias("sl")))
    k = F.col("k")
    f = ((F.col("sb") / (k - 1))
         / (1 + 2 * (k - 2).cast("double") / (k * k - 1) * F.col("sl")))
    return t2.select(k.alias("k_groups"), f.alias("welch_f"),
                     ((k.cast("double") * k - 1) / (3 * F.col("sl")))
                     .alias("df_denom"))


_HILL_K = 100


@query("stats_hill_tail_index", f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS i
  FROM cust
),
thr AS (SELECT rev AS x_k1 FROM rk WHERE i = {_HILL_K} + 1),
top AS (
  SELECT t.x_k1, ROUND(LN(rk.rev / t.x_k1), 9) AS lr
  FROM rk CROSS JOIN thr t WHERE rk.i <= {_HILL_K}
)
-- grouped on the threshold so a store with <= k customers yields ZERO
-- rows on BOTH engines (an ungrouped aggregate would emit one all-NULL
-- row here while the Spark side emits none — row-count mismatch)
SELECT CAST({_HILL_K} AS BIGINT) AS k_order_stats,
       x_k1 AS threshold,
       CAST(SUM(CAST(lr AS DECIMAL(20,9))) AS DOUBLE) / {_HILL_K}
         AS hill_gamma,
       {_HILL_K} / CAST(SUM(CAST(lr AS DECIMAL(20,9))) AS DOUBLE)
         AS tail_alpha
FROM top GROUP BY x_k1
""")
def stats_hill_tail_index(spark, sf_dir):
    """HILL TAIL-INDEX ESTIMATOR (Hill 1975) on per-customer revenue:
    gamma = (1/k) sum ln(x_(i)/x_(k+1)) over the k = 100 largest
    order statistics, alpha = 1/gamma — the Pareto tail exponent
    moments cannot see (alpha < 2 means the sample variance every
    other revenue entry quotes is unstable; the standard heavy-tail
    screen before trusting any mean-based capacity plan, and the
    value-column twin of graph_powerlaw_alpha's degree MLE). Revenue
    is an exact decimal sum; the ln ratios are round-9 fenced into
    one exact decimal sum; threshold and estimates are IEEE on
    identical doubles with a deterministic (rev desc, custkey) rank.
    At 100 TB the global rank window becomes an approx-quantile
    threshold + one filter — the estimator only ever touches the
    top-k tail."""
    o = t(spark, sf_dir, "orders")
    cust = (o.groupBy("o_custkey")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                 .cast("double").alias("rev")))
    rk = cust.select(
        "rev", F.row_number().over(
            W.orderBy(F.desc("rev"), F.asc("o_custkey"))).alias("i")) \
        .transform(materialize)  # feeds threshold + top slice
    thr = rk.filter(F.col("i") == _HILL_K + 1).select(
        F.col("rev").alias("x_k1"))
    top = (rk.filter(F.col("i") <= _HILL_K)
           .crossJoin(F.broadcast(thr))
           .select(F.round(F.log(F.col("rev") / F.col("x_k1")), 9)
                   .alias("lr"), "x_k1"))
    s = F.sum(F.col("lr").cast("decimal(20,9)")).cast("double")
    return top.groupBy("x_k1").agg(
        F.lit(_HILL_K).cast("bigint").alias("k_order_stats"),
        s.alias("_s")).select(
        "k_order_stats", F.col("x_k1").alias("threshold"),
        (F.col("_s") / _HILL_K).alias("hill_gamma"),
        (_HILL_K / F.col("_s")).alias("tail_alpha"))


@query("stats_fisher_exact_2x2", """
WITH cells AS (
  SELECT CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS r1,
         CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents
),
lf AS (
  SELECT x,
         CAST(SUM(CAST(ROUND(LN(CAST(x AS DOUBLE)), 9) AS DECIMAL(30,9)))
              OVER (ORDER BY x) AS DOUBLE) AS f
  FROM (SELECT UNNEST(range(1, (SELECT n FROM cells) + 1)) AS x)
  UNION ALL SELECT 0, CAST(0 AS DOUBLE)
),
supp AS (
  SELECT c.a, c.r1, c.c1, c.n, k.k
  FROM cells c,
       (SELECT UNNEST(range(0, (SELECT n FROM cells) + 1)) AS k) k
  WHERE k.k >= greatest(0, c.r1 + c.c1 - c.n)
    AND k.k <= least(c.r1, c.c1)
),
pmf AS (
  SELECT s.a, s.k,
         fr1.f + fr2.f + fc1.f + fc2.f - fn.f
           - fk.f - fak.f - fbk.f - fdk.f AS logp
  FROM supp s
  JOIN lf fr1 ON fr1.x = s.r1
  JOIN lf fr2 ON fr2.x = s.n - s.r1
  JOIN lf fc1 ON fc1.x = s.c1
  JOIN lf fc2 ON fc2.x = s.n - s.c1
  JOIN lf fn  ON fn.x  = s.n
  JOIN lf fk  ON fk.x  = s.k
  JOIN lf fak ON fak.x = s.r1 - s.k
  JOIN lf fbk ON fbk.x = s.c1 - s.k
  JOIN lf fdk ON fdk.x = s.n - s.r1 - s.c1 + s.k
),
obs AS (SELECT logp AS logp_obs FROM pmf WHERE k = a)
SELECT (SELECT a FROM cells) AS a_observed,
       (SELECT n FROM cells) AS n_total,
       o.logp_obs,
       CAST(SUM(CASE WHEN p.logp <= o.logp_obs + 1e-7
                     THEN CAST(ROUND(exp(p.logp), 9) AS DECIMAL(20,9))
                     ELSE CAST(0 AS DECIMAL(20,9)) END) AS DOUBLE)
         AS p_two_sided
FROM pmf p CROSS JOIN obs o
GROUP BY o.logp_obs
""")
def stats_fisher_exact_2x2(spark, sf_dir):
    """FISHER'S EXACT TEST (Fisher 1935) for the 2x2 table lang=en x
    n_chars>=300, computed ENTIRELY in-engine: the hypergeometric pmf
    over the full support rides one exact log-factorial table — a
    round-9 decimal CUMSUM window over ln(1..n) — so every pmf term is
    a fixed sum of nine identical doubles; the two-sided p sums
    round-9 exp of the terms at least as extreme as observed (the
    standard 1e-7 slack, compared identically on identical doubles).
    This is the small-cell replacement for the chi-square entry that
    engines usually punt to scipy. The support enumeration is
    margin-bounded (never n^2); the log-factorial table is O(n) rows
    with 9 lookup joins over the bounded support."""
    d = t(spark, sf_dir, "documents")
    cells = d.agg(
        F.sum(F.when((F.col("lang") == "en") & (F.col("n_chars") >= 300),
                     1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint").alias("r1"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0))
        .cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n"))
    # Scalar bound for the range tables. The bound IS the unfiltered
    # documents row count, which the parquet FOOTER already records —
    # read it via pyarrow metadata (O(1), no Spark job) so query
    # CONSTRUCTION stays action-free (ADVICE r13: the previous eager
    # cells.first() ran a full documents scan at construction time,
    # taxing every registry-wide plan/report pass). At 100 TB this is
    # a sum of footer num_rows over the file listing — still
    # metadata-only, never a data scan.
    # ADVICE r14: the driver may regenerate /root/testdata with a
    # DIRECTORY (multi-file) parquet layout — ParquetFile() would then
    # raise at query CONSTRUCTION even though spark.read handles both.
    # read_metadata covers the single-file case; the fallback sums
    # footer num_rows over dataset fragments (still metadata-only).
    import pyarrow.lib as _pa_lib
    import pyarrow.parquet as _pq
    _doc_path = os.path.join(sf_dir, "documents.parquet")
    try:
        n_val = _pq.read_metadata(_doc_path).num_rows
    except (OSError, _pa_lib.ArrowInvalid):
        n_val = sum(f.metadata.num_rows
                    for f in _pq.ParquetDataset(_doc_path).fragments)
    lf = (spark.range(1, n_val + 1)
          .select(F.col("id").alias("x"),
                  F.sum(F.round(F.log(F.col("id").cast("double")), 9)
                        .cast("decimal(30,9)"))
                  .over(W.orderBy("id").rowsBetween(
                      W.unboundedPreceding, W.currentRow))
                  .cast("double").alias("f"))
          .unionAll(spark.range(1).select(
              F.lit(0).cast("bigint").alias("x"),
              F.lit(0.0).alias("f")))
          .transform(materialize))  # 9 lookup consumers
    supp = (spark.range(0, n_val + 1).select(F.col("id").alias("k"))
            .crossJoin(F.broadcast(cells))
            .filter((F.col("k") >= F.greatest(
                F.lit(0).cast("bigint"),
                F.col("r1") + F.col("c1") - F.col("n")))
                & (F.col("k") <= F.least(F.col("r1"), F.col("c1")))))

    def look(df, xcol, alias):
        lfa = lf.select(F.col("x").alias(f"_x_{alias}"),
                        F.col("f").alias(alias))
        return df.join(F.broadcast(lfa), xcol == F.col(f"_x_{alias}")) \
                 .drop(f"_x_{alias}")

    p = supp
    p = look(p, F.col("r1"), "fr1")
    p = look(p, F.col("n") - F.col("r1"), "fr2")
    p = look(p, F.col("c1"), "fc1")
    p = look(p, F.col("n") - F.col("c1"), "fc2")
    p = look(p, F.col("n"), "fn")
    p = look(p, F.col("k"), "fk")
    p = look(p, F.col("r1") - F.col("k"), "fak")
    p = look(p, F.col("c1") - F.col("k"), "fbk")
    p = look(p, F.col("n") - F.col("r1") - F.col("c1") + F.col("k"), "fdk")
    pmf = p.select(
        "a", "n", "k",
        (F.col("fr1") + F.col("fr2") + F.col("fc1") + F.col("fc2")
         - F.col("fn") - F.col("fk") - F.col("fak") - F.col("fbk")
         - F.col("fdk")).alias("logp")).transform(materialize)
    obs = pmf.filter(F.col("k") == F.col("a")).select(
        F.col("logp").alias("logp_obs"))
    return (pmf.crossJoin(F.broadcast(obs))
            .groupBy("logp_obs")
            .agg(F.max("a").alias("a_observed"),
                 F.max("n").alias("n_total"),
                 F.sum(F.when(F.col("logp") <= F.col("logp_obs") + 1e-7,
                              F.round(F.exp(F.col("logp")), 9)
                              .cast("decimal(20,9)"))
                       .otherwise(F.lit(0).cast("decimal(20,9)")))
                 .cast("double").alias("p_two_sided"))
            .select("a_observed", "n_total", "logp_obs", "p_two_sided"))


@query("timeseries_sample_entropy", _DAILY_SQL + """
, idx AS (
  SELECT y,
         LEAD(y)    OVER (ORDER BY day) AS y1,
         LEAD(y, 2) OVER (ORDER BY day) AS y2,
         ROW_NUMBER() OVER (ORDER BY day) AS i
  FROM daily
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s1, CAST(SUM(y * y) AS BIGINT) AS s2
  FROM idx
),
tol AS (
  SELECT n, CAST(greatest(floor(
           -- variance multiplied in DOUBLE (BIGINT n*s2 overflows at
           -- scale; the drift_cramer_von_mises rule)
           sqrt((n * CAST(s2 AS DOUBLE) - s1 * CAST(s1 AS DOUBLE))
                / (CAST(n AS DOUBLE) * (n - 1)))
           / CAST(5 AS DOUBLE)), 1) AS BIGINT) AS r
  FROM m
),
pairs AS (
  -- Richman-Moorman convention: BOTH the length-2 (B) and length-3 (A)
  -- counts run over the first N-m templates only (y2 non-null), so B
  -- never counts a template that has no length-3 continuation
  SELECT a.i AS ia, b.i AS ib, t.n, t.r,
         CASE WHEN abs(a.y - b.y) <= t.r AND abs(a.y1 - b.y1) <= t.r
              THEN 1 ELSE 0 END AS mb,
         CASE WHEN abs(a.y - b.y) <= t.r AND abs(a.y1 - b.y1) <= t.r
               AND abs(a.y2 - b.y2) <= t.r
              THEN 1 ELSE 0 END AS ma
  FROM idx a JOIN idx b ON a.i < b.i
  CROSS JOIN tol t
  WHERE a.y2 IS NOT NULL AND b.y2 IS NOT NULL
),
c AS (
  SELECT MAX(n) AS n_days, MAX(r) AS r_tolerance,
         CAST(SUM(mb) AS BIGINT) AS b_count,
         CAST(SUM(ma) AS BIGINT) AS a_count
  FROM pairs
)
SELECT n_days, r_tolerance, b_count, a_count,
       0 - ROUND(LN(NULLIF(a_count, 0)
                    / CAST(NULLIF(b_count, 0) AS DOUBLE)), 9)
         AS sampen
FROM c
""")
def timeseries_sample_entropy(spark, sf_dir):
    """SAMPLE ENTROPY (Richman & Moorman 2000; m = 2, r = floor(sd/5))
    of the daily order-count series: -ln(A/B) where B counts template
    pairs of length 2 within tolerance r and A the pairs that stay
    within r at length 3 — low SampEn means the series repeats its own
    patterns (predictable), high means structureless; the
    complexity/regularity readout beside spectral entropy and Hurst
    R/S. The tolerance is an exact INTEGER (floor of the
    identical-double sd/5, floored at 1) so every match is a pure
    integer comparison; A/B is one exact ratio and the ln round-9. The
    pairwise template join is a deliberate bounded O(d^2) over the
    CALENDAR-SIZED day table (~2.4k rows -> ~3M codegen comparisons),
    never the raw corpus — at 100 TB the day table is the same size
    and the corpus-scale work remains the daily rollup."""
    daily = _daily(spark, sf_dir)  # the shared day-series base
    w = W.orderBy("day")
    idx = (daily.select(
        "y", F.lead("y").over(w).alias("y1"),
        F.lead("y", 2).over(w).alias("y2"),
        F.row_number().over(w).alias("i"))
        .transform(materialize))  # both sides of the pair join
    m = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("y").cast("bigint").alias("s1"),
                F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s2"))
    # variance multiplied in DOUBLE (BIGINT n*s2 overflows at scale;
    # the drift_cramer_von_mises rule — caught by tools/oracle_lint.py)
    sd = F.sqrt((F.col("n") * F.col("s2").cast("double")
                 - F.col("s1") * F.col("s1").cast("double"))
                / (F.col("n").cast("double") * (F.col("n") - 1)))
    tol = m.select("n", F.greatest(F.floor(sd / F.lit(5.0)), F.lit(1))
                   .cast("bigint").alias("r"))
    a = idx.select(F.col("i").alias("ia"), F.col("y").alias("ya"),
                   F.col("y1").alias("ya1"), F.col("y2").alias("ya2"))
    b = idx.select(F.col("i").alias("ib"), F.col("y").alias("yb"),
                   F.col("y1").alias("yb1"), F.col("y2").alias("yb2"))
    # broadcast the (calendar-bounded) right side: a non-equi inner join
    # must plan as BroadcastNestedLoop, never CartesianProduct
    # Richman-Moorman: both counts over the first N-m templates only
    pairs = (a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
             .crossJoin(F.broadcast(tol))
             .filter(F.col("ya2").isNotNull() & F.col("yb2").isNotNull()))
    near = lambda x, y: F.abs(F.col(x) - F.col(y)) <= F.col("r")  # noqa: E731
    mb = F.when(near("ya", "yb") & near("ya1", "yb1"), 1).otherwise(0)
    ma = F.when(near("ya", "yb") & near("ya1", "yb1")
                & near("ya2", "yb2"), 1).otherwise(0)
    c = pairs.agg(F.max("n").alias("n_days"),
                  F.max("r").alias("r_tolerance"),
                  F.sum(mb).cast("bigint").alias("b_count"),
                  F.sum(ma).cast("bigint").alias("a_count"))
    # 0.0 - round(...) (not unary minus): matches the oracle's 0 - ROUND
    # shape and avoids the -0.0 repr split when A == B rounds to zero
    return c.select(
        "n_days", "r_tolerance", "b_count", "a_count",
        # NULLIF on BOTH counts (ADVICE r13): a_count = 0 would make
        # DuckDB raise on LN(0) while Spark's F.log returns NULL —
        # sampen must be NULL on both engines when no length-3 template
        # pair matches.
        (F.lit(0.0) - F.round(F.log(F.nullif(F.col("a_count"), F.lit(0))
                                    / F.nullif(F.col("b_count"), F.lit(0))
                                    .cast("double")), 9)).alias("sampen"))
