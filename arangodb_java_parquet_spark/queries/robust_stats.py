"""Robust / nonparametric corpus decision statistics, wave r12e.

Five more standard inferential tools over the curation tables: Chao1 and
ACE species-richness estimators (how much vocabulary have we NOT seen
yet — the coverage planner's companion to Good-Turing), the Friedman
blocked rank test with Kendall's W (is quarterly seasonality consistent
across years), the Anderson-Darling uniformity test applied to the
engine's own md5 sampling keys (a self-audit that hash-based deterministic
sampling is actually uniform), the Grubbs maximum-studentized-deviate
statistic on daily revenue (which single day is the strongest outlier),
and Cochran's Q over three binary quality gates (do the filters reject at
systematically different rates).

Determinism: everything reduces to exact BIGINT count/moment sums (ranks
as 2*midrank, money as exact cents / whole units, gate indicators as 0/1
integers); the only float reductions are round-fenced decimal sums of
logarithm terms in Anderson-Darling. Fixed small pivots (4 quarters, 3
gates) eliminate order-dependent cross-group float sums entirely.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# Chao1 + ACE vocabulary-richness estimators per source
# ---------------------------------------------------------------------------

_CHAO_SQL = """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
coc AS (SELECT source, c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM st GROUP BY 1, 2),
agg AS (
  SELECT source,
         CAST(SUM(n_r) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN r = 2 THEN n_r ELSE 0 END) AS BIGINT) AS f2,
         CAST(SUM(CASE WHEN r <= 10 THEN n_r ELSE 0 END) AS BIGINT)
           AS s_rare,
         CAST(SUM(CASE WHEN r > 10 THEN n_r ELSE 0 END) AS BIGINT)
           AS s_abund,
         CAST(SUM(CASE WHEN r <= 10 THEN r * n_r ELSE 0 END) AS BIGINT)
           AS n_rare,
         CAST(SUM(CASE WHEN r <= 10 THEN r * (r - 1) * n_r ELSE 0 END)
              AS BIGINT) AS sum_rr1
  FROM coc GROUP BY source
),
est AS (
  SELECT source, s_obs, f1, f2, s_rare, s_abund, n_rare,
         1.0 - f1 / CAST(NULLIF(n_rare, 0) AS DOUBLE) AS c_ace,
         sum_rr1
  FROM agg
)
SELECT source, s_obs, f1, f2,
       s_obs + f1 * (f1 - 1) / (CAST(2 AS DOUBLE) * (f2 + 1)) AS chao1_bc,
       s_abund + s_rare / NULLIF(c_ace, 0)
         + (f1 / NULLIF(c_ace, 0))
           * GREATEST((s_rare / NULLIF(c_ace, 0)) * sum_rr1
                      / (CAST(n_rare AS DOUBLE)
                         * NULLIF(n_rare - 1, 0)) - 1.0, 0.0) AS ace
FROM est
"""


@query("vocab_chao1_ace", _CHAO_SQL)
def vocab_chao1_ace(spark, sf_dir):
    """CHAO1 (bias-corrected; Chao 1984) and ACE (Chao & Lee 1992)
    species-richness estimators of the per-source vocabulary: from the
    count-of-counts table alone they extrapolate how many word types
    the source has that the crawl has NOT yet seen — the coverage
    planning number that says whether another 10 TB of this source
    still buys new vocabulary (pairs with the Good-Turing unseen mass
    and the Heaps'-law fit). Everything is exact integer
    count-of-counts arithmetic (f1, f2, rare/abundant splits at the
    conventional r<=10 cut); the estimators are straight-line IEEE
    ratios with NULLIF guards for the degenerate no-rare-types corpus.
    Two combinable aggregations over the token table."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("source",
                    F.explode(F.split(F.col("text"), " ")).alias("tok"))
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    coc = st.groupBy("source", F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r"))
    agg = coc.groupBy("source").agg(
        F.sum("n_r").cast("bigint").alias("s_obs"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(0))
        .cast("bigint").alias("f1"),
        F.sum(F.when(F.col("r") == 2, F.col("n_r")).otherwise(0))
        .cast("bigint").alias("f2"),
        F.sum(F.when(F.col("r") <= 10, F.col("n_r")).otherwise(0))
        .cast("bigint").alias("s_rare"),
        F.sum(F.when(F.col("r") > 10, F.col("n_r")).otherwise(0))
        .cast("bigint").alias("s_abund"),
        F.sum(F.when(F.col("r") <= 10, F.col("r") * F.col("n_r"))
              .otherwise(0)).cast("bigint").alias("n_rare"),
        F.sum(F.when(F.col("r") <= 10,
                     F.col("r") * (F.col("r") - 1) * F.col("n_r"))
              .otherwise(0)).cast("bigint").alias("sum_rr1"))
    c_ace = (1.0 - F.col("f1")
             / F.nullif(F.col("n_rare"), F.lit(0)).cast("double"))
    est = agg.select("source", "s_obs", "f1", "f2", "s_rare", "s_abund",
                     "n_rare", c_ace.alias("c_ace"), "sum_rr1")
    gamma = F.greatest(
        (F.col("s_rare") / F.nullif(F.col("c_ace"), F.lit(0.0)))
        * F.col("sum_rr1")
        / (F.col("n_rare").cast("double")
           * F.nullif(F.col("n_rare") - 1, F.lit(0))) - 1.0,
        F.lit(0.0))
    return est.select(
        "source", "s_obs", "f1", "f2",
        (F.col("s_obs") + F.col("f1") * (F.col("f1") - 1)
         / (2.0 * (F.col("f2") + 1))).alias("chao1_bc"),
        (F.col("s_abund")
         + F.col("s_rare") / F.nullif(F.col("c_ace"), F.lit(0.0))
         + (F.col("f1") / F.nullif(F.col("c_ace"), F.lit(0.0))) * gamma)
        .alias("ace"))


# ---------------------------------------------------------------------------
# Friedman blocked rank test: quarterly revenue ranks across years
# ---------------------------------------------------------------------------

_FRIEDMAN_SQL = """
WITH cells AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         quarter(CAST(o_orderdate AS DATE)) AS q,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
full_years AS (
  SELECT yr FROM cells GROUP BY yr HAVING COUNT(*) = 4
),
ranked AS (
  SELECT c.yr, c.q,
         RANK() OVER (PARTITION BY c.yr ORDER BY c.cents)
           + (COUNT(*) OVER (PARTITION BY c.yr, c.cents) - 1) / 2.0
           AS midrank
  FROM cells c JOIN full_years f ON f.yr = c.yr
),
sums AS (
  SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN q = 1
                       THEN CAST(2 * midrank AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2_1,
         CAST(SUM(CASE WHEN q = 2
                       THEN CAST(2 * midrank AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2_2,
         CAST(SUM(CASE WHEN q = 3
                       THEN CAST(2 * midrank AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2_3,
         CAST(SUM(CASE WHEN q = 4
                       THEN CAST(2 * midrank AS BIGINT) ELSE 0 END)
              AS BIGINT) AS r2_4
  FROM ranked
)
SELECT n AS n_years,
       r2_1 / CAST(2 AS DOUBLE) AS rank_sum_q1,
       r2_2 / CAST(2 AS DOUBLE) AS rank_sum_q2,
       r2_3 / CAST(2 AS DOUBLE) AS rank_sum_q3,
       r2_4 / CAST(2 AS DOUBLE) AS rank_sum_q4,
       CAST(3 AS DOUBLE) * (r2_1 * r2_1 + r2_2 * r2_2 + r2_3 * r2_3
                            + r2_4 * r2_4)
         / (20 * n) - CAST(15 AS DOUBLE) * n AS chi2_friedman,
       (CAST(3 AS DOUBLE) * (r2_1 * r2_1 + r2_2 * r2_2 + r2_3 * r2_3
                             + r2_4 * r2_4)
         / (20 * n) - CAST(15 AS DOUBLE) * n)
         / (CAST(3 AS DOUBLE) * n) AS kendalls_w
FROM sums
"""


@query("eval_friedman_quarters", _FRIEDMAN_SQL)
def eval_friedman_quarters(spark, sf_dir):
    """FRIEDMAN blocked rank test (Friedman 1937) + KENDALL'S W: within
    each complete year (the block) rank the four quarterly revenue
    totals; chi2_F = 12/(n k(k+1)) sum R_j^2 - 3n(k+1) asks whether
    some quarter is SYSTEMATICALLY high across years — the
    significance companion to the seasonal-index point estimate
    (monthly_seasonal_index), robust to year-over-year growth because
    ranking happens within the block. W = chi2/(n(k-1)) in [0,1] is
    the agreement strength. Quarterly cents are exact integers, the
    within-year midranks exact halves, rank sums exact bigints of
    2*midrank, and with k=4 FIXED the statistic is a closed pivoted
    rational — no float reduction anywhere. One combinable quarterly
    rollup; the rank window partitions by year (28 cells)."""
    o = t(spark, sf_dir, "orders")
    cells = (o.groupBy(F.year(F.col("o_orderdate").cast("date")).alias("yr"),
                       F.quarter(F.col("o_orderdate").cast("date"))
                       .alias("q"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                  .cast("bigint").alias("cents")))
    full_years = (cells.groupBy("yr").agg(F.count(F.lit(1)).alias("nq"))
                  .filter(F.col("nq") == 4).select("yr"))
    midrank = (F.rank().over(W.partitionBy("yr").orderBy("cents"))
               + (F.count(F.lit(1)).over(W.partitionBy("yr", "cents")) - 1)
               / 2.0)
    ranked = (cells.join(F.broadcast(full_years), "yr")
              .select("yr", "q", midrank.alias("midrank")))
    r2 = [F.sum(F.when(F.col("q") == j, (2 * F.col("midrank"))
                       .cast("bigint")).otherwise(0))
          .cast("bigint").alias(f"r2_{j}") for j in (1, 2, 3, 4)]
    sums = ranked.agg(
        F.countDistinct("yr").cast("bigint").alias("n"), *r2)
    ssq = sum(F.col(f"r2_{j}") * F.col(f"r2_{j}") for j in (1, 2, 3, 4))
    chi2 = (F.lit(3.0) * ssq / (20 * F.col("n"))
            - F.lit(15.0) * F.col("n"))
    return sums.select(
        F.col("n").alias("n_years"),
        (F.col("r2_1") / F.lit(2.0)).alias("rank_sum_q1"),
        (F.col("r2_2") / F.lit(2.0)).alias("rank_sum_q2"),
        (F.col("r2_3") / F.lit(2.0)).alias("rank_sum_q3"),
        (F.col("r2_4") / F.lit(2.0)).alias("rank_sum_q4"),
        chi2.alias("chi2_friedman"),
        (chi2 / (F.lit(3.0) * F.col("n"))).alias("kendalls_w"))


# ---------------------------------------------------------------------------
# Anderson-Darling uniformity self-audit of the md5 sampling keys
# ---------------------------------------------------------------------------

_AD_SQL = """
WITH u AS (
  SELECT doc_id,
         (CAST(CAST('0x' || substring(md5('ad:' || CAST(doc_id AS VARCHAR)),
                                      1, 8) AS BIGINT) AS DOUBLE) + 0.5)
           / 4294967296.0 AS u
  FROM documents
),
srt AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY u, doc_id) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM u
),
terms AS (
  SELECT n,
         ROUND((2 * i - 1) * ROUND(ln(u), 9)
               + (2 * (n - i) + 1) * ROUND(ln(1 - u), 9), 6) AS term
  FROM srt
)
SELECT MAX(n) AS n_keys,
       -MAX(n) - CAST(SUM(CAST(term AS DECIMAL(30,6))) AS DOUBLE) / MAX(n)
         AS a2_stat
FROM terms
"""


@query("dq_anderson_darling_uniform", _AD_SQL)
def dq_anderson_darling_uniform(spark, sf_dir):
    """ANDERSON-DARLING uniformity test (Anderson & Darling 1954),
    A^2 = -n - (1/n) sum_i [(2i-1) ln u_(i) + (2(n-i)+1) ln(1-u_(i))],
    applied to the engine's OWN md5-derived sampling keys — the
    self-audit that the deterministic hash-uniform keys every sampler
    in this repo relies on (weighted A-ES sampling, stratified splits,
    reservoir substitutes) are actually uniform on (0,1), with the
    tail-sensitive weighting that catches bucket-edge defects a
    chi-square histogram misses. The order statistic index comes from
    a (u, doc_id)-tiebroken global sort (32-bit md5 prefixes can
    collide, so the tiebreak keeps both engines' row numbers
    identical); each log term is round-9 fenced, the (2i-1) weights
    are exact integers, the per-row combination is round-6 fenced
    (magnitude ~n ln n), and the reduction is an exact decimal sum."""
    d = t(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        ((F.conv(F.substring(
            F.md5(F.concat(F.lit("ad:"), F.col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("double") + 0.5)
         / float(1 << 32)).alias("u"))
    srt = u.select(
        "u", F.row_number().over(W.orderBy("u", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("n"))
    term = F.round(
        (2 * F.col("i") - 1) * F.round(F.log(F.col("u")), 9)
        + (2 * (F.col("n") - F.col("i")) + 1)
        * F.round(F.log(1 - F.col("u")), 9), 6)
    return (srt.select("n", term.alias("term"))
            .agg(F.max("n").alias("n_keys"),
                 (-F.max("n")
                  - F.sum(F.col("term").cast("decimal(30,6)"))
                  .cast("double") / F.max("n")).alias("a2_stat")))


# ---------------------------------------------------------------------------
# Grubbs maximum studentized deviate on daily revenue
# ---------------------------------------------------------------------------

_GRUBBS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS v
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM daily
),
dev AS (
  SELECT d.day, ABS(m.n * d.v - m.s1) AS ndev, m.n, m.s1, m.s2
  FROM daily d CROSS JOIN m
),
top AS (
  SELECT day, ndev, n, s1, s2,
         ROW_NUMBER() OVER (ORDER BY ndev DESC, day) AS rk
  FROM dev
)
SELECT n AS n_days, day AS outlier_day,
       (ndev / CAST(n AS DOUBLE))
         / NULLIF(sqrt((s2 - s1 / CAST(n AS DOUBLE) * s1) / (n - 1)), 0)
         AS g_stat
FROM top WHERE rk = 1
"""


@query("anomaly_grubbs_daily", _GRUBBS_SQL)
def anomaly_grubbs_daily(spark, sf_dir):
    """GRUBBS' test statistic (Grubbs 1950): G = max|x - mean|/s over
    the daily revenue series, plus WHICH day attains it — the
    single-most-suspicious-observation detector run before trusting
    any daily aggregate (compare G to the t-distribution critical
    value; the special function is left to the consumer, as with the
    chi-square entries). The argmax is decided on the EXACT integer
    |n*x - S1| (whole-currency units via integer division of exact
    cents) with a day tiebreak, so both engines pick the identical
    row without any float comparison; G itself is straight-line IEEE
    on exact integer moments. One combinable rollup + one top-1
    TakeOrdered over the tiny day table."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("v")))
    m = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("v").cast("bigint").alias("s1"),
                  F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"))
    dev = (daily.crossJoin(F.broadcast(m))
           .select("day", F.abs(F.col("n") * F.col("v") - F.col("s1"))
                   .alias("ndev"), "n", "s1", "s2"))
    top = dev.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("ndev"), "day")))
    sd = F.sqrt((F.col("s2") - F.col("s1") / F.col("n").cast("double")
                 * F.col("s1")) / (F.col("n") - 1))
    return (top.filter(F.col("rk") == 1)
            .select(F.col("n").alias("n_days"),
                    F.col("day").alias("outlier_day"),
                    ((F.col("ndev") / F.col("n").cast("double"))
                     / F.nullif(sd, F.lit(0.0)))
                    .alias("g_stat")))


# ---------------------------------------------------------------------------
# Cochran's Q over three binary quality gates
# ---------------------------------------------------------------------------

_COCHRAN_SQL = """
WITH gates AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS g1,
         CASE WHEN len(string_split(text, ' ')) >= 60 THEN 1 ELSE 0 END
           AS g2,
         CASE WHEN n_chars >= 5 * len(string_split(text, ' '))
              THEN 1 ELSE 0 END AS g3
  FROM documents
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2,
         CAST(SUM(g3) AS BIGINT) AS c3,
         CAST(SUM(g1 + g2 + g3) AS BIGINT) AS sl,
         CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS sl2
  FROM gates
)
SELECT n_docs, c1 AS g1_pass, c2 AS g2_pass, c3 AS g3_pass,
       CAST(2 AS DOUBLE) * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - sl * sl)
         / NULLIF(3 * sl - sl2, 0) AS q_stat,
       CAST(2 AS BIGINT) AS df
FROM s
"""


@query("eval_cochran_q", _COCHRAN_SQL)
def eval_cochran_q(spark, sf_dir):
    """COCHRAN'S Q (Cochran 1950): the k-treatment generalization of
    McNemar for matched BINARY outcomes — here three quality gates
    (chars >= 300, tokens >= 60, avg token length >= 5) applied to
    the same documents: Q = (k-1)[k sum G_j^2 - (sum G_j)^2] /
    [k sum L_i - sum L_i^2] asks whether the gates reject at
    systematically different rates, the filter-calibration check run
    before combining gates into a composite (quality_composite_gate).
    Every quantity is an exact integer (0/1 indicators, their row
    sums, column sums, and squares), so Q is one exact rational per
    corpus — a single combinable aggregation, one row out."""
    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    gates = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("g1"),
        F.when(ntok >= 60, 1).otherwise(0).alias("g2"),
        F.when(F.col("n_chars") >= 5 * ntok, 1).otherwise(0).alias("g3"))
    li = F.col("g1") + F.col("g2") + F.col("g3")
    s = gates.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("g1").cast("bigint").alias("c1"),
        F.sum("g2").cast("bigint").alias("c2"),
        F.sum("g3").cast("bigint").alias("c3"),
        F.sum(li).cast("bigint").alias("sl"),
        F.sum(li * li).cast("bigint").alias("sl2"))
    ssq = (F.col("c1") * F.col("c1") + F.col("c2") * F.col("c2")
           + F.col("c3") * F.col("c3"))
    return s.select(
        "n_docs", F.col("c1").alias("g1_pass"), F.col("c2").alias("g2_pass"),
        F.col("c3").alias("g3_pass"),
        (2.0 * (3 * ssq - F.col("sl") * F.col("sl"))
         / F.nullif(3 * F.col("sl") - F.col("sl2"), F.lit(0)))
        .alias("q_stat"),
        F.lit(2).cast("bigint").alias("df"))
