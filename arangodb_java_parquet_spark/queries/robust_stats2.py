"""Robust comparison + lexical dispersion wave (r12j).

Yuen's trimmed-mean t-test (the robust two-sample comparison that stays
valid when corpus metrics have the heavy tails they always have — the
test statisticians actually recommend over Student/Welch for real data),
Gries' DP lexical dispersion (is a token's mass spread across sources or
concentrated in one — the signal separating general vocabulary from
source-specific boilerplate, which raw frequency cannot), and Cohen's h
effect size for proportions (the arcsine-stabilized magnitude companion
to every pass-rate comparison).

Determinism: trimming/winsorizing boundaries are exact integer order
statistics, so every Yuen moment is an exact bigint sum; DP terms are
exact-rational doubles round-9-fenced into a decimal sum (parts are a
bounded set); Cohen's h fences the two arcsines at round-9 (libm asin
differs in the last ulp across engines, same rule as ln/cos).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# Yuen's trimmed-mean t-test: en vs rest document length, 20% trim
# ---------------------------------------------------------------------------

_YUEN_SQL = """
WITH g AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         CAST(n_chars AS BIGINT) AS x, doc_id
  FROM documents
),
ranked AS (
  SELECT grp, x,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, doc_id) AS i,
         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM g
),
bounds AS (
  SELECT grp, n, n // 5 AS tg FROM ranked GROUP BY grp, n
),
w AS (
  SELECT r.grp, r.n, b.tg,
         CASE WHEN r.i <= b.tg THEN NULL
              WHEN r.i > r.n - b.tg THEN NULL ELSE r.x END AS xt,
         CASE WHEN r.i <= b.tg THEN lo.x
              WHEN r.i > r.n - b.tg THEN hi.x ELSE r.x END AS xw
  FROM ranked r
  JOIN bounds b ON b.grp = r.grp
  JOIN ranked lo ON lo.grp = r.grp AND lo.i = b.tg + 1
  JOIN ranked hi ON hi.grp = r.grp AND hi.i = r.n - b.tg
),
m AS (
  SELECT grp, MAX(n) AS n, MAX(tg) AS tg,
         CAST(SUM(xt) AS BIGINT) AS st,
         CAST(COUNT(xt) AS BIGINT) AS h,
         CAST(SUM(xw) AS BIGINT) AS sw,
         CAST(SUM(xw * xw) AS BIGINT) AS sww
  FROM w GROUP BY grp
),
p AS (
  SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN h END) AS h1,
         MAX(CASE WHEN grp = 1 THEN st END) AS st1,
         MAX(CASE WHEN grp = 1 THEN sw END) AS sw1,
         MAX(CASE WHEN grp = 1 THEN sww END) AS sww1,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN h END) AS h0,
         MAX(CASE WHEN grp = 0 THEN st END) AS st0,
         MAX(CASE WHEN grp = 0 THEN sw END) AS sw0,
         MAX(CASE WHEN grp = 0 THEN sww END) AS sww0
  FROM m
),
st AS (
  SELECT n1, h1, n0, h0,
         st1 / CAST(h1 AS DOUBLE) AS mt1, st0 / CAST(h0 AS DOUBLE) AS mt0,
         (n1 - 1) * ((sww1 - sw1 / CAST(n1 AS DOUBLE) * sw1) / (n1 - 1))
           / (CAST(h1 AS DOUBLE) * (h1 - 1)) AS d1,
         (n0 - 1) * ((sww0 - sw0 / CAST(n0 AS DOUBLE) * sw0) / (n0 - 1))
           / (CAST(h0 AS DOUBLE) * (h0 - 1)) AS d0
  FROM p
)
SELECT CAST(n1 AS BIGINT) AS n_en, CAST(h1 AS BIGINT) AS h_en,
       CAST(n0 AS BIGINT) AS n_other, CAST(h0 AS BIGINT) AS h_other,
       mt1 - mt0 AS trimmed_mean_diff,
       (mt1 - mt0) / sqrt(d1 + d0) AS t_yuen,
       (d1 + d0) * (d1 + d0)
         / (d1 * d1 / (h1 - 1) + d0 * d0 / (h0 - 1)) AS df_yuen
FROM st
"""


@query("eval_yuen_trimmed_t", _YUEN_SQL)
def eval_yuen_trimmed_t(spark, sf_dir):
    """YUEN'S trimmed-mean t-test (Yuen 1974): compare the 20%-trimmed
    mean document length of English vs the rest, with the winsorized-
    variance standard error and Welch-style df — the robust location
    test that keeps its nominal error rate under the heavy tails and
    outliers every scraped-corpus metric has (where Student's and even
    Welch's t lose power or validity; Wilcox's standard
    recommendation). The trim boundaries are exact integer order
    statistics (g = n div 5 via one per-group rank window + two rank
    self-equijoins on broadcastable 2-row bounds), so trimmed sums and
    winsorized moments are all EXACT bigint sums; the statistic is
    straight-line IEEE on identical operands (the sw^2 term ordered
    sw/n*sw per the Cohen's d recipe)."""
    d = t(spark, sf_dir, "documents")
    g = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.col("n_chars").cast("bigint").alias("x"), "doc_id")
    wg = W.partitionBy("grp")
    ranked = g.select(
        "grp", "x",
        F.row_number().over(wg.orderBy("x", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("n"))
    ranked = ranked.transform(materialize)  # 3 self-join consumers
    bounds = (ranked.groupBy("grp")
              .agg(F.max("n").alias("nn"))
              .select("grp", F.expr("CAST(nn div 5 AS BIGINT)")
                      .alias("tg")))
    lo = (ranked.join(bounds, "grp")
          .filter(F.col("i") == F.col("tg") + 1)
          .select("grp", F.col("x").alias("lo_x")))
    hi = (ranked.join(bounds, "grp")
          .filter(F.col("i") == F.col("n") - F.col("tg"))
          .select("grp", F.col("x").alias("hi_x")))
    w = (ranked.join(F.broadcast(bounds), "grp")
         .join(F.broadcast(lo), "grp").join(F.broadcast(hi), "grp")
         .select(
             "grp", "n", "tg",
             F.when((F.col("i") <= F.col("tg"))
                    | (F.col("i") > F.col("n") - F.col("tg")), None)
             .otherwise(F.col("x")).alias("xt"),
             F.when(F.col("i") <= F.col("tg"), F.col("lo_x"))
             .when(F.col("i") > F.col("n") - F.col("tg"), F.col("hi_x"))
             .otherwise(F.col("x")).alias("xw")))
    m = w.groupBy("grp").agg(
        F.max("n").alias("n"), F.max("tg").alias("tg"),
        F.sum("xt").cast("bigint").alias("st"),
        F.count("xt").cast("bigint").alias("h"),
        F.sum("xw").cast("bigint").alias("sw"),
        F.sum(F.col("xw") * F.col("xw")).cast("bigint").alias("sww"))
    p = m.agg(*[
        F.max(F.when(F.col("grp") == gv, F.col(c))).alias(f"{c}{gv}")
        for gv in (1, 0) for c in ("n", "h", "st", "sw", "sww")])
    mt1 = F.col("st1") / F.col("h1").cast("double")
    mt0 = F.col("st0") / F.col("h0").cast("double")

    def dd(n, sw, sww, h):
        swv = ((F.col(sww) - F.col(sw) / F.col(n).cast("double")
                * F.col(sw)) / (F.col(n) - 1))
        return ((F.col(n) - 1) * swv
                / (F.col(h).cast("double") * (F.col(h) - 1)))

    d1 = dd("n1", "sw1", "sww1", "h1")
    d0 = dd("n0", "sw0", "sww0", "h0")
    st = p.select("n1", "h1", "n0", "h0", mt1.alias("mt1"),
                  mt0.alias("mt0"), d1.alias("d1"), d0.alias("d0"))
    tstat = (F.col("mt1") - F.col("mt0")) / F.sqrt(F.col("d1")
                                                   + F.col("d0"))
    dfy = ((F.col("d1") + F.col("d0")) * (F.col("d1") + F.col("d0"))
           / (F.col("d1") * F.col("d1") / (F.col("h1") - 1)
              + F.col("d0") * F.col("d0") / (F.col("h0") - 1)))
    return st.select(
        F.col("n1").cast("bigint").alias("n_en"),
        F.col("h1").cast("bigint").alias("h_en"),
        F.col("n0").cast("bigint").alias("n_other"),
        F.col("h0").cast("bigint").alias("h_other"),
        (F.col("mt1") - F.col("mt0")).alias("trimmed_mean_diff"),
        tstat.alias("t_yuen"), dfy.alias("df_yuen"))


# ---------------------------------------------------------------------------
# Gries' DP lexical dispersion across sources
# ---------------------------------------------------------------------------

_DP_TOPK = 30

_DP_SQL = f"""
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
parts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY source
),
tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS tt FROM parts),
tp AS (
  SELECT tok, source, CAST(COUNT(*) AS BIGINT) AS v
  FROM toks GROUP BY tok, source
),
tf AS (SELECT tok, CAST(SUM(v) AS BIGINT) AS f FROM tp GROUP BY tok),
terms AS (
  SELECT tp.tok, tf.f,
         ROUND(ABS(tp.v / CAST(tf.f AS DOUBLE)
                   - p.sz / CAST(tot.tt AS DOUBLE))
               - p.sz / CAST(tot.tt AS DOUBLE), 9) AS term
  FROM tp
  JOIN tf ON tf.tok = tp.tok
  JOIN parts p ON p.source = tp.source
  CROSS JOIN tot
),
dp AS (
  SELECT tok, MAX(f) AS f,
         (CAST(SUM(CAST(term AS DECIMAL(30,9))) AS DOUBLE) + 1) / 2 AS dp
  FROM terms GROUP BY tok
),
ranked AS (
  SELECT tok, f, dp,
         ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rk
  FROM dp
)
SELECT tok, CAST(f AS BIGINT) AS freq, dp
FROM ranked WHERE rk <= {_DP_TOPK}
"""


@query("token_dispersion_dp", _DP_SQL)
def token_dispersion_dp(spark, sf_dir):
    """GRIES' DP lexical dispersion (Gries 2008): for each of the top
    {_DP_TOPK} tokens, DP = 0.5 * sum over corpus parts (sources) of
    |observed share - expected share| — 0 means the token spreads
    across sources exactly like the token mass does (general
    vocabulary), 1 means it lives in one source (boilerplate /
    source-specific jargon). Frequency alone cannot make this
    distinction, and it is THE signal for vocabulary-pruning and
    source-weighting decisions. Absent (token, part) cells are folded
    in algebraically (sum over absent parts of s_i = 1 - sum over
    present, so DP = (sum_present(|v/f - s| - s) + 1)/2) — no dense
    outer join ever materializes. All shares are exact-rational
    doubles; the bounded per-token part sum is round-9 fenced into an
    exact decimal."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("source",
                    F.explode(F.split(F.col("text"), " ")).alias("tok"))
    parts = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"))
    tot = parts.agg(F.sum("sz").cast("bigint").alias("tt"))
    tp = toks.groupBy("tok", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v"))
    tf = tp.groupBy("tok").agg(F.sum("v").cast("bigint").alias("f"))
    s_i = F.col("sz") / F.col("tt").cast("double")
    term = F.round(
        F.abs(F.col("v") / F.col("f").cast("double") - s_i) - s_i, 9)
    terms = (tp.join(tf, "tok").join(F.broadcast(parts), "source")
             .crossJoin(F.broadcast(tot))
             .select("tok", "f", term.alias("term")))
    dp = (terms.groupBy("tok")
          .agg(F.max("f").alias("f"),
               ((F.sum(F.col("term").cast("decimal(30,9)"))
                 .cast("double") + 1) / 2).alias("dp")))
    ranked = dp.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("f"), "tok")))
    return (ranked.filter(F.col("rk") <= _DP_TOPK)
            .select("tok", F.col("f").cast("bigint").alias("freq"), "dp"))


# ---------------------------------------------------------------------------
# Cohen's h for proportions: gate pass-rate effect size, en vs rest
# ---------------------------------------------------------------------------

_COHENS_H_SQL = """
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
       k1 / CAST(n1 AS DOUBLE) AS p_en,
       k0 / CAST(n0 AS DOUBLE) AS p_other,
       2 * ROUND(asin(sqrt(k1 / CAST(n1 AS DOUBLE))), 9)
         - 2 * ROUND(asin(sqrt(k0 / CAST(n0 AS DOUBLE))), 9) AS cohens_h
FROM p
"""


@query("eval_cohens_h", _COHENS_H_SQL)
def eval_cohens_h(spark, sf_dir):
    """COHEN'S h (Cohen 1988): the effect size for a difference of
    PROPORTIONS, h = 2 asin sqrt(p1) - 2 asin sqrt(p2), here the
    length-gate pass rate for English vs the rest — the variance-
    stabilized magnitude that makes pass-rate gaps comparable across
    gates regardless of baseline rate (a 5-point gap at p=0.5 and at
    p=0.95 are very different effects; raw differences hide that).
    Completes the effect-size family beside Cohen's d (means) and the
    kappa agreement entries. Counts are exact integers; the two
    arcsines are round-9 fenced (libm asin differs in the last ulp
    across engines, the ln/cos rule); h is exact arithmetic on the
    fenced values. One combinable aggregation."""
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
    phi1 = F.round(F.asin(F.sqrt(F.col("k1")
                                 / F.col("n1").cast("double"))), 9)
    phi0 = F.round(F.asin(F.sqrt(F.col("k0")
                                 / F.col("n0").cast("double"))), 9)
    return p.select(
        F.col("n1").cast("bigint").alias("n_en"),
        F.col("n0").cast("bigint").alias("n_other"),
        (F.col("k1") / F.col("n1").cast("double")).alias("p_en"),
        (F.col("k0") / F.col("n0").cast("double")).alias("p_other"),
        (2 * phi1 - 2 * phi0).alias("cohens_h"))


# ---------------------------------------------------------------------------
# two-sample Cramér-von Mises drift test: en vs rest document length
# ---------------------------------------------------------------------------

_CVM_SQL = """
WITH g AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
),
pooled AS (
  SELECT grp, x,
         RANK() OVER (ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS midrank,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, doc_id) AS i
  FROM g
),
s AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(2 * (midrank - i) AS BIGINT)
                  * CAST(2 * (midrank - i) AS BIGINT)) AS BIGINT) AS d4
  FROM pooled GROUP BY grp
),
p AS (
  SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN d4 END) AS d41,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN d4 END) AS d40
  FROM p0
)
SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n0 AS BIGINT) AS n_other,
       (n1 * CAST(d41 AS DOUBLE) + n0 * CAST(d40 AS DOUBLE))
         / CAST(4 AS DOUBLE) AS u_stat,
       (n1 * CAST(d41 AS DOUBLE) + n0 * CAST(d40 AS DOUBLE))
         / CAST(4 AS DOUBLE)
         / (CAST(n1 AS DOUBLE) * n0 * (n1 + n0))
         - (4 * n1 * n0 - 1) / (CAST(6 AS DOUBLE) * (n1 + n0)) AS t_cvm
FROM p
""".replace("FROM p0", "FROM s")


@query("drift_cramer_von_mises", _CVM_SQL)
def drift_cramer_von_mises(spark, sf_dir):
    """Two-sample CRAMER-VON MISES test (Anderson 1962): T =
    U/(n m N) - (4nm-1)/(6N) with U = n sum(r_i - i)^2 +
    m sum(s_j - j)^2 over pooled midranks vs within-sample positions —
    the INTEGRATED distribution-distance drift test that weights the
    whole CDF (where KS sees only the single largest gap; a
    distribution that drifts a little everywhere fires CvM first).
    Completes the drift family beside KS, PSI, Wasserstein and the QQ
    table. Midranks are exact halves, so 2(r-i) is an exact integer
    and U is a pure bigint sum — the entire statistic is one exact
    rational, no fences anywhere. One pooled rank + one per-group
    rank window + a combinable rollup."""
    d = t(spark, sf_dir, "documents")
    g = d.select("doc_id",
                 F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
                 F.col("n_chars").cast("bigint").alias("x"))
    midrank = (F.rank().over(W.orderBy("x"))
               + (F.count(F.lit(1)).over(W.partitionBy("x")) - 1) / 2.0)
    pooled = g.select(
        "grp", "x", midrank.alias("midrank"),
        F.row_number().over(W.partitionBy("grp").orderBy("x", "doc_id"))
        .alias("i"))
    d2 = (2 * (F.col("midrank") - F.col("i"))).cast("bigint")
    s = pooled.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d2 * d2).cast("bigint").alias("d4"))
    p = s.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("d4"))).alias("d41"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("d4"))).alias("d40"))
    # d4 grows ~n*(2m)^2, so n*d4 would overflow BIGINT ~10x past sf1
    # (DuckDB raises, non-ANSI Spark silently wraps): multiply in DOUBLE
    # on both engines — the operands are exact integers individually well
    # under 2^53 through sf1 and IEEE multiply/add are deterministic.
    u = ((F.col("n1") * F.col("d41").cast("double")
          + F.col("n0") * F.col("d40").cast("double"))
         / F.lit(4.0))
    n1, n0 = F.col("n1"), F.col("n0")
    tstat = (u / (n1.cast("double") * n0 * (n1 + n0))
             - (4 * n1 * n0 - 1) / (F.lit(6.0) * (n1 + n0)))
    return p.select(
        n1.cast("bigint").alias("n_en"),
        n0.cast("bigint").alias("n_other"),
        u.alias("u_stat"), tstat.alias("t_cvm"))
