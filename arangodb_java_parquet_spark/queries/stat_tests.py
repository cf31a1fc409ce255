"""Classic inferential statistics over corpus quality signals (round 12).

The reference engine (ParquetArangoLoader.java:139-157) moves rows; a
curation pipeline at 100 TB also has to DECIDE on them — is the length
distribution the same across languages, did a filter change the corpus, is
a metric normally distributed enough for a z-test. This module adds the
four standard decision tests that were still missing from the evaluation
family: Kruskal-Wallis (k-group rank ANOVA), Brown-Forsythe (robust
variance homogeneity), Welch's t (unequal-variance two-sample), and
Jarque-Bera (moment-based normality).

Determinism design (CLAUDE.md rules, nothing novel):
  * every aggregate is an EXACT integer (BIGINT) sum — midranks are
    multiples of 0.5 so 2*rank is integer; |x - median| is a multiple of
    0.5 so 2z and 4z^2 are integers; token/char counts are integers;
  * scale-invariant statistics (F, skewness, kurtosis) are computed from
    operands pre-scaled by EXACT binary factors (/1024, /16384, /256 —
    never /1000) so squared terms stay under the round-9 magnitude
    ceiling;
  * the only cross-group float reductions are k~5-term decimal sums of
    round-9-fenced terms; everything else is straight-line IEEE arithmetic
    on bit-identical inputs.

At 100 TB: the rank test is the only one needing a global sort (corpus-wide
ranking); Spark executes it as a range-partitioned sort, and the moment
tests are single combinable aggregations (map-side partials, one row out).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# Kruskal-Wallis H: document length by language (rank-based one-way ANOVA)
# ---------------------------------------------------------------------------

# Ranks are scaled by an exact power of two before squaring so the per-group
# term R_j^2/n_j stays well under the round-9 magnitude ceiling (~1e7)
# through sf1 (N=50k -> R_j <= 1.25e9 -> scaled 7.6e4 -> term <= 5.8e5).
_KW_SCALE = 16384  # 2^14

_KW_SQL = f"""
WITH base AS (
  SELECT lang, n_chars AS x FROM documents
),
ranked AS (
  SELECT lang, x,
         RANK() OVER (ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS midrank
  FROM base
),
grp AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(CAST(2 * midrank AS BIGINT)) AS BIGINT) AS r2_j
  FROM ranked GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(
             (r2_j / 2.0 / {_KW_SCALE}) * (r2_j / 2.0 / {_KW_SCALE}) / n_j,
             9) AS DECIMAL(30,9))) AS DOUBLE) AS s_scaled
  FROM grp
),
ties AS (
  SELECT CAST(SUM(tt * tt * tt - tt) AS BIGINT) AS ts
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM base GROUP BY x)
)
SELECT n AS n_obs, k AS k_groups,
       12.0 * {_KW_SCALE * _KW_SCALE} * s_scaled
         / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1) AS h_stat,
       (12.0 * {_KW_SCALE * _KW_SCALE} * s_scaled
         / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
         / NULLIF(1.0 - ts / (CAST(n AS DOUBLE) * n * n - n), 0)
         AS h_adj
FROM tot CROSS JOIN ties
"""


@query("eval_kruskal_wallis", _KW_SQL)
def eval_kruskal_wallis(spark, sf_dir):
    """KRUSKAL-WALLIS H (Kruskal & Wallis 1952): the k-group rank ANOVA
    on document length across languages — the nonparametric "are these
    strata drawn from the same length distribution" gate a mixture
    designer runs before pooling sources (no normality assumption, so
    it is the right test for the heavy-tailed length distributions real
    corpora have). Midranks (tie-averaged) are exact multiples of 0.5,
    so per-group rank sums are EXACT bigint sums of 2*midrank; the only
    float reduction is the k-term decimal sum of round-9-fenced scaled
    terms (R_j/2^14)^2/n_j. Tie correction 1 - sum(t^3-t)/(N^3-N) is
    pure integer arithmetic. One global rank (range-partitioned sort at
    scale) + two combinable aggregations."""
    base = t(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").alias("x"))
    midrank = (F.rank().over(Window.orderBy("x"))
               + (F.count(F.lit(1)).over(Window.partitionBy("x")) - 1) / 2.0)
    ranked = base.select("lang", "x", midrank.alias("midrank"))
    grp = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum((2 * F.col("midrank")).cast("bigint"))
        .cast("bigint").alias("r2_j"))
    scaled = (F.col("r2_j") / 2.0 / _KW_SCALE)
    tot = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.round(scaled * scaled / F.col("n_j"), 9)
              .cast("decimal(30,9)")).cast("double").alias("s_scaled"))
    ties = (base.groupBy("x")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
            .agg(F.sum(F.col("tt") * F.col("tt") * F.col("tt")
                       - F.col("tt")).cast("bigint").alias("ts")))
    h = (12.0 * _KW_SCALE * _KW_SCALE * F.col("s_scaled")
         / (F.col("n").cast("double") * (F.col("n") + 1))
         - 3.0 * (F.col("n") + 1))
    tcorr = (1.0 - F.col("ts") / (F.col("n").cast("double")
                                  * F.col("n") * F.col("n") - F.col("n")))
    return (tot.crossJoin(F.broadcast(ties))
            .select(F.col("n").alias("n_obs"),
                    F.col("k").alias("k_groups"),
                    h.alias("h_stat"),
                    (h / F.nullif(tcorr, F.lit(0.0))).alias("h_adj")))


# ---------------------------------------------------------------------------
# Brown-Forsythe: homogeneity of length variance across languages
# ---------------------------------------------------------------------------

# |x - group median| is a multiple of 0.5 (integer x, exact .5-interpolated
# median), so 2z and 4z^2 are exact integers; the F numerator/denominator
# use terms pre-scaled by 1/1024 (exact binary) to stay round-9 safe.
_BF_SCALE = 1024  # 2^10

_BF_SQL = f"""
WITH base AS (
  SELECT lang, n_chars AS x FROM documents
),
med AS (
  SELECT lang, quantile_cont(x, 0.5) AS med FROM base GROUP BY lang
),
z AS (
  SELECT b.lang, ABS(b.x - m.med) AS z
  FROM base b JOIN med m ON b.lang = m.lang
),
grp AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(CAST(2 * z AS BIGINT)) AS BIGINT) AS z2_j,
         CAST(SUM(CAST(4 * z * z AS BIGINT)) AS BIGINT) AS zz4_j
  FROM z GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(z2_j) AS BIGINT) AS g2,
         CAST(SUM(zz4_j) AS BIGINT) AS s2_4,
         CAST(SUM(CAST(ROUND(
             (z2_j / 2.0 / {_BF_SCALE}) * (z2_j / 2.0 / {_BF_SCALE}) / n_j,
             9) AS DECIMAL(30,9))) AS DOUBLE) AS sb_scaled
  FROM grp
)
SELECT n AS n_obs, k AS k_groups,
       ((sb_scaled - (g2 / 2.0 / {_BF_SCALE}) * (g2 / 2.0 / {_BF_SCALE}) / n)
          / (k - 1))
       / NULLIF((s2_4 / 4.0 / {_BF_SCALE * _BF_SCALE} - sb_scaled)
          / (n - k), 0) AS f_stat
FROM tot
"""


@query("eval_brown_forsythe", _BF_SQL)
def eval_brown_forsythe(spark, sf_dir):
    """BROWN-FORSYTHE test (Brown & Forsythe 1974): Levene's variance-
    homogeneity test with the MEDIAN center — "do these language strata
    have the same length SPREAD", the robust pre-check before any
    pooled-variance comparison (the median center keeps it valid for
    skewed corpus lengths where classic Levene over-rejects). The
    group median of integers is an exact multiple of 0.5 under the
    (n-1)p linear interpolation both engines use, so z = |x - med| has
    exact integer 2z / 4z^2 — every moment is an exact bigint sum. The
    one-way ANOVA F over z uses 1/1024-scaled (exact binary) terms so
    squared group sums stay under the round-9 ceiling; the k-term
    between-group reduction is a fenced decimal sum. Two combinable
    aggregations + one broadcastable k-row median join."""
    base = t(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").alias("x"))
    med = base.groupBy("lang").agg(F.expr("percentile(x, 0.5)").alias("med"))
    z = (base.join(F.broadcast(med), "lang")
         .select("lang", F.abs(F.col("x") - F.col("med")).alias("z")))
    grp = z.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum((2 * F.col("z")).cast("bigint")).cast("bigint").alias("z2_j"),
        F.sum((4 * F.col("z") * F.col("z")).cast("bigint"))
        .cast("bigint").alias("zz4_j"))
    sc = (F.col("z2_j") / 2.0 / _BF_SCALE)
    tot = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("z2_j").cast("bigint").alias("g2"),
        F.sum("zz4_j").cast("bigint").alias("s2_4"),
        F.sum(F.round(sc * sc / F.col("n_j"), 9).cast("decimal(30,9)"))
        .cast("double").alias("sb_scaled"))
    gsc = (F.col("g2") / 2.0 / _BF_SCALE)
    ssb = F.col("sb_scaled") - gsc * gsc / F.col("n")
    ssw = (F.col("s2_4") / 4.0 / (_BF_SCALE * _BF_SCALE)
           - F.col("sb_scaled"))
    return tot.select(
        F.col("n").alias("n_obs"), F.col("k").alias("k_groups"),
        ((ssb / (F.col("k") - 1))
         / F.nullif(ssw / (F.col("n") - F.col("k")), F.lit(0.0)))
        .alias("f_stat"))


# ---------------------------------------------------------------------------
# Welch's t: token-count difference, English vs rest (unequal variances)
# ---------------------------------------------------------------------------

_WELCH_SQL = """
WITH g AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM g GROUP BY grp
),
w AS (
  SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN s1 END) AS s1_1,
         MAX(CASE WHEN grp = 1 THEN s2 END) AS s2_1,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN s1 END) AS s1_0,
         MAX(CASE WHEN grp = 0 THEN s2 END) AS s2_0
  FROM m
),
st AS (
  SELECT n1, n0,
         s1_1 / CAST(n1 AS DOUBLE) AS m1,
         s1_0 / CAST(n0 AS DOUBLE) AS m0,
         (s2_1 - s1_1 / CAST(n1 AS DOUBLE) * s1_1) / (n1 - 1) / n1 AS se1,
         (s2_0 - s1_0 / CAST(n0 AS DOUBLE) * s1_0) / (n0 - 1) / n0 AS se0
  FROM w
)
SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n0 AS BIGINT) AS n_other,
       m1 - m0 AS mean_diff,
       (m1 - m0) / sqrt(se1 + se0) AS t_stat,
       (se1 + se0) * (se1 + se0)
         / (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1)) AS df_welch
FROM st
"""


@query("eval_welch_ttest", _WELCH_SQL)
def eval_welch_ttest(spark, sf_dir):
    """WELCH'S t-test (Welch 1947): the unequal-variance two-sample
    mean comparison — token count per document, English vs everything
    else — with the Welch-Satterthwaite effective degrees of freedom.
    This is the default two-group test (Student's t's equal-variance
    assumption rarely holds across corpus strata; Welch costs nothing
    and is valid either way). Token counts are integers so both group
    moment pairs are EXACT bigint sums in one combinable aggregation;
    t and df are straight-line IEEE expressions on identical operands
    (the s1^2 term ordered s1/n*s1 to stay in range, same recipe as
    the Cohen's d entry this complements — evaluation2.py:932)."""
    d = t(spark, sf_dir, "documents")
    g = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("grp"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("x"))
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"))
    w = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s1"))).alias("s1_1"),
        F.max(F.when(F.col("grp") == 1, F.col("s2"))).alias("s2_1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("s1"))).alias("s1_0"),
        F.max(F.when(F.col("grp") == 0, F.col("s2"))).alias("s2_0"))
    m1 = F.col("s1_1") / F.col("n1").cast("double")
    m0 = F.col("s1_0") / F.col("n0").cast("double")
    se1 = ((F.col("s2_1") - F.col("s1_1") / F.col("n1").cast("double")
            * F.col("s1_1")) / (F.col("n1") - 1) / F.col("n1"))
    se0 = ((F.col("s2_0") - F.col("s1_0") / F.col("n0").cast("double")
            * F.col("s1_0")) / (F.col("n0") - 1) / F.col("n0"))
    st = w.select("n1", "n0", m1.alias("m1"), m0.alias("m0"),
                  se1.alias("se1"), se0.alias("se0"))
    se = F.col("se1") + F.col("se0")
    return st.select(
        F.col("n1").cast("bigint").alias("n_en"),
        F.col("n0").cast("bigint").alias("n_other"),
        (F.col("m1") - F.col("m0")).alias("mean_diff"),
        ((F.col("m1") - F.col("m0")) / F.sqrt(se)).alias("t_stat"),
        (se * se / (F.col("se1") * F.col("se1") / (F.col("n1") - 1)
                    + F.col("se0") * F.col("se0") / (F.col("n0") - 1)))
        .alias("df_welch"))


# ---------------------------------------------------------------------------
# Jarque-Bera normality: is the document-length distribution Gaussian?
# ---------------------------------------------------------------------------

_JB_SQL = """
WITH raw AS (
  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS ctr
  FROM raw
),
p AS (
  SELECT c.n, c.s1, c.ctr,
         CAST(SUM((x - ctr) * (x - ctr)) AS BIGINT) AS p2,
         CAST(SUM((x - ctr) * (x - ctr) * (x - ctr)) AS BIGINT) AS p3,
         CAST(SUM((x - ctr) * (x - ctr) * (x - ctr) * (x - ctr)) AS BIGINT)
           AS p4
  FROM raw CROSS JOIN c
  GROUP BY c.n, c.s1, c.ctr
),
mom AS (
  SELECT n,
         s1 / CAST(n AS DOUBLE) - ctr AS d,
         p2 / CAST(n AS DOUBLE) AS r2,
         p3 / CAST(n AS DOUBLE) AS r3,
         p4 / CAST(n AS DOUBLE) AS r4
  FROM p
),
cm AS (
  SELECT n,
         r2 - d * d AS m2,
         r3 - 3 * d * r2 + 2 * d * d * d AS m3,
         r4 - 4 * d * r3 + 6 * d * d * r2 - 3 * d * d * d * d AS m4
  FROM mom
)
SELECT CAST(n AS BIGINT) AS n_obs,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) AS kurtosis,
       (n / 6.0) * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4.0)
         AS jb_stat
FROM cm
"""


@query("eval_jarque_bera", _JB_SQL)
def eval_jarque_bera(spark, sf_dir):
    """JARQUE-BERA normality test (Jarque & Bera 1980): JB =
    n/6*(S^2 + (K-3)^2/4) from the skewness and excess kurtosis of the
    document-length distribution — the cheap moment-based "can I use
    z-/t-machinery on this metric at all" gate (lengths are notoriously
    right-skewed; this quantifies it). Determinism: power sums are
    taken around the INTEGER center c = s1 div n, so S2/S3/S4 are EXACT
    bigint sums (|x-c| <= ~550 keeps S4 under 2^53 through sf1 x10);
    the exact moments are then shifted to mean-centered moments with
    the binomial identity using d = mean - c in [0,1) — straight-line
    IEEE on identical operands, no per-row rounding, no cancellation
    blowup (d < 1). Two combinable scans, one row out."""
    raw = t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"))
    c = raw.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("s1"),
                F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("ctr"))
    dx = F.col("x") - F.col("ctr")
    p = (raw.crossJoin(F.broadcast(c))
         .groupBy("n", "s1", "ctr")
         .agg(F.sum(dx * dx).cast("bigint").alias("p2"),
              F.sum(dx * dx * dx).cast("bigint").alias("p3"),
              F.sum(dx * dx * dx * dx).cast("bigint").alias("p4")))
    mom = p.select(
        "n",
        (F.col("s1") / F.col("n").cast("double") - F.col("ctr")).alias("d"),
        (F.col("p2") / F.col("n").cast("double")).alias("r2"),
        (F.col("p3") / F.col("n").cast("double")).alias("r3"),
        (F.col("p4") / F.col("n").cast("double")).alias("r4"))
    d_, r2, r3, r4 = F.col("d"), F.col("r2"), F.col("r3"), F.col("r4")
    cm = mom.select(
        "n",
        (r2 - d_ * d_).alias("m2"),
        (r3 - 3 * d_ * r2 + 2 * d_ * d_ * d_).alias("m3"),
        (r4 - 4 * d_ * r3 + 6 * d_ * d_ * r2
         - 3 * d_ * d_ * d_ * d_).alias("m4"))
    skew = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    kurt = F.col("m4") / (F.col("m2") * F.col("m2"))
    return cm.select(
        F.col("n").cast("bigint").alias("n_obs"),
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
        ((F.col("n") / 6.0) * (skew * skew
                               + (kurt - 3) * (kurt - 3) / 4.0))
        .alias("jb_stat"))
