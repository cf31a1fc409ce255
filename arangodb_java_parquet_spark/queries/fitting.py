"""Round-14 model-fitting wave: isotonic calibration (PAVA via the
exact minimax identity), a portable count-min sketch, Huber IRLS robust
regression, and a Yule-Walker AR(2) fit — classic fitting/sketching
families the registry lacked (Theil-Sen, OLS diagnostics, GK quantiles,
AMS/HLL sketches already exist).

Determinism: every statistic is either exact integer arithmetic
(count-min), a single-shape IEEE expression over exact integer moments
(Yule-Walker), a min/max lattice over exact-ratio doubles (isotonic:
the minimax identity iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) needs
NO floating accumulation at all — every cell is one integer-ratio
division), or round-9-fenced decimal sums (Huber IRLS weights)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

_ISO_BINS = 100

_ISO_SQL = f"""
WITH r AS (
  SELECT o_totalprice AS score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
  FROM orders
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
b AS MATERIALIZED (
  -- integer-div binning from the total-ordered rank (never ntile:
  -- this is engine-definition-free)
  SELECT ((rk - 1) * {_ISO_BINS}) // nn.n AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM r, nn GROUP BY 1
),
c AS MATERIALIZED (
  SELECT bin, cnt, pos,
         CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cn,
         CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
  FROM b
),
c2 AS MATERIALIZED (
  SELECT bin, cnt, pos, cn, cp,
         COALESCE(LAG(cn) OVER (ORDER BY bin), 0) AS pcn,
         COALESCE(LAG(cp) OVER (ORDER BY bin), 0) AS pcp
  FROM c
),
pairs AS MATERIALIZED (
  SELECT j.bin AS j, k.bin AS k,
         (k.cp - j.pcp) / CAST(k.cn - j.pcn AS DOUBLE) AS a
  FROM c2 j JOIN c2 k ON k.bin >= j.bin
),
g AS MATERIALIZED (
  SELECT j, k AS i,
         MIN(a) OVER (PARTITION BY j ORDER BY k DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS g
  FROM pairs
),
iso AS (SELECT i AS bin, MAX(g) AS iso_rate FROM g GROUP BY i)
SELECT b.bin AS bin, b.cnt AS n, b.pos AS n_pos,
       b.pos / CAST(b.cnt AS DOUBLE) AS rate,
       iso.iso_rate
FROM b JOIN iso ON iso.bin = b.bin
"""


@query("eval_isotonic_calibration", _ISO_SQL)
def eval_isotonic_calibration(spark, sf_dir):
    """ISOTONIC CALIBRATION (PAVA) of the order-status rate against the
    totalprice score, over 100 integer-div rank bins — the standard
    monotone probability-calibration map (Zadrozny & Elkan 2002). PAVA
    is classically a sequential pooling loop; the exact relational
    spelling is the MINIMAX IDENTITY iso(i) = max_{j<=i} min_{k>=i}
    mean(y[j..k]) (Barlow et al. 1972), which over B bins is one B x B
    pair table of exact integer-ratio means, one reverse running MIN
    per j, and one MAX per i — no iteration, no floating accumulation.
    Scale: the corpus pass is the rank + bin rollup; everything after
    is bins^2 = 10^4 rows regardless of corpus size."""
    o = t(spark, sf_dir, "orders")
    r = o.select(
        F.col("o_totalprice").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.row_number().over(W.orderBy("o_totalprice", "o_orderkey"))
        .alias("rk"))
    nn = r.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    b = materialize(
        r.crossJoin(F.broadcast(nn))
        .groupBy(F.expr(f"(rk - 1) * {_ISO_BINS} div n").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"),
             F.sum("y").cast("bigint").alias("pos")))
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = b.select("bin", "cnt", "pos",
                 F.sum("cnt").over(wcum).cast("bigint").alias("cn"),
                 F.sum("pos").over(wcum).cast("bigint").alias("cp"))
    c2 = materialize(c.select(
        "bin", "cnt", "pos", "cn", "cp",
        F.coalesce(F.lag("cn").over(W.orderBy("bin")), F.lit(0))
        .alias("pcn"),
        F.coalesce(F.lag("cp").over(W.orderBy("bin")), F.lit(0))
        .alias("pcp")))
    jj = c2.select(F.col("bin").alias("j"), F.col("pcn").alias("jpcn"),
                   F.col("pcp").alias("jpcp"))
    kk = c2.select(F.col("bin").alias("k"), F.col("cn").alias("kcn"),
                   F.col("cp").alias("kcp"))
    pairs = (jj.join(F.broadcast(kk), F.col("k") >= F.col("j"))
             .select("j", "k",
                     ((F.col("kcp") - F.col("jpcp"))
                      / (F.col("kcn") - F.col("jpcn")).cast("double"))
                     .alias("a")))
    wrev = (W.partitionBy("j").orderBy(F.desc("k"))
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    g = pairs.select("j", F.col("k").alias("i"),
                     F.min("a").over(wrev).alias("g"))
    iso = g.groupBy(F.col("i").alias("bin")).agg(
        F.max("g").alias("iso_rate"))
    return (b.join(iso, "bin")
            .select("bin", F.col("cnt").alias("n"),
                    F.col("pos").alias("n_pos"),
                    (F.col("pos") / F.col("cnt").cast("double"))
                    .alias("rate"),
                    "iso_rate"))


# ---------------------------------------------------------------------------
# Portable count-min sketch (Cormode & Muthukrishnan 2005): d=4 md5-keyed
# rows x w=64 counters, exact integer arithmetic end-to-end.
# ---------------------------------------------------------------------------

_CM_D = 4
_CM_W = 64


def _cm_sql() -> str:
    return f"""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
),
cnt AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
cells AS MATERIALIZED (
  -- one keyed md5 per (token, row): column = first 8 hex digits mod w
  SELECT r.r,
         CAST('0x' || substring(md5(cnt.tok || ':' || r.r), 1, 8)
              AS BIGINT) % {_CM_W} AS col,
         CAST(SUM(cnt.c) AS BIGINT) AS v
  FROM cnt, (SELECT UNNEST(range(0, {_CM_D})) AS r) r
  GROUP BY 1, 2
),
topt AS MATERIALIZED (
  SELECT tok, c FROM (
    SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rn
    FROM cnt) WHERE rn <= 10
),
est AS (
  SELECT t.tok, t.c AS true_count,
         CAST(MIN(ce.v) AS BIGINT) AS cm_estimate
  FROM topt t, (SELECT UNNEST(range(0, {_CM_D})) AS r) r
  JOIN cells ce
    ON ce.r = r.r
   AND ce.col = CAST('0x' || substring(md5(t.tok || ':' || r.r), 1, 8)
                     AS BIGINT) % {_CM_W}
  GROUP BY t.tok, t.c
)
SELECT tok, true_count, cm_estimate,
       CAST(cm_estimate - true_count AS BIGINT) AS overcount
FROM est
"""


@query("agg_count_min_sketch", _cm_sql())
def agg_count_min_sketch(spark, sf_dir):
    """COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005), the streaming
    heavy-hitter counter beside the AMS F2 and portable-HLL sketches:
    d=4 hash rows x w=64 counters, hashes from keyed md5 (the portable
    hashing rule), point query = MIN over the d cells. Reports the top
    10 true-count tokens with their CM estimate and the (always >= 0)
    overcount — exact integers end-to-end, so the oracle checks the
    sketch MATH, not a float tolerance. Build = one token rollup + one
    d x w cell aggregation (map-side combinable, mergeable across
    partitions/streams by cell-wise addition at any scale)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    cnt = materialize(
        toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint")
                                .alias("c")))
    rows_ = spark.range(0, _CM_D).select(F.col("id").alias("r"))

    def col_of(tok_col, r_col):
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat(tok_col, F.lit(":"), r_col.cast("string"))),
                1, 8), 16, 10).cast("long"), _CM_W)

    cells = (cnt.crossJoin(F.broadcast(rows_))
             .groupBy("r", col_of(F.col("tok"), F.col("r")).alias("col"))
             .agg(F.sum("c").cast("bigint").alias("v"))
             .transform(materialize))
    topt = (cnt.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("c"), F.asc("tok"))))
        .filter(F.col("rn") <= 10).drop("rn"))
    probe = (topt.crossJoin(F.broadcast(rows_))
             .select("tok", "c", "r",
                     col_of(F.col("tok"), F.col("r")).alias("col")))
    est = (probe.join(cells, ["r", "col"])
           .groupBy("tok", "c")
           .agg(F.min("v").cast("bigint").alias("cm_estimate")))
    return est.select(
        "tok", F.col("c").alias("true_count"), "cm_estimate",
        (F.col("cm_estimate") - F.col("c")).cast("bigint")
        .alias("overcount"))


# ---------------------------------------------------------------------------
# Huber IRLS robust line fit on the daily order-count series.
# ---------------------------------------------------------------------------

_HUBER_ROUNDS = 2
# k = 1.345 * 1.4826 * MAD, assembled from exact integer factors
# (19940970 / 1e7) so no decimal-literal arithmetic poisons the chain.
_HUBER_NUM = 1345 * 14826  # = 19940970


def _huber_sql() -> str:
    from arangodb_java_parquet_spark.queries.changepoint import _DAILY_SQL
    parts = [_DAILY_SQL + """
, base AS MATERIALIZED (
  SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS x,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
w0 AS MATERIALIZED (SELECT x, y, n, CAST(1 AS DOUBLE) AS w FROM base)"""]
    for r in range(1, _HUBER_ROUNDS + 1):
        parts.append(f""",
fit{r} AS MATERIALIZED (
  -- weighted least squares, moments multiplied in DOUBLE (BIGINT
  -- n*Sxy overflows at scale; the drift_cramer_von_mises rule)
  SELECT
    -- NULLIF on the data-dependent WLS denominators (review r14):
    -- a 1-row or weight-degenerate series must yield NULL on both
    -- engines, not a Spark-ANSI abort vs a DuckDB NULL
    (sw * swxy - swx * swy) / NULLIF(sw * swxx - swx * swx, 0) AS b,
    (swy - (sw * swxy - swx * swy)
             / NULLIF(sw * swxx - swx * swx, 0) * swx) / NULLIF(sw, 0)
      AS a
  FROM (
    SELECT
      CAST(SUM(CAST(ROUND(w, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sw,
      CAST(SUM(CAST(ROUND(w * x, 6) AS DECIMAL(30,6))) AS DOUBLE) AS swx,
      CAST(SUM(CAST(ROUND(w * y, 6) AS DECIMAL(30,6))) AS DOUBLE) AS swy,
      CAST(SUM(CAST(ROUND(w * x * x, 6) AS DECIMAL(30,6))) AS DOUBLE)
        AS swxx,
      CAST(SUM(CAST(ROUND(w * x * y, 6) AS DECIMAL(30,6))) AS DOUBLE)
        AS swxy
    FROM w{r - 1}
  )
),
res{r} AS MATERIALIZED (
  SELECT b.x, b.y, b.n, abs(b.y - f.a - f.b * b.x) AS ar
  FROM base b CROSS JOIN fit{r} f
),
med{r} AS MATERIALIZED (
  -- exact median by rank selection (engine-percentile-free)
  SELECT CASE WHEN MAX(n) % 2 = 1 THEN MAX(v_mid)
         ELSE (MAX(v_lo) + MAX(v_hi)) / CAST(2 AS DOUBLE) END AS mad
  FROM (
    SELECT n,
      CASE WHEN rk = (n + 1) // 2 AND n % 2 = 1 THEN ar END AS v_mid,
      CASE WHEN rk = n // 2 THEN ar END AS v_lo,
      CASE WHEN rk = n // 2 + 1 THEN ar END AS v_hi
    FROM (SELECT n, ar, ROW_NUMBER() OVER (ORDER BY ar) AS rk
          FROM res{r})
  ) GROUP BY n
),
w{r} AS MATERIALIZED (
  SELECT r.x, r.y, r.n,
         ROUND(CASE WHEN r.ar <= {_HUBER_NUM} * m.mad
                         / CAST(10000000 AS DOUBLE)
                    THEN CAST(1 AS DOUBLE)
                    ELSE {_HUBER_NUM} * m.mad
                         / CAST(10000000 AS DOUBLE) / r.ar END, 9) AS w
  FROM res{r} r CROSS JOIN med{r} m
)""")
    r = _HUBER_ROUNDS
    parts.append(f"""
SELECT ROUND(f.a, 9) AS intercept, ROUND(f.b, 9) + 0.0 AS slope,
       ROUND({_HUBER_NUM} * m.mad / CAST(10000000 AS DOUBLE), 9)
         AS k_threshold,
       (SELECT CAST(SUM(CASE WHEN w < 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM w{r}) AS n_downweighted
FROM fit{r} f CROSS JOIN med{r} m
""")
    return "".join(parts)


@query("regression_huber_irls", _huber_sql())
def regression_huber_irls(spark, sf_dir):
    """HUBER ROBUST LINE FIT by IRLS (Huber 1964) on the daily order
    counts vs day index: OLS init, then 2 rounds of re-weighting with
    w = min(1, k/|resid|), k = 1.345 sigma-hat with sigma-hat the
    MAD-consistent scale (1.4826 x median absolute residual, median by
    exact rank selection — never an engine percentile). The robust
    counterpart to theil_sen_trend (pairwise-median) and the OLS
    diagnostics family. Weighted moments are multiplied in DOUBLE and
    reduced as round-fenced decimal sums; everything runs on the
    CALENDAR-bounded day table — at 100 TB the corpus pass is the daily
    rollup, identical to every other entry on this base."""
    from arangodb_java_parquet_spark.queries.changepoint import _daily
    daily = _daily(spark, sf_dir)
    base = materialize(daily.select(
        "y", F.row_number().over(W.orderBy("day")).alias("x"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("n")))
    wdf = base.select("x", "y", "n", F.lit(1.0).alias("w"))

    def d6(c):
        return F.sum(F.round(c, 6).cast("decimal(30,6)")).cast("double")

    k_expr = None
    fit = None
    n_down = None
    for _ in range(_HUBER_ROUNDS):
        mom = wdf.agg(
            F.sum(F.round("w", 9).cast("decimal(20,9)")).cast("double")
            .alias("sw"),
            d6(F.col("w") * F.col("x")).alias("swx"),
            d6(F.col("w") * F.col("y")).alias("swy"),
            d6(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
            d6(F.col("w") * F.col("x") * F.col("y")).alias("swxy"))
        b_ = ((F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy"))
              / F.nullif(F.col("sw") * F.col("swxx")
                         - F.col("swx") * F.col("swx"), F.lit(0.0)))
        fit = materialize(mom.select(
            b_.alias("b"),
            ((F.col("swy") - b_ * F.col("swx"))
             / F.nullif(F.col("sw"), F.lit(0.0))).alias("a")))
        res = materialize(base.crossJoin(F.broadcast(fit)).select(
            "x", "y", "n",
            F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("x"))
            .alias("ar")))
        rk = res.select("n", "ar",
                        F.row_number().over(W.orderBy("ar")).alias("rk"))
        # exact rank-selection median (matches the SQL med CTE)
        sel = rk.agg(
            F.max("n").alias("n"),
            F.max(F.when((F.col("rk") == F.expr("(n + 1) div 2"))
                         & (F.col("n") % 2 == 1), F.col("ar")))
            .alias("v_mid"),
            F.max(F.when(F.col("rk") == F.expr("n div 2"), F.col("ar")))
            .alias("v_lo"),
            F.max(F.when(F.col("rk") == F.expr("n div 2 + 1"),
                         F.col("ar"))).alias("v_hi"))
        med = materialize(sel.select(
            F.when(F.col("n") % 2 == 1, F.col("v_mid"))
            .otherwise((F.col("v_lo") + F.col("v_hi")) / F.lit(2.0))
            .alias("mad")))
        k_expr = (F.lit(_HUBER_NUM) * F.col("mad")
                  / F.lit(10000000).cast("double"))
        wcol = F.round(
            F.when(F.col("ar") <= k_expr, F.lit(1.0))
            .otherwise(k_expr / F.col("ar")), 9)
        wdf = res.crossJoin(F.broadcast(med)).select(
            "x", "y", "n", wcol.alias("w"))
        n_down = wdf.agg(
            F.sum(F.when(F.col("w") < 1, 1).otherwise(0)).cast("bigint")
            .alias("n_downweighted"))
    return (fit.crossJoin(F.broadcast(med))
            .crossJoin(F.broadcast(n_down))
            .select(F.round("a", 9).alias("intercept"),
                    (F.round("b", 9) + 0.0).alias("slope"),
                    F.round(F.lit(_HUBER_NUM) * F.col("mad")
                            / F.lit(10000000).cast("double"), 9)
                    .alias("k_threshold"),
                    "n_downweighted"))


# ---------------------------------------------------------------------------
# AR(2) fit by Yule-Walker + one-step forecast on the daily series.
# ---------------------------------------------------------------------------

def _ar2_sql() -> str:
    from arangodb_java_parquet_spark.queries.changepoint import _DAILY_SQL
    return _DAILY_SQL + """
, base AS MATERIALIZED (
  SELECT y,
         LEAD(y)    OVER (ORDER BY day) AS y1,
         LEAD(y, 2) OVER (ORDER BY day) AS y2,
         ROW_NUMBER() OVER (ORDER BY day DESC) AS rk_end
  FROM daily
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s FROM base),
dev AS MATERIALIZED (
  SELECT b.y - m.s / CAST(m.n AS DOUBLE) AS d0,
         b.y1 - m.s / CAST(m.n AS DOUBLE) AS d1,
         b.y2 - m.s / CAST(m.n AS DOUBLE) AS d2,
         b.rk_end, m.n, m.s
  FROM base b CROSS JOIN m
),
acc AS (
  SELECT MAX(n) AS n, MAX(s) AS s,
    CAST(SUM(CAST(ROUND(d0 * d0, 6) AS DECIMAL(30,6))) AS DOUBLE) AS den,
    CAST(SUM(CAST(ROUND(CASE WHEN d1 IS NOT NULL THEN d0 * d1 END, 6)
                  AS DECIMAL(30,6))) AS DOUBLE) AS num1,
    CAST(SUM(CAST(ROUND(CASE WHEN d2 IS NOT NULL THEN d0 * d2 END, 6)
                  AS DECIMAL(30,6))) AS DOUBLE) AS num2,
    MAX(CASE WHEN rk_end = 1 THEN d0 END) AS dlast,
    MAX(CASE WHEN rk_end = 2 THEN d0 END) AS dprev
  FROM dev
),
yw AS (
  SELECT n, s, den, dlast, dprev,
         -- NULLIF: a constant series has den = 0 exactly (review r14)
         num1 / NULLIF(den, 0) AS r1, num2 / NULLIF(den, 0) AS r2
  FROM acc
)
SELECT n AS n_days,
       ROUND(r1, 9) + 0.0 AS r1, ROUND(r2, 9) + 0.0 AS r2,
       ROUND(r1 * (1 - r2) / NULLIF(1 - r1 * r1, 0), 9) + 0.0 AS phi1,
       ROUND((r2 - r1 * r1) / NULLIF(1 - r1 * r1, 0), 9) + 0.0 AS phi2,
       ROUND((den / n) * (1 - (r1 * (1 - r2) / NULLIF(1 - r1 * r1, 0)) * r1
                            - ((r2 - r1 * r1) / NULLIF(1 - r1 * r1, 0))
                              * r2), 9) + 0.0 AS sigma2,
       ROUND(s / CAST(n AS DOUBLE)
             + (r1 * (1 - r2) / NULLIF(1 - r1 * r1, 0)) * dlast
             + ((r2 - r1 * r1) / NULLIF(1 - r1 * r1, 0)) * dprev, 9)
         AS forecast_next
FROM yw
"""


@query("forecast_ar2_yule_walker", _ar2_sql())
def forecast_ar2_yule_walker(spark, sf_dir):
    """AR(2) FIT BY YULE-WALKER on the daily order counts: lag-1/lag-2
    autocorrelations from exact-moment deviation sums, phi1/phi2 from
    the closed-form 2x2 Yule-Walker solve, innovation variance, and
    the one-step-ahead forecast — the parametric AR companion to
    timeseries_pacf (which stops at the partial autocorrelations) and
    the naive/EWMA/Holt/theta forecasting bench. Deviation products
    are round-6-fenced decimal sums (squared-deviation rule); every
    derived ratio is a single-shape expression over identical doubles
    with the 1 - r1^2 denominator NULLIF-guarded; near-zero outputs
    carry the +0.0 anti--0.0 guard. Calendar-bounded after the daily
    rollup."""
    from arangodb_java_parquet_spark.queries.changepoint import _daily
    daily = _daily(spark, sf_dir)
    wd = W.orderBy("day")
    base = materialize(daily.select(
        "y", F.lead("y").over(wd).alias("y1"),
        F.lead("y", 2).over(wd).alias("y2"),
        F.row_number().over(W.orderBy(F.desc("day"))).alias("rk_end")))
    m = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("y").cast("bigint").alias("s"))
    mean = F.col("s") / F.col("n").cast("double")
    dev = base.crossJoin(F.broadcast(m)).select(
        (F.col("y") - mean).alias("d0"),
        (F.col("y1") - mean).alias("d1"),
        (F.col("y2") - mean).alias("d2"),
        "rk_end", "n", "s")

    def d6(c):
        return F.sum(F.round(c, 6).cast("decimal(30,6)")).cast("double")

    acc = dev.agg(
        F.max("n").alias("n"), F.max("s").alias("s"),
        d6(F.col("d0") * F.col("d0")).alias("den"),
        d6(F.when(F.col("d1").isNotNull(),
                  F.col("d0") * F.col("d1"))).alias("num1"),
        d6(F.when(F.col("d2").isNotNull(),
                  F.col("d0") * F.col("d2"))).alias("num2"),
        F.max(F.when(F.col("rk_end") == 1, F.col("d0"))).alias("dlast"),
        F.max(F.when(F.col("rk_end") == 2, F.col("d0"))).alias("dprev"))
    yw = acc.select(
        "n", "s", "den", "dlast", "dprev",
        (F.col("num1") / F.nullif(F.col("den"), F.lit(0.0))).alias("r1"),
        (F.col("num2") / F.nullif(F.col("den"), F.lit(0.0))).alias("r2"))
    r1, r2 = F.col("r1"), F.col("r2")
    dn = F.nullif(F.lit(1.0) - r1 * r1, F.lit(0.0))
    phi1 = r1 * (1 - r2) / dn
    phi2 = (r2 - r1 * r1) / dn
    return yw.select(
        F.col("n").alias("n_days"),
        (F.round(r1, 9) + 0.0).alias("r1"),
        (F.round(r2, 9) + 0.0).alias("r2"),
        (F.round(phi1, 9) + 0.0).alias("phi1"),
        (F.round(phi2, 9) + 0.0).alias("phi2"),
        (F.round((F.col("den") / F.col("n"))
                 * (1 - phi1 * r1 - phi2 * r2), 9) + 0.0).alias("sigma2"),
        F.round(F.col("s") / F.col("n").cast("double")
                + phi1 * F.col("dlast") + phi2 * F.col("dprev"), 9)
        .alias("forecast_next"))


# ---------------------------------------------------------------------------
# Croston's method for intermittent demand (Croston 1972), alpha = 1/4.
# ---------------------------------------------------------------------------

_CROSTON_SQL = """
WITH err AS (
  SELECT CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM events WHERE event_type = 'error'
),
thr AS (
  -- exact P99 by rank selection (never an engine percentile)
  SELECT value AS thr FROM err WHERE rk = (n * 99 + 99) // 100
),
dem AS MATERIALIZED (
  SELECT e.day, CAST(COUNT(*) AS BIGINT) AS d
  FROM err e, thr WHERE e.value >= thr.thr
  GROUP BY e.day
),
seq AS (
  SELECT day, d,
         COALESCE(day - LAG(day) OVER (ORDER BY day), 1) AS q
  FROM dem
),
steps AS (
  SELECT list([CAST(d AS DOUBLE), CAST(q AS DOUBLE)] ORDER BY day) AS s,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM seq
),
fin AS (
  -- DOUBLE-list accumulator (snapshot-correct on both engines;
  -- DuckDB list_reduce has no init arg, the seed IS element 1).
  -- CASE-guard mirrors the Spark side (ADVICE r14): today list() of
  -- zero rows returns NULL and list_reduce(NULL) is NULL, but if a
  -- future DuckDB returned [] instead, list_reduce on an empty list
  -- RAISES — the guard keeps an empty demand series NULL symmetrically
  SELECT m,
         CASE WHEN m >= 1 THEN list_reduce(s, (acc, x) -> [
           acc[1] + (x[1] - acc[1]) / 4,
           acc[2] + (x[2] - acc[2]) / 4]) END AS zp
  FROM steps
)
SELECT m AS n_demand_days,
       ROUND(zp[1], 9) AS z_size,
       ROUND(zp[2], 9) AS p_interval,
       ROUND(zp[1] / zp[2], 9) AS forecast_per_day
FROM fin
"""


@query("forecast_croston", _CROSTON_SQL)
def forecast_croston(spark, sf_dir):
    """CROSTON'S METHOD (1972) for INTERMITTENT demand — the standard
    forecaster when most periods have ZERO demand, where EWMA/Holt
    systematically bias low: separate exponential smoothing (alpha =
    1/4, binary-exact) of the nonzero demand SIZES z and the
    inter-demand INTERVALS p, forecast = z/p per period. The demand
    series here is genuinely intermittent: days with 'error' events at
    or above the exact rank-selected P99 severity value. The recursion
    runs as one ordered-list fold with a DOUBLE-LIST accumulator (the
    forecast_holt_linear pattern: snapshot-correct on both engines,
    immune to DuckDB's in-place struct-accumulator mutation). Scale:
    one corpus pass to the daily rollup; the fold is calendar-bounded."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    err = e.select(
        F.col("ts").cast("date").alias("day"), "value",
        F.row_number().over(W.orderBy("value", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("n"))
    thr = err.filter(
        F.col("rk") == F.expr("(n * 99 + 99) div 100")).select(
        F.col("value").alias("thr"))
    dem = materialize(
        err.crossJoin(F.broadcast(thr))
        .filter(F.col("value") >= F.col("thr"))
        .groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("d")))
    seq = dem.select(
        "day", "d",
        F.coalesce(F.datediff(F.col("day"),
                              F.lag("day").over(W.orderBy("day"))),
                   F.lit(1)).alias("q"))
    steps = seq.agg(
        F.expr("transform(array_sort(collect_list(struct(day,"
               " array(CAST(d AS DOUBLE), CAST(q AS DOUBLE)) AS v))),"
               " e -> e.v)").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("m"))
    # m = 0 guard (review r14): an empty demand series must yield NULL
    # outputs on both engines, not a Spark ANSI slice/element_at error
    # vs DuckDB's NULL list. CASE short-circuits per row, so the fold
    # never evaluates when s is empty.
    fold = ("CASE WHEN size(s) >= 1 THEN"
            " aggregate(slice(s, 2, greatest(size(s) - 1, 0)),"
            " element_at(s, 1),"
            " (acc, x) -> array("
            "   element_at(acc, 1)"
            "     + (element_at(x, 1) - element_at(acc, 1)) / 4,"
            "   element_at(acc, 2)"
            "     + (element_at(x, 2) - element_at(acc, 2)) / 4))"
            " END")
    return steps.select(
        F.col("m").alias("n_demand_days"),
        F.round(F.expr(f"element_at({fold}, 1)"), 9).alias("z_size"),
        F.round(F.expr(f"element_at({fold}, 2)"), 9).alias("p_interval"),
        F.round(F.expr(f"element_at({fold}, 1) / element_at({fold}, 2)"),
                9).alias("forecast_per_day"))
