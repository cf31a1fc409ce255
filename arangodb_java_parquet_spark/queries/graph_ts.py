"""Graph-structure and long-memory time-series diagnostics (round 12c).

Four operators a 100 TB curation pipeline runs on its derived structures:
HITS hub/authority scores on the customer->supplier transaction bipartite
(who aggregates demand, who concentrates supply), the per-node local
clustering coefficient on the skew-capped LSH similarity graph (is this
near-dup neighborhood a clique or a hub-and-spoke), the normalized
spectral entropy of the revenue series (is the seasonal structure
concentrated or diffuse), and the Hurst rescaled-range exponent (does the
series have long-range dependence, i.e. do naive-iid confidence intervals
lie).

Determinism: per the house recipes — iterative scores are round-9-fenced
decimal sums normalized by exact maxima (the eigenvector-centrality
pattern, trend.py); triangle/degree arithmetic is pure integer; the R/S
statistic is built from EXACT bigint block sums (whole-currency units via
integer division of exact cents) so max/min of cumulative deviations are
integer-exact; the final log-log slope is a closed form over a PIVOTED
fixed block-size set (no order-dependent float reduction anywhere).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import (
    materialize, materialize_iter)
from arangodb_java_parquet_spark.operators.dedup import (
    char_shingles, lsh_candidate_pairs_capped, minhash_signatures)
from arangodb_java_parquet_spark.queries.common import query, t
from arangodb_java_parquet_spark.queries.text_pipeline import (
    _MINHASH_SIG_SQL, capped_pairs_cte_sql)

# ---------------------------------------------------------------------------
# HITS hubs & authorities on the customer -> supplier bipartite
# ---------------------------------------------------------------------------

_HITS_ITERS = 3


def _hits_sql() -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
a0 AS (SELECT DISTINCT s, CAST(1 AS DOUBLE) AS a FROM edges)"""
    prev = "a0"
    parts = []
    for k in range(1, _HITS_ITERS + 1):
        parts.append(f"""
hr{k} AS (
  SELECT e.c, CAST(SUM(CAST(ROUND(p.a, 9) AS DECIMAL(30,9))) AS DOUBLE) AS h
  FROM edges e JOIN {prev} p ON p.s = e.s GROUP BY e.c
),
hm{k} AS (SELECT MAX(h) AS m FROM hr{k}),
h{k} AS (SELECT c, ROUND(h / m, 9) AS h FROM hr{k} CROSS JOIN hm{k}),
ar{k} AS (
  SELECT e.s, CAST(SUM(CAST(ROUND(p.h, 9) AS DECIMAL(30,9))) AS DOUBLE) AS a
  FROM edges e JOIN h{k} p ON p.c = e.c GROUP BY e.s
),
am{k} AS (SELECT MAX(a) AS m FROM ar{k}),
a{k} AS (SELECT s, ROUND(a / m, 9) AS a FROM ar{k} CROSS JOIN am{k})""")
        prev = f"a{k}"
    return (head + "," + ",".join(parts) + f"""
SELECT 'hub' AS role, c AS node, h AS score FROM h{_HITS_ITERS}
UNION ALL
SELECT 'authority' AS role, s AS node, a AS score FROM a{_HITS_ITERS}""")


@query("graph_hits_scores", _hits_sql())
def graph_hits_scores(spark, sf_dir):
    """HITS (Kleinberg 1999) on the customer->supplier transaction
    bipartite: 3 unrolled mutual-reinforcement iterations h <- A a,
    a <- A^T h, each max-normalized — hubs are customers whose demand
    spans the strongest suppliers, authorities are suppliers serving
    the strongest customers (the same mutual-reinforcement structure
    ranks queries vs documents in a click bipartite). Determinism is
    the eigenvector-centrality recipe (trend.py): neighbor scores are
    round-9-fenced exact decimal sums, the max normalizer is exact,
    each iteration re-fences at round-9. The edge list is one
    distinct projection of the orders-lineitem join (shuffle on
    orderkey, then on the pair); each iteration is a score join (AQE
    broadcasts the linear-in-sf score vector while it fits, shuffle
    join beyond) + combinable groupBy — O(E) per round."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    edges = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct()
             .transform(materialize))  # feeds all 6 iteration joins
    a = (edges.select("s").distinct()
         .withColumn("a", F.lit(1).cast("double")))
    h = None
    # The per-node score relations (a/h) scale LINEARLY with sf, so no
    # explicit broadcast hint on the iteration joins: AQE broadcasts them
    # at runtime while they fit (they do at sf0.1) and falls back to a
    # shuffle join at scale factors where a forced broadcast would be a
    # driver-memory liability.
    # r16 (VERDICT r15 #9): the max normalizer is FOLDED into the
    # iteration as an unpartitioned window max over the per-node
    # aggregate instead of a 1-row broadcast-subquery crossJoin — the
    # r15 shape paid a separate BroadcastExchange job per half-step
    # (2·iters extra jobs re-scanning the hr/ar checkpoint); the window
    # evaluates inline in the same job. Same max, same round-9 division
    # — the oracle's CROSS JOIN max CTE is unchanged. The window's
    # single-partition exchange holds one row PER NODE (score vectors
    # are the linear-in-nodes relations every iteration already
    # broadcasts); the NORMALIZED score is what gets checkpointed now —
    # each h/a feeds the next half-step join and (for the last round)
    # the output union, so the checkpoint still cuts the two-consumer
    # re-derivation.
    wmax = W.partitionBy().rowsBetween(W.unboundedPreceding,
                                       W.unboundedFollowing)
    for _ in range(_HITS_ITERS):
        hr = (edges.join(a, "s")
              .groupBy("c")
              .agg(F.sum(F.round(F.col("a"), 9).cast("decimal(30,9)"))
                   .cast("double").alias("h")))
        h = (hr.select(
                "c", F.round(F.col("h") / F.max("h").over(wmax), 9)
                .alias("h"))
             .transform(materialize_iter))
        ar = (edges.join(h, "c")
              .groupBy("s")
              .agg(F.sum(F.round(F.col("h"), 9).cast("decimal(30,9)"))
                   .cast("double").alias("a")))
        a = (ar.select(
                "s", F.round(F.col("a") / F.max("a").over(wmax), 9)
                .alias("a"))
             .transform(materialize_iter))
    hubs = h.select(F.lit("hub").alias("role"),
                    F.col("c").alias("node"), F.col("h").alias("score"))
    auths = a.select(F.lit("authority").alias("role"),
                     F.col("s").alias("node"), F.col("a").alias("score"))
    return hubs.unionAll(auths)


# ---------------------------------------------------------------------------
# local clustering coefficient on the capped LSH similarity graph
# ---------------------------------------------------------------------------

@query("graph_local_clustering", _MINHASH_SIG_SQL
       + capped_pairs_cte_sql(32, out="e") + """,
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT doc_a AS node FROM e UNION ALL SELECT doc_b FROM e)
  GROUP BY node
),
tri AS (
  SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
  FROM e ab
  JOIN e bc ON bc.doc_a = ab.doc_b
  JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
),
pernode AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       2.0 * COALESCE(p.triangles, 0)
         / (CAST(d.degree AS DOUBLE) * (d.degree - 1)) AS lcc
FROM deg d LEFT JOIN pernode p ON p.node = d.node
WHERE d.degree >= 2
""")
def graph_local_clustering(spark, sf_dir):
    """LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998) per node of
    the skew-capped LSH similarity graph: 2*triangles/(deg*(deg-1)) —
    the clique-vs-star discriminator for near-dup neighborhoods (a
    true duplicate cluster closes its triangles, lcc -> 1; a template
    hub that merely shares boilerplate with many unrelated pages stays
    open, lcc -> 0) — exactly the signal that decides MERGE vs KEEP
    when resolving a dedup component. Triangles enumerate once in
    canonical a<b<c orientation (the graph_triangle_count joins,
    lifecycle.py:221) and are attributed to all three corners by an
    explode-free 3-way unionAll; degree and triangle counts are pure
    integers, lcc an exact-rational double division. The capped graph
    is the r12 default for pre-dedup diagnostics (SKEW_PROBE.md)."""
    d = t(spark, sf_dir, "documents")
    sh = char_shingles(d, "text", "doc_id", k=5, distinct=False)
    e = (lsh_candidate_pairs_capped(minhash_signatures(sh, "doc_id"),
                                    "doc_id", max_bucket=32)
         .select("doc_a", "doc_b").transform(materialize))
    deg = (e.select(F.col("doc_a").alias("node"))
           .unionAll(e.select("doc_b"))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("bigint").alias("degree")))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (ab.join(bc, F.col("bc.doc_a") == F.col("ab.doc_b"))
           .join(ac, (F.col("ac.doc_a") == F.col("ab.doc_a"))
                 & (F.col("ac.doc_b") == F.col("bc.doc_b")))
           .select(F.col("ab.doc_a").alias("a"),
                   F.col("ab.doc_b").alias("b"),
                   F.col("bc.doc_b").alias("c"))
           .transform(materialize))  # feeds the 3-corner unionAll
    pernode = (tri.select(F.col("a").alias("node"))
               .unionAll(tri.select("b"))
               .unionAll(tri.select("c"))
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("bigint").alias("triangles")))
    tr = F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint")
    return (deg.join(pernode, "node", "left")
            .filter(F.col("degree") >= 2)
            .select("node", "degree", tr.alias("triangles"),
                    (2.0 * tr / (F.col("degree").cast("double")
                                 * (F.col("degree") - 1))).alias("lcc")))


# ---------------------------------------------------------------------------
# spectral entropy of the daily revenue series
# ---------------------------------------------------------------------------

_SE_KS = 16
# powers are scaled by an exact binary factor before the round-9 fence so
# the k-term normalizer sum stays under the ~1e7 magnitude ceiling even if
# revenue energy concentrates on one coefficient.
_SE_SCALE = float(1 << 40)

_SE_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           / CAST(100 AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
idx AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY day) - 1 AS tt,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
ks AS (SELECT UNNEST(range(1, {_SE_KS} + 1)) AS k),
coef AS (
  SELECT k, MAX(n) AS n,
         CAST(SUM(CAST(ROUND(rev * ROUND(cos(2 * pi() * k * tt / n), 9),
                             2) AS DECIMAL(30,2))) AS DOUBLE) AS a_k,
         CAST(SUM(CAST(ROUND(rev * ROUND(sin(2 * pi() * k * tt / n), 9),
                             2) AS DECIMAL(30,2))) AS DOUBLE) AS b_k
  FROM idx CROSS JOIN ks
  GROUP BY k
),
pw AS (
  SELECT k, n,
         ROUND((a_k * a_k + b_k * b_k) / n
               / CAST({int(_SE_SCALE)} AS DOUBLE), 9) AS ps
  FROM coef
),
tot AS (
  SELECT MAX(n) AS n_days,
         CAST(SUM(CAST(ps AS DECIMAL(30,9))) AS DOUBLE) AS s,
         MAX(ps) AS mx
  FROM pw
),
terms AS (
  SELECT t.n_days, t.s, t.mx,
         ROUND(-(p.ps / t.s) * ln(p.ps / t.s), 9) AS term
  FROM pw p CROSS JOIN tot t
  WHERE p.ps > 0
)
SELECT CAST(MAX(n_days) AS BIGINT) AS n_days,
       CAST({_SE_KS} AS BIGINT) AS n_freqs,
       CAST(SUM(CAST(term AS DECIMAL(30,9))) AS DOUBLE) AS spectral_entropy,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(30,9))) AS DOUBLE)
             / ln(CAST({_SE_KS} AS DOUBLE)), 9) AS entropy_norm,
       MAX(mx) / MAX(s) AS dominant_share
FROM terms
"""


@query("timeseries_spectral_entropy", _SE_SQL)
def timeseries_spectral_entropy(spark, sf_dir):
    """SPECTRAL ENTROPY of the daily revenue series: Shannon entropy of
    the normalized periodogram over the first 16 Fourier frequencies —
    the single number separating "one dominant cycle" (entropy -> 0,
    forecastable) from "white-ish spectrum" (entropy -> ln K, don't
    bother with seasonal models); the standard `forecastability`
    feature in time-series classification (Hyndman's tsfeatures).
    Coefficients reuse the periodogram recipe verbatim (round-9 trig
    basis, round-2 revenue products, exact decimal sums —
    event_analytics.py:1399); powers are scaled by an exact binary
    2^-40 (entropy is scale-invariant) so the round-9 fences hold at
    any revenue magnitude, the 16-term normalizer and entropy
    reductions are fenced decimal sums, and the plain p*ln(p)
    arithmetic runs on bit-identical doubles. The daily rollup uses
    exact integer cents (the Benford recipe) rather than dsum so the
    per-day revenue is identical without a decimal column."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg((F.sum(F.round(F.col("o_totalprice") * 100)
                         .cast("bigint")).cast("bigint") / 100.0)
                  .alias("rev"))
             .transform(materialize))
    wn = W.orderBy("day")
    idx = daily.select(
        "rev", (F.row_number().over(wn) - 1).alias("tt"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint").alias("n"))
    ks = spark.range(1, _SE_KS + 1).select(F.col("id").alias("k"))
    ang = (2 * F.expr("pi()") * F.col("k") * F.col("tt") / F.col("n"))
    coef = (idx.crossJoin(F.broadcast(ks))
            .groupBy("k")
            .agg(F.max("n").alias("n"),
                 F.sum(F.round(F.col("rev") * F.round(F.cos(ang), 9), 2)
                       .cast("decimal(30,2)")).cast("double").alias("a_k"),
                 F.sum(F.round(F.col("rev") * F.round(F.sin(ang), 9), 2)
                       .cast("decimal(30,2)")).cast("double")
                 .alias("b_k")))
    pw = coef.select(
        "k", "n",
        F.round((F.col("a_k") * F.col("a_k") + F.col("b_k") * F.col("b_k"))
                / F.col("n") / _SE_SCALE, 9).alias("ps"))
    tot = pw.agg(F.max("n").alias("n_days"),
                 F.sum(F.col("ps").cast("decimal(30,9)"))
                 .cast("double").alias("s"),
                 F.max("ps").alias("mx"))
    p_ = F.col("ps") / F.col("s")
    terms = (pw.crossJoin(F.broadcast(tot))
             .filter(F.col("ps") > 0)
             .select("n_days", "s", "mx",
                     F.round(-p_ * F.log(p_), 9).alias("term")))
    ent = F.sum(F.col("term").cast("decimal(30,9)")).cast("double")
    return (terms.agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.lit(_SE_KS).cast("bigint").alias("n_freqs"),
        ent.alias("spectral_entropy"),
        F.round(ent / F.log(F.lit(float(_SE_KS))), 9).alias("entropy_norm"),
        (F.max("mx") / F.max("s")).alias("dominant_share")))


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

_RS_SIZES = (16, 32, 64, 128)  # dyadic block lengths, x = ln m exact ladder


def _hurst_sql() -> str:
    sizes = ", ".join(str(m) for m in _RS_SIZES)
    pivots = "\n".join(
        f"         MAX(CASE WHEN m = {m} THEN y END) AS y{m},"
        for m in _RS_SIZES)
    mpivots = "\n".join(
        f"         MAX(CASE WHEN m = {m} THEN mean_rs END) AS r{m},"
        for m in _RS_SIZES)
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           // 100 AS v
  FROM orders GROUP BY 1
),
idx AS (SELECT v, ROW_NUMBER() OVER (ORDER BY day) - 1 AS tt FROM daily),
ms AS (SELECT UNNEST([{sizes}]) AS m),
cells AS (
  SELECT m, tt // m AS blk, tt % m + 1 AS pos, v,
         CAST(SUM(v) OVER (PARTITION BY m, tt // m ORDER BY tt
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_i,
         CAST(SUM(v) OVER (PARTITION BY m, tt // m) AS BIGINT) AS tot,
         CAST(SUM(v * v) OVER (PARTITION BY m, tt // m) AS BIGINT) AS tot2,
         CAST(COUNT(*) OVER (PARTITION BY m, tt // m) AS BIGINT) AS cnt
  FROM idx CROSS JOIN ms
),
blocks AS (
  SELECT m, blk,
         MAX(m * s_i - pos * tot) AS mx, MIN(m * s_i - pos * tot) AS mn,
         MAX(tot) AS s1, MAX(tot2) AS s2
  FROM cells WHERE cnt = m
  GROUP BY m, blk
),
rs AS (
  SELECT m, blk,
         ((mx - mn) / CAST(m AS DOUBLE))
           / NULLIF(sqrt(s2 / CAST(m AS DOUBLE)
                         - (s1 / CAST(m AS DOUBLE)) * (s1 / CAST(m AS DOUBLE))),
                    0) AS rs
  FROM blocks
),
perm AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CAST(ROUND(rs, 9) AS DECIMAL(30,9))) AS DOUBLE)
            / COUNT(*) AS mean_rs,
         ROUND(ln(CAST(SUM(CAST(ROUND(rs, 9) AS DECIMAL(30,9))) AS DOUBLE)
                  / COUNT(*)), 9) AS y
  FROM rs WHERE rs IS NOT NULL
  GROUP BY m
),
piv AS (
  SELECT
{pivots}
{mpivots}
         CAST(SUM(n_blocks) AS BIGINT) AS n_blocks
  FROM perm
)
SELECT n_blocks, r16 AS mean_rs_16, r32 AS mean_rs_32,
       r64 AS mean_rs_64, r128 AS mean_rs_128,
       (-1.5 * y16 - 0.5 * y32 + 0.5 * y64 + 1.5 * y128)
         / (5.0 * ROUND(ln(CAST(2 AS DOUBLE)), 9)) AS hurst
FROM piv
"""


@query("timeseries_hurst_rs", _hurst_sql())
def timeseries_hurst_rs(spark, sf_dir):
    """HURST EXPONENT by rescaled-range analysis (Hurst 1951; Mandelbrot
    & Wallis 1969): split the daily revenue series into blocks of
    m = 16/32/64/128 days, compute R/S per block (range of cumulative
    mean-deviations over the block std), and fit log E[R/S] ~ H log m.
    H=0.5 is iid; H>0.5 means long-range dependence — the diagnostic
    that says whether naive sqrt(n) error bars on corpus/revenue
    trends are honest. Exactness: daily values are whole currency
    units (exact cents bigint, integer-divided), so block cumulative
    sums, the deviation numerator m*S_i - i*T, and its max/min are ALL
    exact integers; std comes from exact integer moments; per-block
    R/S is straight-line IEEE, block means are round-9 decimal sums,
    and the 4-point log-log slope is a closed form over a PIVOTED
    fixed size ladder (x = ln m exactly spans (i-5.5)ln2) — no
    order-dependent reduction anywhere. One daily rollup + one 4x
    block expansion over the tiny day table."""
    o = t(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS"
                         " BIGINT)) AS BIGINT) div 100").alias("v"))
             .transform(materialize))
    idx = daily.select(
        "v", (F.row_number().over(W.orderBy("day")) - 1).alias("tt"))
    ms = spark.createDataFrame([(m,) for m in _RS_SIZES], "m bigint")
    cell = (idx.crossJoin(F.broadcast(ms))
            .select("m", F.expr("tt div m").alias("blk"),
                    (F.col("tt") % F.col("m") + 1).alias("pos"), "v", "tt"))
    wblk = W.partitionBy("m", "blk")
    cells = cell.select(
        "m", "blk", "pos", "v",
        F.sum("v").over(wblk.orderBy("tt")
                        .rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint").alias("s_i"),
        F.sum("v").over(wblk).cast("bigint").alias("tot"),
        F.sum(F.col("v") * F.col("v")).over(wblk)
        .cast("bigint").alias("tot2"),
        F.count(F.lit(1)).over(wblk).cast("bigint").alias("cnt"))
    dev = F.col("m") * F.col("s_i") - F.col("pos") * F.col("tot")
    blocks = (cells.filter(F.col("cnt") == F.col("m"))
              .groupBy("m", "blk")
              .agg(F.max(dev).alias("mx"), F.min(dev).alias("mn"),
                   F.max("tot").alias("s1"), F.max("tot2").alias("s2")))
    mean = F.col("s1") / F.col("m").cast("double")
    std = F.sqrt(F.col("s2") / F.col("m").cast("double") - mean * mean)
    rs = blocks.select(
        "m", "blk",
        (((F.col("mx") - F.col("mn")) / F.col("m").cast("double"))
         / F.nullif(std, F.lit(0.0))).alias("rs"))
    mean_rs = (F.sum(F.round(F.col("rs"), 9).cast("decimal(30,9)"))
               .cast("double") / F.count(F.lit(1)))
    perm = (rs.filter(F.col("rs").isNotNull())
            .groupBy("m")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                 mean_rs.alias("mean_rs"),
                 F.round(F.log(mean_rs), 9).alias("y")))
    piv = perm.agg(
        *[F.max(F.when(F.col("m") == m, F.col("y"))).alias(f"y{m}")
          for m in _RS_SIZES],
        *[F.max(F.when(F.col("m") == m, F.col("mean_rs"))).alias(f"r{m}")
          for m in _RS_SIZES],
        F.sum("n_blocks").cast("bigint").alias("n_blocks"))
    hurst = ((-1.5 * F.col("y16") - 0.5 * F.col("y32")
              + 0.5 * F.col("y64") + 1.5 * F.col("y128"))
             / (5.0 * F.round(F.log(F.lit(2.0)), 9)))
    return piv.select(
        "n_blocks",
        F.col("r16").alias("mean_rs_16"),
        F.col("r32").alias("mean_rs_32"),
        F.col("r64").alias("mean_rs_64"),
        F.col("r128").alias("mean_rs_128"),
        hurst.alias("hurst"))
