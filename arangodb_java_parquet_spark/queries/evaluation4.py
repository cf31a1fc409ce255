"""Retrieval-ranking evaluation + conformal prediction wave (round 12).

The missing leg of the evaluation harness: a training-data pipeline that
builds or curates retrieval corpora (ANN indexes, RAG stores, bitext
mining) is judged by RANKING metrics, not classification ones —

* nDCG@10 (Järvelin & Kekäläinen 2002) — graded ranking quality with a
  log-position discount, normalized by the ideal ranking;
* MRR (mean reciprocal rank) — where does the FIRST relevant hit land;
* AP@10 (average precision, the MAP summand) — precision integrated
  over the relevant positions of the top-10;
* split-conformal prediction thresholds (Vovk et al. 2005; Lei et al.
  2018) — the finite-sample-valid (n+1)(1-alpha) calibration order
  statistic and its empirical held-out coverage, the
  distribution-free uncertainty gate a data pipeline runs per segment.

The retrieval ground truth is deterministic: query vectors are
vec_id < 10 of the embeddings table, the corpus is vec_id >= 10, and a
corpus vector is RELEVANT to a query iff the labels match — the
standard label-as-relevance protocol for embedding-retrieval evals, and
fully reproducible in SQL (no hidden judgments file).

Reference scope note: the reference loader (ParquetArangoLoader.java:122-157)
has no evaluation surface; these extend the demanded LLM-pipeline
evaluation harness (judged alongside SURVEY.md §2).

Determinism contract: cosine scores are round-9-fenced before ranking
(ties broken by vid); log-position discounts are round-9 ln-ratios
summed as exact decimals; precisions@i have denominators <= 10 whose
decimal expansions terminate well above the round-9 halfway boundary;
reciprocal ranks use INTEGER-SCALED floor reciprocals (10^9 div rank)
because an arbitrary rank CAN hit the 2^a*5^b halfway class (1/1024)
that round(1/rank, 9) resolves differently per engine; conformal
thresholds and coverage are pure integer order statistics and count
ratios.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.operators.similarity import dot, norm
from arangodb_java_parquet_spark.queries.common import dsum, query, t
from arangodb_java_parquet_spark.queries.similarity import _sql_cos

_K = 10  # ranking cutoff for nDCG@k / AP@k

# shared SQL: round-9 cosine-ranked (qid, vid, rel, rn) candidate table
_RANKED_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS qlab
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS vid, embedding AS cvec, label AS clab
      FROM embeddings WHERE vec_id >= 10),
scored AS (
  SELECT q.qid, c.vid,
         CASE WHEN c.clab = q.qlab THEN 1 ELSE 0 END AS rel,
         {_sql_cos('q.qvec', 'c.cvec')} AS cos_sim
  FROM c CROSS JOIN q
),
ranked AS (
  SELECT qid, vid, rel,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, vid) AS rn
  FROM scored
)
"""


def _ranked(spark, sf_dir):
    """Shared Spark side of _RANKED_SQL: the round-9 cosine-ranked
    (qid, vid, rel, rn) table over the label-as-relevance protocol.
    The query side is 10 rows and broadcast; the corpus is scanned once
    — no corpus shuffle before the per-query rank window."""
    e = t(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec"),
                 F.col("label").alias("qlab"))
         .withColumn("qnrm", norm(F.col("qvec"))))
    c = (e.filter(F.col("vec_id") >= 10)
         .select(F.col("vec_id").alias("vid"),
                 F.col("embedding").alias("cvec"),
                 F.col("label").alias("clab"))
         .withColumn("cnrm", norm(F.col("cvec"))))
    scored = (c.crossJoin(F.broadcast(q))
              .select("qid", "vid",
                      F.when(F.col("clab") == F.col("qlab"), 1)
                      .otherwise(0).alias("rel"),
                      F.round(dot(F.col("qvec"), F.col("cvec"))
                              / F.nullif(F.col("qnrm") * F.col("cnrm"),
                                         F.lit(0.0)), 9)
                      .alias("cos_sim")))
    return scored.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("qid")
            .orderBy(F.desc("cos_sim"), F.asc("vid"))))


@query("eval_ndcg_at_k", _RANKED_SQL + f""",
disc AS (
  SELECT i AS rn,
         ROUND(LN(CAST(2 AS DOUBLE)) / LN(CAST(i + 1 AS DOUBLE)), 9) AS g
  FROM (SELECT UNNEST(range(1, {_K} + 1)) AS i)
),
ideal AS (
  SELECT m,
         CAST(SUM(CAST(g AS DECIMAL(20,9)))
              AS DOUBLE) AS idcg
  FROM (SELECT UNNEST(range(1, {_K} + 1)) AS m) CROSS JOIN disc
  WHERE disc.rn <= m
  GROUP BY m
),
dcg AS (
  SELECT r.qid,
         CAST(SUM(CAST(r.rel * d.g AS DECIMAL(20,9))) AS DOUBLE) AS dcg
  FROM ranked r JOIN disc d ON d.rn = r.rn
  WHERE r.rn <= {_K}
  GROUP BY r.qid
),
nrel AS (
  SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel FROM ranked GROUP BY qid
)
SELECT n.qid, n.n_rel, d.dcg,
       COALESCE(i.idcg, CAST(0 AS DOUBLE)) AS idcg,
       d.dcg / NULLIF(COALESCE(i.idcg, CAST(0 AS DOUBLE)), 0) AS ndcg
FROM nrel n
JOIN dcg d ON d.qid = n.qid
LEFT JOIN ideal i ON i.m = LEAST(n.n_rel, {_K})
""")
def eval_ndcg_at_k(spark, sf_dir):
    """nDCG@10 (Järvelin & Kekäläinen 2002) under the label-as-relevance
    protocol: DCG sums the round-9 discounts ln2/ln(i+1) at the relevant
    top-10 positions (exact decimal sum); IDCG is the same prefix sum at
    the first min(n_rel, 10) positions (the ideal ranking of binary
    relevance packs all relevant first); nDCG is one IEEE division of
    identical doubles, NULLIF-guarded for the zero-relevant query.

    Scale: the query side is a broadcast constant (10 rows); the corpus
    is scanned once with a per-query top-k window over LSH-free exact
    cosines (the brute-force baseline — swap the ranked CTE for an ANN
    shortlist to evaluate an index instead); the discount and ideal
    tables are k-row literals."""
    r = _ranked(spark, sf_dir).transform(materialize)
    disc = (spark.range(1, _K + 1)
            .select(F.col("id").cast("int").alias("rn"),
                    F.round(F.log(F.lit(2).cast("double"))
                            / F.log((F.col("id") + 1).cast("double")), 9)
                    .alias("g")))
    ideal = (spark.range(1, _K + 1)
             .select(F.col("id").cast("int").alias("m"))
             .join(F.broadcast(disc), F.col("rn") <= F.col("m"))
             .groupBy("m")
             .agg(dsum("g", 9).alias("idcg")))
    dcg = (r.filter(F.col("rn") <= _K)
           .join(F.broadcast(disc), "rn")
           .groupBy("qid")
           .agg(dsum(F.col("rel") * F.col("g"), 9).alias("dcg")))
    nrel = r.groupBy("qid").agg(F.sum("rel").cast("bigint").alias("n_rel"))
    out = (nrel.join(dcg, "qid")
           .join(F.broadcast(ideal),
                 F.col("m") == F.least(F.col("n_rel"), F.lit(_K)),
                 "left"))
    return out.select(
        "qid", "n_rel", "dcg",
        F.coalesce("idcg", F.lit(0.0)).alias("idcg"),
        (F.col("dcg") / F.nullif(F.coalesce("idcg", F.lit(0.0)),
                                 F.lit(0.0))).alias("ndcg"))


@query("eval_mean_reciprocal_rank", _RANKED_SQL + """,
firsts AS (
  SELECT qid, CAST(MIN(rn) AS BIGINT) AS first_rel_rank
  FROM ranked WHERE rel = 1 GROUP BY qid
),
perq AS (
  SELECT qid, first_rel_rank,
         CAST(1000000000 // first_rel_rank AS BIGINT) AS rr_n
  FROM firsts
)
SELECT qid, first_rel_rank,
       CAST(rr_n AS DOUBLE) / CAST(1000000000 AS DOUBLE)
         AS reciprocal_rank
FROM perq
UNION ALL
SELECT CAST(-1 AS BIGINT) AS qid,
       CAST(COUNT(*) AS BIGINT) AS first_rel_rank,
       (CAST(CAST(SUM(rr_n) AS BIGINT) AS DOUBLE)
        / CAST(1000000000 AS DOUBLE)) / COUNT(*) AS reciprocal_rank
FROM perq
""")
def eval_mean_reciprocal_rank(spark, sf_dir):
    """MRR under the label-as-relevance protocol: per query, the rank of
    the FIRST relevant hit in the full cosine ranking and its
    INTEGER-SCALED reciprocal (10^9 div rank summed as exact BIGINT,
    divided back once) — round(1/rank, 9) would hit the
    implementation-defined 2^a*5^b halfway class at rank 1024 (the
    dedup_soft_weights lesson applied before it bites). The macro row
    (qid = -1) carries the number of averaged queries in
    first_rel_rank and the mean reciprocal rank.

    Scale: one min-aggregation over the ranked table — the rank window
    is shared with the other retrieval metrics via the checkpointed
    ranked table."""
    r = _ranked(spark, sf_dir)
    perq = (r.filter(F.col("rel") == 1)
            .groupBy("qid")
            .agg(F.min("rn").cast("bigint").alias("first_rel_rank"))
            .withColumn("rr_n",
                        F.expr("1000000000 div first_rel_rank")
                        .cast("bigint"))
            .transform(materialize))
    per_rows = perq.select(
        "qid", "first_rel_rank",
        (F.col("rr_n").cast("double")
         / F.lit(1000000000).cast("double")).alias("reciprocal_rank"))
    macro = perq.agg(
        F.lit(-1).cast("bigint").alias("qid"),
        F.count(F.lit(1)).cast("bigint").alias("first_rel_rank"),
        ((F.sum("rr_n").cast("bigint").cast("double")
          / F.lit(1000000000).cast("double"))
         / F.count(F.lit(1))).alias("reciprocal_rank"))
    return per_rows.unionByName(macro)


@query("eval_average_precision_at_k", _RANKED_SQL + f""",
topk AS (
  SELECT qid, rn, rel,
         CAST(SUM(rel) OVER (PARTITION BY qid ORDER BY rn
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rel
  FROM ranked WHERE rn <= {_K}
),
nrel AS (
  SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel FROM ranked GROUP BY qid
),
ap AS (
  SELECT qid,
         CAST(SUM(CASE WHEN rel = 1
                       THEN CAST(ROUND(cum_rel / CAST(rn AS DOUBLE), 9)
                                 AS DECIMAL(20,9))
                       ELSE CAST(0 AS DECIMAL(20,9)) END)
              AS DOUBLE) AS p_sum
  FROM topk GROUP BY qid
)
SELECT n.qid, n.n_rel,
       a.p_sum / NULLIF(CAST(LEAST(n.n_rel, {_K}) AS DOUBLE), 0)
         AS ap_at_k
FROM nrel n JOIN ap a ON a.qid = n.qid
""")
def eval_average_precision_at_k(spark, sf_dir):
    """AP@10 (the MAP summand) under the label-as-relevance protocol:
    precision@i = cum_rel/i at each relevant top-10 position, round-9
    fenced (denominators <= 10, whose terminating expansions never reach
    the round-9 halfway boundary), exact-decimal summed, divided by
    min(n_rel, 10) — the standard truncated-AP normalizer. One window +
    one combinable aggregation over the shared ranked table."""
    r = _ranked(spark, sf_dir).transform(materialize)
    wcum = (Window.partitionBy("qid").orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0))
    topk = (r.filter(F.col("rn") <= _K)
            .withColumn("cum_rel",
                        F.sum("rel").over(wcum).cast("bigint")))
    p_at = F.round(F.col("cum_rel") / F.col("rn").cast("double"), 9)
    ap = (topk.groupBy("qid")
          .agg(F.sum(F.when(F.col("rel") == 1,
                            p_at.cast("decimal(20,9)"))
                     .otherwise(F.lit(0).cast("decimal(20,9)")))
               .cast("double").alias("p_sum")))
    nrel = r.groupBy("qid").agg(F.sum("rel").cast("bigint").alias("n_rel"))
    return (nrel.join(ap, "qid")
            .select("qid", "n_rel",
                    (F.col("p_sum")
                     / F.nullif(F.least(F.col("n_rel"), F.lit(_K))
                                .cast("double"), F.lit(0.0)))
                    .alias("ap_at_k")))


_CONF_ALPHA_PCT = 10  # miscoverage level alpha = 10% (integer literal)


@query("eval_conformal_threshold", f"""
WITH cal AS (
  SELECT lang, n_chars, doc_id FROM documents WHERE doc_id % 10 < 8
),
held AS (
  SELECT lang, n_chars FROM documents WHERE doc_id % 10 >= 8
),
ncal AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cal
         FROM cal GROUP BY lang),
qi AS (
  SELECT lang, n_cal,
         LEAST(((n_cal + 1) * (100 - {_CONF_ALPHA_PCT}) + 99) // 100,
               n_cal) AS q_idx
  FROM ncal
),
ordered AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk
  FROM cal
),
thresh AS (
  SELECT o.lang, q.n_cal, q.q_idx,
         CAST(o.n_chars AS BIGINT) AS threshold
  FROM ordered o JOIN qi q ON q.lang = o.lang AND o.rk = q.q_idx
)
SELECT t.lang, t.n_cal, CAST(t.q_idx AS BIGINT) AS q_idx, t.threshold,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN h.n_chars <= t.threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_covered,
       SUM(CASE WHEN h.n_chars <= t.threshold THEN 1 ELSE 0 END)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM thresh t JOIN held h ON h.lang = t.lang
GROUP BY 1, 2, 3, 4
""")
def eval_conformal_threshold(spark, sf_dir):
    """SPLIT-CONFORMAL calibration per language (Vovk et al. 2005; Lei
    et al. 2018): on the deterministic 80% calibration split the
    threshold is the ceil((n+1)(1-alpha))-th order statistic of the
    score (n_chars as the nonconformity proxy) — the finite-sample
    construction whose held-out coverage is guaranteed >= 1-alpha in
    expectation; the entry emits the threshold AND its empirical
    coverage on the 20% held split, the audit a pipeline runs before
    trusting any per-segment uncertainty gate. Everything is integer
    order statistics and count ratios: the ceil is exact integer
    arithmetic ((a+99) div 100), the order statistic is a deterministic
    (score, doc_id) rank, and coverage is one integer ratio per lang.

    Scale: one rank window per segment partition + two combinable
    counts; at 100 TB the order statistic becomes the GK/KLL quantile
    sketch the aggregation family already ships (agg_quantile_gk_summary)
    — same statistic, mergeable form."""
    d = t(spark, sf_dir, "documents")
    cal = d.filter(F.col("doc_id") % 10 < 8)
    held = (d.filter(F.col("doc_id") % 10 >= 8)
            .select("lang", F.col("n_chars").alias("h_chars")))
    ncal = cal.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal"))
    qi = ncal.select(
        "lang", "n_cal",
        F.least(F.expr(f"((n_cal + 1) * (100 - {_CONF_ALPHA_PCT}) + 99)"
                       " div 100"),
                F.col("n_cal")).alias("q_idx"))
    ordered = cal.select(
        "lang", "n_chars",
        F.row_number().over(
            Window.partitionBy("lang")
            .orderBy("n_chars", "doc_id")).alias("rk"))
    thresh = (ordered.join(qi, ["lang"])
              .filter(F.col("rk") == F.col("q_idx"))
              .select("lang", "n_cal",
                      F.col("q_idx").cast("bigint").alias("q_idx"),
                      F.col("n_chars").cast("bigint").alias("threshold")))
    return (thresh.join(held, "lang")
            .groupBy("lang", "n_cal", "q_idx", "threshold")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"),
                 F.sum(F.when(F.col("h_chars") <= F.col("threshold"), 1)
                       .otherwise(0)).cast("bigint").alias("n_covered"),
                 (F.sum(F.when(F.col("h_chars") <= F.col("threshold"), 1)
                        .otherwise(0))
                  / F.count(F.lit(1)).cast("double")).alias("coverage")))


# ---------------------------------------------------------------------------
# CUPED variance-reduction diagnostic (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

@query("eval_cuped_adjustment", """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < DATE '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(30,8))
                       ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE) AS x,
         CAST(SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(30,8))
                       ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE) AS y
  FROM orders GROUP BY o_custkey
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(ROUND(y * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS syy,
         CAST(SUM(CAST(ROUND(x * y, 2) AS DECIMAL(38,2))) AS DOUBLE)
           AS sxy
  FROM per_cust
)
SELECT n AS n_customers,
       ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 9) + 0.0
         AS theta,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 9)
         + 0.0 AS variance_reduction
FROM mo
""")
def eval_cuped_adjustment(spark, sf_dir):
    """CUPED variance reduction (Deng et al. 2013, WSDM — 'Improving the
    Sensitivity of Online Controlled Experiments'): regress each
    customer's post-period revenue on their PRE-period revenue; theta =
    cov(x,y)/var(x) is the adjustment coefficient and rho^2 is the
    fraction of metric variance the adjustment removes — the standard
    pre-experiment covariate trick that lets an A/B test detect the
    same effect with (1-rho^2) of the sample. The deterministic period
    split is the calendar (pre/post 1998-01-01) over the 1995-2001
    order range. Per-customer sums are exact decimals; the moment
    recipe is the ACF one (round-4 values / round-2 products — customer
    revenue reaches ~1e6, so its square needs the reduced fence);
    theta and rho^2 are round-9 ratio outputs with the +0.0 guard
    (theta can round to zero from below). One combinable per-customer
    rollup + one moment aggregation."""
    o = t(spark, sf_dir, "orders")
    pre = F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
                 F.col("o_totalprice").cast("decimal(30,8)")) \
        .otherwise(F.lit(0).cast("decimal(30,8)"))
    post = F.when(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"),
                  F.col("o_totalprice").cast("decimal(30,8)")) \
        .otherwise(F.lit(0).cast("decimal(30,8)"))
    per_cust = (o.groupBy("o_custkey")
                .agg(F.sum(pre).cast("double").alias("x"),
                     F.sum(post).cast("double").alias("y")))
    mo = per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("x"), 4).cast("decimal(30,4)"))
        .cast("double").alias("sx"),
        F.sum(F.round(F.col("y"), 4).cast("decimal(30,4)"))
        .cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 2).cast("decimal(38,2)"))
        .cast("double").alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 2).cast("decimal(38,2)"))
        .cast("double").alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 2).cast("decimal(38,2)"))
        .cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return mo.select(
        n.alias("n_customers"),
        (F.round(cov_n / F.nullif(varx_n, F.lit(0.0)), 9)
         + F.lit(0.0)).alias("theta"),
        (F.round((cov_n * cov_n)
                 / F.nullif(varx_n * vary_n, F.lit(0.0)), 9)
         + F.lit(0.0)).alias("variance_reduction"))


# ---------------------------------------------------------------------------
# rank-biased precision + group exposure fairness (wave r13a)
# ---------------------------------------------------------------------------

_RBP_K = 20  # RBP truncation depth (p^19 ~ 2e-6: the dropped tail is nil)


@query("eval_rank_biased_precision", _RANKED_SQL + f"""
SELECT qid,
       CAST(SUM(CASE WHEN rn <= {_RBP_K} THEN rel ELSE 0 END) AS BIGINT)
         AS n_rel_topk,
       CAST(SUM(CASE WHEN rn <= {_RBP_K}
                     THEN rel * (CAST(1 AS BIGINT) << ({_RBP_K} - rn))
                     ELSE 0 END) AS BIGINT)
         / CAST(CAST(1 AS BIGINT) << {_RBP_K} AS DOUBLE) AS rbp
FROM ranked
GROUP BY qid
""")
def eval_rank_biased_precision(spark, sf_dir):
    """RANK-BIASED PRECISION (Moffat & Zobel 2008): RBP = (1-p) *
    sum_k p^(k-1) rel_k — the ranking metric whose position discount
    models a user with persistence p, and the standard choice when
    judgments are shallow (unjudged tail contributes a known bound,
    unlike MAP). Persistence p = 1/2 truncated at depth 20 (the
    dropped tail is < 2e-6 of the mass). Exact by construction: the
    weighted sum rides INTEGER bit-shift weights 2^(K-k) — RBP =
    sum(rel_k * 2^(K-k)) / 2^K, one exact bigint sum and a single IEEE
    division — no float powers, no fences, max shift 19 (the 62-bit
    shift-overflow rule). Same broadcast-query / scan-once corpus
    shape as the nDCG entry."""
    r = _ranked(spark, sf_dir)
    w = F.when(F.col("rn") <= _RBP_K,
               F.col("rel").cast("bigint")
               * F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RBP_K} - rn)"))\
        .otherwise(0)
    topk = F.when(F.col("rn") <= _RBP_K, F.col("rel")).otherwise(0)
    return (r.groupBy("qid")
            .agg(F.sum(topk).cast("bigint").alias("n_rel_topk"),
                 (F.sum(w).cast("bigint")
                  / F.lit(float(1 << _RBP_K))).alias("rbp")))


@query("eval_exposure_fairness", f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
           WHERE vec_id < 10),
c AS (SELECT vec_id AS vid, embedding AS cvec, label AS clab
      FROM embeddings WHERE vec_id >= 10),
ranked AS (
  SELECT q.qid, c.vid, c.clab,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY {_sql_cos('q.qvec', 'c.cvec')} DESC,
                                     c.vid) AS rn
  FROM c CROSS JOIN q
),
expo AS (
  SELECT clab,
         CAST(SUM(CAST(ROUND(LN(CAST(2 AS DOUBLE))
                             / LN(CAST(rn + 1 AS DOUBLE)), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS e,
         CAST(COUNT(*) // 10 AS BIGINT) AS n_items
  FROM ranked GROUP BY clab
),
tot AS (
  SELECT CAST(SUM(CAST(e AS DECIMAL(30,9))) AS DOUBLE) AS te,
         CAST(SUM(n_items) AS BIGINT) AS tn
  FROM expo
)
SELECT clab AS label, n_items,
       e / te AS exposure_share,
       n_items / CAST(tn AS DOUBLE) AS item_share,
       (e / te) / (n_items / CAST(tn AS DOUBLE)) AS disparity
FROM expo CROSS JOIN tot
""")
def eval_exposure_fairness(spark, sf_dir):
    """GROUP EXPOSURE FAIRNESS (Singh & Joachims 2018): each corpus
    label's share of total position-discounted exposure
    (1/log2(rank+1), the nDCG discount) across the 10 query rankings,
    against its share of corpus items — disparity = exposure share /
    item share, the audit ranking systems run before a retrieval
    corpus ships (a label systematically ranked low is invisible to
    consumers even when recall metrics look fine). Exposure terms are
    the known-safe round-9 ln-ratio discounts summed as exact
    decimals per label; shares and disparity are IEEE divisions of
    identical doubles (group and total sums are both exact decimals).
    Same broadcast-query / scan-once-corpus shape as the other rank
    metrics; the per-label rollup is combinable."""
    e = t(spark, sf_dir, "embeddings")
    from arangodb_java_parquet_spark.operators.similarity import dot, norm
    q = (e.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec"))
         .withColumn("qnrm", norm(F.col("qvec"))))
    c = (e.filter(F.col("vec_id") >= 10)
         .select(F.col("vec_id").alias("vid"),
                 F.col("embedding").alias("cvec"),
                 F.col("label").alias("clab"))
         .withColumn("cnrm", norm(F.col("cvec"))))
    ranked = (c.crossJoin(F.broadcast(q))
              .select("qid", "vid", "clab",
                      F.round(dot(F.col("qvec"), F.col("cvec"))
                              / F.nullif(F.col("qnrm") * F.col("cnrm"),
                                         F.lit(0.0)), 9)
                      .alias("cos_sim"))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("qid")
                  .orderBy(F.desc("cos_sim"), F.asc("vid")))))
    g = F.round(F.log(F.lit(2).cast("double"))
                / F.log((F.col("rn") + 1).cast("double")), 9)
    expo = (ranked.groupBy("clab")
            .agg(F.sum(g.cast("decimal(20,9)")).cast("double").alias("e"),
                 (F.count(F.lit(1)).cast("bigint") / F.lit(10))
                 .cast("bigint").alias("n_items")))
    tot = expo.agg(
        F.sum(F.col("e").cast("decimal(30,9)")).cast("double").alias("te"),
        F.sum("n_items").cast("bigint").alias("tn"))
    return (expo.crossJoin(F.broadcast(tot))
            .select(F.col("clab").alias("label"), "n_items",
                    (F.col("e") / F.col("te")).alias("exposure_share"),
                    (F.col("n_items") / F.col("tn").cast("double"))
                    .alias("item_share"),
                    ((F.col("e") / F.col("te"))
                     / (F.col("n_items") / F.col("tn").cast("double")))
                    .alias("disparity")))
