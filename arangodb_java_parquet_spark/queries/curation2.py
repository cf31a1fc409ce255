"""Second curation wave: quality-aware cluster resolution, deterministic
training-order interleaving, and confidence-bounded source auditing —
the decisions a pipeline makes AFTER dedup/quality signals exist.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t
from arangodb_java_parquet_spark.queries.curation import (
    _CLUSTER_SQL, _must_replace)

# ---------------------------------------------------------------------------
# keep the BEST document per duplicate cluster (not the min id)
# ---------------------------------------------------------------------------

_KEEP_BEST_SQL = _must_replace(
    _CLUSTER_SQL,
    "SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src",
    """, comp AS (
  SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src
),
sizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
),
ranked AS (
  SELECT c.component, c.node, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.node ASC) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT r.component, r.node AS keep_doc, r.n_chars AS kept_chars,
       s.cluster_size
FROM ranked r JOIN sizes s ON s.component = r.component
WHERE r.rn = 1""")


@query("dedup_keep_best_quality", _KEEP_BEST_SQL)
def dedup_keep_best_quality(spark, sf_dir):
    """Quality-aware cluster resolution: within each near-duplicate
    cluster keep the HIGHEST-QUALITY document (longest here; swap in any
    score column) instead of the arbitrary min-id — the policy real
    curation uses, since near-dup clusters often mix a clean original
    with truncated/boilerplated copies. One window over the component
    labels the verified CC operator emits, joined to the per-doc score;
    deterministic (score desc, id asc) tiebreak. Consumes the
    MATERIALIZED component table (fit-once into the model store) instead
    of re-deriving the CC lineage per run — same hashes, probe-cost
    plan."""
    from arangodb_java_parquet_spark.queries.curation import (
        components_materialized)
    comp = components_materialized(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    ranked = (comp.join(d, comp.node == d.doc_id)
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("component")
                  .orderBy(F.desc("n_chars"), F.asc("node")))))
    return (ranked.filter(F.col("rn") == 1)
            .join(sizes, "component")
            .select("component", F.col("node").alias("keep_doc"),
                    F.col("n_chars").alias("kept_chars"), "cluster_size"))


# ---------------------------------------------------------------------------
# stride-scheduled curriculum interleave
# ---------------------------------------------------------------------------

_INTERLEAVE_N = 200

_INTERLEAVE_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         1 + CAST(substring(source, 4) AS INT) % 3 AS weight,
         md5(CAST(doc_id AS VARCHAR)) AS shuf
  FROM documents
),
ranked AS (
  SELECT doc_id, source, weight,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY shuf, doc_id) AS k
  FROM w
),
keyed AS (
  SELECT doc_id, source, weight,
         CAST(k AS DOUBLE) / CAST(weight AS DOUBLE) AS stride_key
  FROM ranked
),
ordered AS (
  SELECT doc_id, source, weight, stride_key,
         ROW_NUMBER() OVER (ORDER BY stride_key, source, doc_id)
           AS position
  FROM keyed
)
SELECT position, doc_id, source, weight, ROUND(stride_key, 9) AS stride_key
FROM ordered WHERE position <= {_INTERLEAVE_N}
"""


@query("curriculum_interleave", _INTERLEAVE_SQL)
def curriculum_interleave(spark, sf_dir):
    """Deterministic weighted INTERLEAVING of sources into one training
    order — stride scheduling (weighted fair queuing): source s's k-th
    document gets key k/w_s, and the global sort by key emits sources
    proportionally to their weights at every prefix, which is exactly
    what curriculum/mixture training wants (no long single-source runs,
    no RNG). Per-source order is an md5 shuffle; every tie has a
    deterministic (source, doc_id) break. Scale shape: the per-source
    rank window partitions by source (bounded per-source history), and
    the emitted prefix comes from a distributed TakeOrdered over the
    compact (key, id) rows — NOT a global row_number window, which would
    funnel the whole corpus through one partition; only the N-row prefix
    is ever single-partition (to stamp positions). Emitting the FULL
    interleaved order at 100 TB would instead range-sort to partitioned
    output files whose lexicographic order is the schedule."""
    d = t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "source",
        (1 + F.substring("source", 4, 10).cast("int") % 3).alias("weight"),
        F.md5(F.col("doc_id").cast("string")).alias("shuf"))
    ranked = w.withColumn(
        "k", F.row_number().over(
            W.partitionBy("source").orderBy("shuf", "doc_id")))
    keyed = ranked.select(
        "doc_id", "source", "weight",
        (F.col("k").cast("double") / F.col("weight").cast("double"))
        .alias("stride_key"))
    prefix = keyed.orderBy("stride_key", "source", "doc_id") \
        .limit(_INTERLEAVE_N)
    return (prefix.withColumn(
                "position", F.row_number().over(
                    W.orderBy("stride_key", "source", "doc_id")))
            .select("position", "doc_id", "source", "weight",
                    F.round("stride_key", 9).alias("stride_key")))


# ---------------------------------------------------------------------------
# Wilson confidence bounds on per-source keep rates
# ---------------------------------------------------------------------------

_WILSON_SQL = """
WITH flags AS (
  SELECT source,
         CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS keep
  FROM documents
),
agg AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(keep) AS DOUBLE) AS k
  FROM flags GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(k AS BIGINT) AS n_keep,
       ROUND(k / n, 9) AS keep_rate,
       ROUND((k / n + 1.9208e0 / n
              - 1.96e0 * sqrt((k / n) * (1.0e0 - k / n) / n
                              + 0.9604e0 / (n * n)))
             / (1.0e0 + 3.8416e0 / n), 9) AS wilson_low,
       ROUND((k / n + 1.9208e0 / n
              + 1.96e0 * sqrt((k / n) * (1.0e0 - k / n) / n
                              + 0.9604e0 / (n * n)))
             / (1.0e0 + 3.8416e0 / n), 9) AS wilson_high
FROM agg
"""


@query("source_keep_rate_wilson", _WILSON_SQL)
def source_keep_rate_wilson(spark, sf_dir):
    """Per-source keep-rate with WILSON 95% confidence bounds — the
    statistically honest version of a source scorecard: a source with
    3/4 docs kept is not 'better' than one with 700/1000, and the Wilson
    interval (unlike the naive normal one) stays inside [0,1] and
    behaves at small n. Constants (z=1.96, z²=3.8416, z²/2=1.9208,
    z²/4=0.9604) are double literals in identical left-to-right
    arithmetic on both engines; one combinable aggregation."""
    d = t(spark, sf_dir, "documents")
    agg = (d.select("source",
                    F.when(F.col("n_chars").between(200, 2000), 1)
                    .otherwise(0).alias("keep"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.sum("keep").cast("double").alias("k")))
    p = F.col("k") / F.col("n")
    n = F.col("n")
    half = F.expr("1.96e0") * F.sqrt(
        p * (F.expr("1.0e0") - p) / n + F.expr("0.9604e0") / (n * n))
    denom = F.expr("1.0e0") + F.expr("3.8416e0") / n
    center = p + F.expr("1.9208e0") / n
    return agg.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("k").cast("bigint").alias("n_keep"),
        F.round(p, 9).alias("keep_rate"),
        F.round((center - half) / denom, 9).alias("wilson_low"),
        F.round((center + half) / denom, 9).alias("wilson_high"))


# ---------------------------------------------------------------------------
# referential-integrity-preserving PII pseudonymization
# ---------------------------------------------------------------------------

def _pseudo_sql() -> str:
    from arangodb_java_parquet_spark.operators.curation import PII_EMAIL
    return f"""
WITH aug AS (
  SELECT doc_id,
         left(text, 40) || ' contact user' ||
         CAST(doc_id % 50 AS VARCHAR) || '@example.com now' AS txt
  FROM documents
),
extracted AS (
  SELECT doc_id, txt,
         regexp_extract_all(txt, '{PII_EMAIL}') AS emails
  FROM aug
)
SELECT doc_id,
       len(emails) AS n_emails,
       list_reduce(
         list_prepend(txt, emails),
         (acc, e) -> replace(acc, e,
                             'user_' || substring(md5(lower(e)), 1, 10)))
         AS pseudonymized
FROM extracted
"""


@query("pii_pseudonymize", _pseudo_sql())
def pii_pseudonymize(spark, sf_dir):
    """PII PSEUDONYMIZATION (vs pii_redaction's blanket scrub): every
    email is replaced by a STABLE md5-derived handle, so the same address
    maps to the same token across all documents — joins, dedup and
    user-level analyses survive anonymization (emails here are
    deliberately shared across docs via doc_id % 50 to exercise that;
    the handle-stability property is pinned in tests/test_curation.py).
    The per-match computed replacement that regexp_replace cannot express
    folds as a JVM higher-order aggregate over the extracted matches —
    no python, no explode, one scan."""
    from arangodb_java_parquet_spark.operators.curation import PII_EMAIL
    d = t(spark, sf_dir, "documents")
    aug = F.concat(
        F.expr("left(text, 40)"), F.lit(" contact user"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("@example.com now"))
    pat = PII_EMAIL.replace("\\", "\\\\")
    return (d.select("doc_id", aug.alias("txt"))
            .withColumn("emails",
                        F.expr(f"regexp_extract_all(txt, '{pat}', 0)"))
            .select("doc_id",
                    F.size("emails").alias("n_emails"),
                    F.expr(
                        "aggregate(emails, txt, (acc, e) -> replace(acc, e,"
                        " concat('user_', substring(md5(lower(e)), 1, 10))))"
                    ).alias("pseudonymized")))


# ---------------------------------------------------------------------------
# dataset datasheet (the one-row artifact published with a corpus)
# ---------------------------------------------------------------------------

_DATASHEET_SQL = """
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
         length(text) AS n_chars
  FROM documents
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_toks), 9)
           AS chars_per_token
  FROM toks
),
langs AS (
  SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         ROUND(0.0e0 - CAST(SUM(CAST(ROUND(
             (c / tot) * ln(c / tot), 9) AS DECIMAL(20,9))) AS DOUBLE), 9)
           AS lang_entropy
  FROM (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS c,
               CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS tot
        FROM documents GROUP BY lang)
),
dups AS (
  SELECT ROUND(1.0e0 - CAST(COUNT(DISTINCT md5(lower(replace(text, ' ',
                                                             '')))) AS
                            DOUBLE) / COUNT(*), 9) AS exact_dup_rate
  FROM documents
),
sources AS (
  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(MAX(c) AS BIGINT) AS largest_source_docs
  FROM (SELECT source, COUNT(*) AS c FROM documents GROUP BY source)
)
SELECT base.*, langs.*, dups.*, sources.*
FROM base CROSS JOIN langs CROSS JOIN dups CROSS JOIN sources
"""


@query("dataset_datasheet", _DATASHEET_SQL)
def dataset_datasheet(spark, sf_dir):
    """The DATASHEET row a corpus ships with (Gebru et al.'s datasheets,
    distilled to the quantitative core): volume (docs/tokens/chars),
    tokenizer fertility (chars per token), language count and
    distribution entropy, exact-duplicate rate, and source
    concentration — every number from the same checked primitives the
    pipeline uses (decimal-exact sums, round-9 entropies, md5
    fingerprints). One pass over documents plus three combinable
    rollups; the row is the artifact you diff between snapshots."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.size(F.split("text", " ")).alias("n_toks"),
        F.length("text").alias("n_chars"))
    base = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.round(F.sum("n_chars").cast("double") / F.sum("n_toks"), 9)
        .alias("chars_per_token"))
    lc = (d.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("c"))
          .withColumn("tot", F.sum("c").over(W.partitionBy())))
    langs = lc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.round(F.lit(0.0) - F.sum(
            F.round((F.col("c") / F.col("tot"))
                    * F.log(F.col("c") / F.col("tot")), 9)
            .cast("decimal(20,9)")).cast("double"), 9)
        .alias("lang_entropy"))
    fp = F.md5(F.lower(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
    dups = d.agg(
        F.round(F.lit(1.0) - F.countDistinct(fp).cast("double")
                / F.count(F.lit(1)), 9).alias("exact_dup_rate"))
    srcs = (d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"),
                 F.max("c").cast("bigint").alias("largest_source_docs")))
    return (base.crossJoin(langs).crossJoin(dups).crossJoin(srcs))


# ---------------------------------------------------------------------------
# DoReMi-style one-step domain reweighting
# ---------------------------------------------------------------------------

_DRM_ETA = 2.0
_DRM_MIN_CHARS = 200


@query("mixture_doremi_step", f"""
WITH per AS (
  SELECT source, COUNT(*) AS n,
         SUM(CASE WHEN n_chars >= {_DRM_MIN_CHARS} THEN 1 ELSE 0 END)
           AS n_keep
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS tn,
               CAST(SUM(n_keep) AS DOUBLE) AS tk FROM per),
scored AS (
  SELECT source, n, n / t.tn AS w0,
         (CAST(n_keep AS DOUBLE) / n) - (t.tk / t.tn) AS excess,
         ROUND(exp({_DRM_ETA} * ((CAST(n_keep AS DOUBLE) / n)
                                 - (t.tk / t.tn))), 9) AS boost
  FROM per CROSS JOIN tot t
),
z AS (SELECT CAST(SUM(CAST(ROUND(w0 * boost, 9) AS DECIMAL(20,9)))
              AS DOUBLE) AS z FROM scored)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       ROUND(w0, 9) AS natural_share,
       ROUND(excess, 9) AS excess_keep_rate,
       ROUND(w0 * boost / z.z, 9) AS reweighted_share
FROM scored CROSS JOIN z
""")
def mixture_doremi_step(spark, sf_dir):
    """DOREMI-STYLE domain reweighting, one multiplicative-weights step
    (Xie et al. 2023's update shape): each source's weight is its natural
    share boosted by exp(eta x excess reward) — here the reward proxy is
    the source's quality-gate keep-rate vs the corpus baseline (swap in
    per-domain excess loss when a proxy model exists) — then renormalized.
    Up-weights domains that over-perform the baseline, the data-mixture
    counterpart of mixture_rebalance_rates' uniform target. Determinism:
    exp() outputs are round-9 fenced (engines differ in the last ulp),
    the normalizer is an exact decimal sum of the fenced products, and
    every published ratio is round-9. Two combinable aggregations +
    1-row broadcasts — trivially 100 TB-safe."""
    d = t(spark, sf_dir, "documents")
    per = (d.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("n_chars") >= _DRM_MIN_CHARS, 1)
                      .otherwise(0)).alias("n_keep")))
    tot = per.agg(F.sum("n").cast("double").alias("tn"),
                  F.sum("n_keep").cast("double").alias("tk"))
    excess = (F.col("n_keep").cast("double") / F.col("n")
              - F.col("tk") / F.col("tn"))
    scored = (per.crossJoin(F.broadcast(tot))
              .select("source", "n",
                      (F.col("n") / F.col("tn")).alias("w0"),
                      excess.alias("excess"),
                      F.round(F.exp(_DRM_ETA * excess), 9).alias("boost")))
    z = scored.agg(F.sum(F.round(F.col("w0") * F.col("boost"), 9)
                         .cast("decimal(20,9)")).cast("double").alias("z"))
    return (scored.crossJoin(F.broadcast(z))
            .select("source", F.col("n").cast("bigint").alias("n_docs"),
                    F.round(F.col("w0"), 9).alias("natural_share"),
                    F.round(F.col("excess"), 9).alias("excess_keep_rate"),
                    F.round(F.col("w0") * F.col("boost") / F.col("z"), 9)
                    .alias("reweighted_share")))


# ---------------------------------------------------------------------------
# per-cluster quality spread over the materialized component table
# ---------------------------------------------------------------------------

_SPREAD_SQL = _must_replace(
    _CLUSTER_SQL,
    "SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src",
    """, comp AS (
  SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src
)
SELECT c.component,
       COUNT(*) AS cluster_size,
       MIN(d.n_chars) AS min_chars,
       MAX(d.n_chars) AS max_chars,
       CAST(SUM(CAST(d.n_chars AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*)
         AS mean_chars,
       ROUND((MAX(d.n_chars) - MIN(d.n_chars))
             / CAST(MAX(d.n_chars) AS DOUBLE), 9) AS rel_spread
FROM comp c JOIN documents d ON d.doc_id = c.node
GROUP BY c.component
HAVING COUNT(*) >= 2""")


@query("dedup_cluster_quality_spread", _SPREAD_SQL)
def dedup_cluster_quality_spread(spark, sf_dir):
    """QUALITY SPREAD inside each near-duplicate cluster: min/max/mean
    document length and the relative spread — the audit behind
    dedup_keep_best_quality's policy choice (a high-spread cluster mixes
    a full original with truncated copies, exactly where best-instead-
    of-min-id pays; uniformly-sized clusters make the policy moot).
    Consumes the MATERIALIZED component table (fit-once model store);
    one join to per-doc length + one combinable rollup."""
    from arangodb_java_parquet_spark.queries.curation import (
        components_materialized)
    comp = components_materialized(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (comp.join(d, comp.node == d.doc_id)
            .groupBy("component")
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 (F.sum(F.col("n_chars").cast("decimal(30,8)"))
                  .cast("double") / F.count(F.lit(1))).alias("mean_chars"),
                 F.round((F.max("n_chars") - F.min("n_chars"))
                         / F.max("n_chars").cast("double"), 9)
                 .alias("rel_spread"))
            .filter(F.col("cluster_size") >= 2))


# ---------------------------------------------------------------------------
# DSIR-style hashed-n-gram importance weights (round 7)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_SOURCES = ("src0", "src1")  # the "benchmark-like" target domain
_DSIR_TGT_SQL = ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES)


@query("quality_dsir_weights", f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST('0x' || substring(md5(UNNEST(string_split(text, ' '))), 1, 8)
              AS BIGINT) % {_DSIR_BUCKETS} AS bucket
  FROM documents
),
raw_cnt AS (SELECT bucket, COUNT(*) AS c_raw FROM toks GROUP BY bucket),
tgt_cnt AS (SELECT bucket, COUNT(*) AS c_tgt FROM toks
            WHERE source IN ({_DSIR_TGT_SQL}) GROUP BY bucket),
totals AS (
  SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
         (SELECT COALESCE(CAST(SUM(c_tgt) AS BIGINT), 0) FROM tgt_cnt)
           AS n_tgt
  FROM raw_cnt
),
lr AS (
  SELECT r.bucket,
         ROUND(LN(((COALESCE(g.c_tgt, 0) + 1)
                   / CAST(t.n_tgt + {_DSIR_BUCKETS} AS DOUBLE))
                  / ((r.c_raw + 1)
                     / CAST(t.n_raw + {_DSIR_BUCKETS} AS DOUBLE))), 9)
           AS log_ratio
  FROM raw_cnt r LEFT JOIN tgt_cnt g USING (bucket) CROSS JOIN totals t
)
SELECT toks.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CAST(lr.log_ratio AS DECIMAL(30,9))) AS DOUBLE)
         AS log_importance
FROM toks JOIN lr USING (bucket)
GROUP BY toks.doc_id
""")
def quality_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    per-document log importance = sum over tokens of
    ln(p_target(bucket) / p_raw(bucket)) under HASHED unigram LMs — the
    data-selection scorer that upweights documents resembling a target
    (benchmark-like) domain. Hashing tokens into {_DSIR_BUCKETS} md5
    buckets bounds both model tables BY CONSTRUCTION (the lesson the
    pre-r7 tfidf broadcast missed): the log-ratio table is exactly
    {_DSIR_BUCKETS} rows, broadcast-joined to the token stream; Laplace
    (+1) smoothing keeps every ratio finite. Per-token contributions are
    round-9'd then exact-decimal summed (engine-portable float SUM)."""
    d = t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", "source",
                     F.explode(F.split("text", " ")).alias("tok"))
            .select("doc_id", "source",
                    F.pmod(F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
                           .cast("long"), _DSIR_BUCKETS).alias("bucket")))
    raw_cnt = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_cnt = (toks.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt")))
    # bucket totals as LAZY broadcast scalars (were two eager .collect()
    # jobs, each re-running the full token explode + bucket rollup as a
    # separate pass before the real one — r15). SUM over an empty target
    # slice is NULL; Laplace (+BUCKETS) already keeps the log-ratio
    # finite at n_tgt=0, so coalesce to 0 exactly as the old `or 0` did
    # (matching the oracle's NULL-free COALESCE'd denominator).
    n_raw = raw_cnt.agg(
        F.coalesce(F.sum("c_raw"), F.lit(0)).alias("__nraw"))
    n_tgt = tgt_cnt.agg(
        F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("__ntgt"))
    lr = (raw_cnt.join(tgt_cnt, "bucket", "left")
          .crossJoin(F.broadcast(n_raw)).crossJoin(F.broadcast(n_tgt))
          .select("bucket", F.round(F.log(
              ((F.coalesce(F.col("c_tgt"), F.lit(0)) + 1)
               / (F.col("__ntgt") + _DSIR_BUCKETS).cast("double"))
              / ((F.col("c_raw") + 1)
                 / (F.col("__nraw") + _DSIR_BUCKETS).cast("double"))), 9)
              .alias("log_ratio")))
    return (toks.join(F.broadcast(lr), "bucket")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.col("log_ratio").cast("decimal(30,9)"))
                 .cast("double").alias("log_importance")))


# ---------------------------------------------------------------------------
# temperature-scaled mixture sampling (round 7)
# ---------------------------------------------------------------------------

_TEMP_ALPHA_NUM = 3   # alpha = 0.3 as an exact ratio (3/10)
_TEMP_ALPHA_DEN = 10


@query("mixture_temperature_sampling", f"""
WITH src AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM src),
p AS (
  SELECT source, n_docs,
         n_docs / CAST(t.n AS DOUBLE) AS nat_share,
         ROUND(POW(n_docs / CAST(t.n AS DOUBLE),
                   CAST({_TEMP_ALPHA_NUM} AS DOUBLE)
                     / CAST({_TEMP_ALPHA_DEN} AS DOUBLE)), 9) AS p_alpha
  FROM src CROSS JOIN tot t
),
z AS (SELECT CAST(SUM(CAST(p_alpha AS DECIMAL(30,9))) AS DOUBLE) AS z FROM p)
SELECT p.source, p.n_docs, p.nat_share,
       p.p_alpha / z.z AS temp_share,
       (p.p_alpha / z.z) / p.nat_share AS boost
FROM p CROSS JOIN z
""")
def mixture_temperature_sampling(spark, sf_dir):
    """Temperature-scaled mixture sampling rates (mT5, Xue et al. 2021:
    q_i ∝ p_i^alpha with alpha=0.3): flattens the source distribution so
    low-resource domains are upsampled without letting any single giant
    domain dominate — the standard multi-domain/multilingual mixing rule.
    Natural shares are exact integer ratios; pow() outputs are round-9'd
    then exact-decimal summed for the normalizer; the final shares and
    boosts are plain IEEE divisions of already-identical doubles (the
    monthly_seasonal_index lesson: no round on derived ratios)."""
    d = t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # corpus total as a LAZY broadcast scalar (was an eager .collect()
    # that re-ran the source rollup as a separate job — r15)
    n = src.agg(F.sum("n_docs").cast("double").alias("__n"))
    alpha = F.lit(float(_TEMP_ALPHA_NUM)) / F.lit(float(_TEMP_ALPHA_DEN))
    p = src.crossJoin(F.broadcast(n)).select(
        "source", "n_docs",
        (F.col("n_docs") / F.col("__n")).alias("nat_share"),
        F.round(F.pow(F.col("n_docs") / F.col("__n"), alpha), 9)
        .alias("p_alpha"))
    z = p.agg(F.sum(F.col("p_alpha").cast("decimal(30,9)"))
              .cast("double").alias("z"))
    return (p.crossJoin(F.broadcast(z))
            .select("source", "n_docs", "nat_share",
                    (F.col("p_alpha") / F.col("z")).alias("temp_share"),
                    ((F.col("p_alpha") / F.col("z")) / F.col("nat_share"))
                    .alias("boost")))


# ---------------------------------------------------------------------------
# Luhn checksum validation scan (round 7)
# ---------------------------------------------------------------------------

@query("pii_luhn_validate", """
WITH d AS (
  SELECT o_orderkey,
         o_orderkey % 5 AS shard,
         CAST(o_custkey * 100 + o_orderkey % 100 AS VARCHAR) AS digits
  FROM orders
),
scored AS (
  SELECT o_orderkey, shard, digits,
         list_sum(list_transform(range(1, len(digits) + 1),
           i -> CASE WHEN (len(digits) - i) % 2 = 1
                     THEN (CASE WHEN CAST(digits[i] AS INT) * 2 > 9
                                THEN CAST(digits[i] AS INT) * 2 - 9
                                ELSE CAST(digits[i] AS INT) * 2 END)
                     ELSE CAST(digits[i] AS INT) END)) AS luhn_sum
  FROM d
)
SELECT shard,
       COUNT(*) AS n_ids,
       CAST(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_luhn_valid,
       ROUND(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 9) AS valid_rate
FROM scored
GROUP BY shard
""")
def pii_luhn_validate(spark, sf_dir):
    """Luhn (mod-10) checksum validation scan — the verifier behind
    credit-card / IMEI / national-id PII detectors: digit strings whose
    Luhn checksum passes are PROBABLE live identifiers (a regex alone
    over-flags random digit runs ~10x). Candidate digit strings are
    synthesized deterministically from order keys (the corpus has no real
    PANs — the checksum machinery is what's under test); a production
    scan swaps the candidate source for regexp_extract_all over text.
    The doubled-digit fold is pure integer expression work per row (no
    UDF, no shuffle beyond the final rollup)."""
    o = t(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 5).alias("shard"),
        (F.col("o_custkey") * 100 + F.col("o_orderkey") % 100)
        .cast("string").alias("digits"))
    luhn_sum = F.expr("""
      aggregate(
        transform(sequence(1, length(digits)),
          i -> CASE WHEN (length(digits) - i) % 2 = 1
                    THEN (CASE WHEN CAST(substring(digits, i, 1) AS INT) * 2 > 9
                               THEN CAST(substring(digits, i, 1) AS INT) * 2 - 9
                               ELSE CAST(substring(digits, i, 1) AS INT) * 2 END)
                    ELSE CAST(substring(digits, i, 1) AS INT) END),
        0, (acc, x) -> acc + x)""")
    scored = d.withColumn("luhn_sum", luhn_sum)
    valid = F.when(F.col("luhn_sum") % 10 == 0, 1).otherwise(0)
    return (scored.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_ids"),
                 F.sum(valid).cast("bigint").alias("n_luhn_valid"),
                 F.round(F.sum(valid) / F.count(F.lit(1)).cast("double"), 9)
                 .alias("valid_rate")))


# ---------------------------------------------------------------------------
# readability scoring (round 7)
# ---------------------------------------------------------------------------

@query("text_readability_scores", """
WITH s AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT doc_id, lang, n_words, CAST(n_syllables AS BIGINT) AS n_syllables,
       n_syllables / CAST(n_words AS DOUBLE) AS syllables_per_word,
       206.835e0 - 84.6e0 * (n_syllables / CAST(n_words AS DOUBLE))
         AS flesch_proxy
FROM s WHERE n_words > 0
""")
def text_readability_scores(spark, sf_dir):
    """Flesch-style readability proxy: syllables approximated by vowel-group
    counts (the classic heuristic), score = 206.835 - 84.6 * syllables/word
    (sentence term omitted — the corpus is unpunctuated). A standard text
    quality-filter signal (too-complex or too-degenerate docs score at the
    extremes). Pure per-row expression work: regexp_count + a division of
    exact integers; the affine transform is IEEE-identical given identical
    inputs (constants written as DOUBLE literals on both engines)."""
    d = t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    n_syll = F.expr("regexp_count(text, '[aeiouy]+')")
    spw = F.col("n_syllables") / F.col("n_words").cast("double")
    return (d.select("doc_id", "lang",
                     n_words.alias("n_words"),
                     n_syll.cast("bigint").alias("n_syllables"))
            .filter(F.col("n_words") > 0)
            .select("doc_id", "lang", "n_words", "n_syllables",
                    spw.alias("syllables_per_word"),
                    (F.lit(206.835) - F.lit(84.6) * spw)
                    .alias("flesch_proxy")))


# ---------------------------------------------------------------------------
# balanced class downsampling (round 7)
# ---------------------------------------------------------------------------

@query("sample_balanced_downsample", """
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
),
floor_n AS (SELECT MIN(n) AS n_min FROM counts),
ranked AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang, r.source
FROM ranked r CROSS JOIN floor_n f
WHERE r.rn <= f.n_min
""")
def sample_balanced_downsample(spark, sf_dir):
    """BALANCED class downsampling: every language keeps exactly
    n_min = |smallest class| documents, selected by deterministic
    md5-rank (doc_id tiebreak) — the classic majority-downsample for
    training-set class balance, reproducible bit-for-bit on any engine
    or layout (unlike seeded RNG sampling). One combinable count, a
    1-row broadcast floor, and a per-class md5 rank window."""
    d = t(spark, sf_dir, "documents")
    n_min = (d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
             .agg(F.min("n").alias("n_min")))
    rw = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (d.select("doc_id", "lang", "source")
            .withColumn("rn", F.row_number().over(rw))
            .crossJoin(F.broadcast(n_min))
            .filter(F.col("rn") <= F.col("n_min"))
            .select("doc_id", "lang", "source"))


# ---------------------------------------------------------------------------
# leakage-safe train/test split over duplicate clusters (round 9)
# ---------------------------------------------------------------------------

# Test split = md5 hex < '20' (lexicographic on lowercase hex: prefixes
# '0'/'1' => exactly 2/16 = 12.5%), applied to the doc id (naive) vs the
# duplicate-cluster representative (leakage-safe).
_SPLIT_SQL = _must_replace(
    _CLUSTER_SQL,
    "SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src",
    """, comp AS (
  SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src
),
full_docs AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
flags AS (
  SELECT doc_id, component,
         CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '20'
              THEN 1 ELSE 0 END AS nt,
         CASE WHEN md5(CAST(component AS VARCHAR)) < '20'
              THEN 1 ELSE 0 END AS st
  FROM full_docs
),
clust AS (
  SELECT component, COUNT(*) AS n, CAST(SUM(nt) AS BIGINT) AS n_nt
  FROM flags GROUP BY component
),
docstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nt) AS BIGINT) AS naive_test_docs,
         CAST(SUM(st) AS BIGINT) AS safe_test_docs,
         CAST(SUM(CASE WHEN nt <> st THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_moved
  FROM flags
),
cstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(CASE WHEN n_nt > 0 AND n_nt < n THEN 1 ELSE 0 END)
              AS BIGINT) AS leaky_clusters,
         CAST(SUM(CASE WHEN n_nt > 0 AND n_nt < n THEN n ELSE 0 END)
              AS BIGINT) AS docs_in_leaky
  FROM clust
)
SELECT * FROM docstats CROSS JOIN cstats""")


@query("split_leakage_safe_report", _SPLIT_SQL)
def split_leakage_safe_report(spark, sf_dir):
    """Leakage-safe train/test split audit: a naive per-document hash
    split puts near-duplicate copies of the same content on BOTH sides
    (train/test contamination — the held-out metric silently becomes a
    memorization probe). The safe policy hashes the duplicate-CLUSTER
    representative so whole clusters move together. This entry
    quantifies the difference on the LSH component table: how many
    clusters straddle the naive split (leaky), how many documents sit in
    them, and how many documents the safe policy reassigns.

    Pure integer arithmetic end to end (md5-prefix splits, counts) — no
    float determinism surface at all. Scale: consumes the MATERIALIZED
    component table (fit-once model store), one left join on doc_id and
    two combinable aggregations; nothing touches text."""
    from arangodb_java_parquet_spark.queries.curation import (
        components_materialized)
    comp = components_materialized(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id")
    full_docs = (d.join(comp, d["doc_id"] == comp["node"], "left")
                 .select("doc_id",
                         F.coalesce("component", "doc_id")
                         .alias("component")))
    flags = full_docs.select(
        "doc_id", "component",
        F.when(F.md5(F.col("doc_id").cast("string")) < "20", 1)
        .otherwise(0).alias("nt"),
        F.when(F.md5(F.col("component").cast("string")) < "20", 1)
        .otherwise(0).alias("st"))
    clust = flags.groupBy("component").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nt").cast("bigint").alias("n_nt"))
    leaky = (F.col("n_nt") > 0) & (F.col("n_nt") < F.col("n"))
    docstats = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("naive_test_docs"),
        F.sum("st").cast("bigint").alias("safe_test_docs"),
        F.sum(F.when(F.col("nt") != F.col("st"), 1).otherwise(0))
        .cast("bigint").alias("docs_moved"))
    cstats = clust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum(F.when(leaky, 1).otherwise(0)).cast("bigint")
        .alias("leaky_clusters"),
        F.sum(F.when(leaky, F.col("n")).otherwise(0)).cast("bigint")
        .alias("docs_in_leaky"))
    return docstats.crossJoin(F.broadcast(cstats))


# ---------------------------------------------------------------------------
# UniMax language-budget allocation (round 9)
# ---------------------------------------------------------------------------

_UNIMAX_EPOCHS = 3


@query("mixture_unimax_allocation", f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS budget,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM counts
),
wtab AS (
  SELECT lang, n_docs, {_UNIMAX_EPOCHS} * n_docs AS cap, budget, n_langs,
         ROW_NUMBER() OVER (ORDER BY {_UNIMAX_EPOCHS} * n_docs, lang) AS rk,
         COALESCE(SUM({_UNIMAX_EPOCHS} * n_docs)
                  OVER (ORDER BY {_UNIMAX_EPOCHS} * n_docs, lang
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cumb
  FROM counts CROSS JOIN tot
),
prov_t AS (
  SELECT lang, n_docs, cap, rk,
         (budget - cumb) / CAST(n_langs - rk + 1 AS DOUBLE) AS prov
  FROM wtab
),
th AS (
  SELECT arg_min(prov, rk) AS theta
  FROM prov_t WHERE CAST(cap AS DOUBLE) > prov
)
SELECT lang, n_docs, CAST(cap AS BIGINT) AS cap,
       CASE WHEN theta IS NULL THEN CAST(cap AS DOUBLE)
            ELSE LEAST(CAST(cap AS DOUBLE), theta) END AS allocated,
       CASE WHEN theta IS NULL THEN CAST({_UNIMAX_EPOCHS} AS DOUBLE)
            ELSE LEAST(CAST(cap AS DOUBLE), theta) / n_docs
       END AS epochs_used
FROM prov_t CROSS JOIN th
""")
def mixture_unimax_allocation(spark, sf_dir):
    """UniMax language sampling (Chung et al. 2023): allocate a total
    sample budget (here: one corpus-size worth) across languages as
    UNIFORMLY as possible subject to a per-language cap of E=3 epochs
    (_UNIMAX_EPOCHS) — the principled alternative to temperature sampling that
    never over-repeats a low-resource language. The waterline theta is
    found in CLOSED FORM with one sort + cumulative sum over the
    language table (caps ascending; the first language whose cap exceeds
    its provisional fair share (remaining budget / remaining languages)
    binds theta via arg_min(prov, rk)); alloc = min(cap, theta).

    Determinism: counts/caps are integers; theta and the allocations are
    single IEEE divisions of integer-exact operands with a (cap, lang)
    sort tiebreak. Scale: the window runs over the LANGUAGE dimension
    (bounded, report-sized), never documents — the doc table contributes
    one combinable count."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("bigint").alias("budget"),
                     F.count(F.lit(1)).cast("bigint").alias("n_langs"))
    j = (counts.crossJoin(F.broadcast(tot))
         .withColumn("cap", F.lit(_UNIMAX_EPOCHS) * F.col("n_docs")))
    w = W.orderBy("cap", "lang")
    wtab = (j.withColumn("rk", F.row_number().over(w))
            .withColumn("cumb", F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0))))
    prov_t = wtab.select(
        "lang", "n_docs", "cap", "rk",
        ((F.col("budget") - F.col("cumb"))
         / (F.col("n_langs") - F.col("rk") + 1).cast("double"))
        .alias("prov"))
    th = (prov_t.filter(F.col("cap").cast("double") > F.col("prov"))
          .agg(F.min_by("prov", "rk").alias("theta")))
    alloc = F.when(F.col("theta").isNull(), F.col("cap").cast("double")) \
        .otherwise(F.least(F.col("cap").cast("double"), F.col("theta")))
    return (prov_t.crossJoin(F.broadcast(th))
            .select("lang", "n_docs", F.col("cap").cast("bigint").alias("cap"),
                    alloc.alias("allocated"),
                    F.when(F.col("theta").isNull(),
                           F.lit(_UNIMAX_EPOCHS).cast("double"))
                    .otherwise(F.least(F.col("cap").cast("double"),
                                       F.col("theta")) / F.col("n_docs"))
                    .alias("epochs_used")))


@query("split_temporal_holdout", """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
ranked AS (
  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS nd
  FROM days
),
cutoff AS (
  SELECT day AS cut, nd FROM ranked WHERE rn = (7 * nd + 9) // 10
),
lab AS (
  SELECT e.user_id,
         CASE WHEN CAST(e.ts AS DATE) <= c.cut THEN 1 ELSE 0 END AS is_tr
  FROM events e CROSS JOIN cutoff c
),
ev AS (
  SELECT CAST(SUM(is_tr) AS BIGINT) AS n_train_events,
         CAST(SUM(1 - is_tr) AS BIGINT) AS n_test_events
  FROM lab
),
us AS (
  SELECT CAST(COUNT(*) FILTER (WHERE tr > 0) AS BIGINT) AS n_train_users,
         CAST(COUNT(*) FILTER (WHERE te > 0) AS BIGINT) AS n_test_users,
         CAST(COUNT(*) FILTER (WHERE tr > 0 AND te > 0) AS BIGINT)
           AS n_overlap_users
  FROM (SELECT user_id, SUM(is_tr) AS tr, SUM(1 - is_tr) AS te
        FROM lab GROUP BY user_id)
)
SELECT c.cut AS cutoff_day, CAST(c.nd AS BIGINT) AS n_days,
       ev.n_train_events, ev.n_test_events,
       us.n_train_users, us.n_test_users, us.n_overlap_users,
       us.n_overlap_users / CAST(NULLIF(us.n_test_users, 0) AS DOUBLE)
         AS user_overlap_ratio
FROM cutoff c CROSS JOIN ev CROSS JOIN us
""")
def split_temporal_holdout(spark, sf_dir):
    """TEMPORAL HOLDOUT split audit — the time-based counterpart of the
    hash split (train_test_split_hash) and the cluster-safe split
    (split_leakage_safe_report): train = everything up to the 70th-
    percentile day (rank ceil(0.7·n_days) over DISTINCT days, computed
    with integer arithmetic (7n+9)//10 so both engines pick the
    identical cutoff), test = strictly after. Reports the split sizes
    and the USER overlap between sides — the quantity that decides
    whether the eval measures generalization to new time (users shared,
    expected) or must be re-split per-user (overlap ≈ 1 means every
    test user was trained on). One distinct-days window (days are
    report-sized at any scale) + one combinable per-user aggregation.
    """
    e = t(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("day")).distinct()
    ranked = days.select(
        "day", F.row_number().over(W.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nd"))
    cutoff = (ranked.filter(
        F.col("rn") == F.expr("(7 * nd + 9) div 10"))
        .select(F.col("day").alias("cut"), "nd")
        .transform(materialize))  # 1 row, 2 consumers
    lab = (e.crossJoin(F.broadcast(cutoff.select("cut")))
           .select("user_id",
                   F.when(F.to_date("ts") <= F.col("cut"), 1).otherwise(0)
                   .alias("is_tr"))
           .transform(materialize))  # feeds event + user rollups
    ev = lab.agg(
        F.sum("is_tr").cast("bigint").alias("n_train_events"),
        F.sum(1 - F.col("is_tr")).cast("bigint").alias("n_test_events"))
    per_user = (lab.groupBy("user_id")
                .agg(F.sum("is_tr").alias("tr"),
                     F.sum(1 - F.col("is_tr")).alias("te")))
    us = per_user.agg(
        F.sum(F.when(F.col("tr") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_train_users"),
        F.sum(F.when(F.col("te") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_test_users"),
        F.sum(F.when((F.col("tr") > 0) & (F.col("te") > 0), 1)
              .otherwise(0)).cast("bigint").alias("n_overlap_users"))
    return (cutoff.select(F.col("cut").alias("cutoff_day"),
                          F.col("nd").cast("bigint").alias("n_days"))
            .crossJoin(ev).crossJoin(us)
            .withColumn("user_overlap_ratio",
                        F.col("n_overlap_users")
                        / F.nullif(F.col("n_test_users"), F.lit(0))
                        .cast("double")))


_NEYMAN_BUDGET = 1000


@query("sample_neyman_allocation", f"""
WITH m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(n_chars) / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM documents GROUP BY source
),
v AS (
  SELECT d.source, MAX(m.n_docs) AS n_docs,
         sqrt(CAST(SUM(CAST(ROUND((d.n_chars - m.mu) * (d.n_chars - m.mu),
                                  6) AS DECIMAL(30,6))) AS DOUBLE)
              / MAX(m.n_docs)) AS sigma
  FROM documents d JOIN m ON m.source = d.source
  GROUP BY d.source
),
tot AS (
  SELECT CAST(SUM(CAST(ROUND(n_docs * sigma, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS t
  FROM v
)
SELECT v.source, v.n_docs, ROUND(v.sigma, 9) AS sigma,
       ROUND(v.n_docs * v.sigma, 9) / NULLIF(tot.t, 0) AS weight,
       {_NEYMAN_BUDGET} * (ROUND(v.n_docs * v.sigma, 9) / NULLIF(tot.t, 0))
         AS allocation
FROM v CROSS JOIN tot
""")
def sample_neyman_allocation(spark, sf_dir):
    """NEYMAN OPTIMAL ALLOCATION for stratified sampling (Neyman 1934):
    given a labeling/eval budget of 1000 documents (_NEYMAN_BUDGET),
    allocate
    n_h ∝ N_h·σ_h per source — variance-heterogeneous strata get more
    budget than proportional allocation gives, minimizing the estimator
    variance for a fixed cost. This is the design step BEFORE the
    deterministic samplers (sample_stratified_hash draws the rows; this
    decides how many per stratum). σ_h is a two-pass population std of
    the document-length signal (exact integer mean, round-6 squared
    deviations — n_chars² fits the round-6 magnitude ceiling — exact
    decimal sum); N_h·σ_h products round-9 before the exact total.
    Two combinable passes; the report is |sources| rows.
    """
    d = t(spark, sf_dir, "documents")
    m = (d.groupBy("source")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
              (F.sum("n_chars") / F.count(F.lit(1)).cast("double"))
              .alias("mu")))
    v = (d.join(F.broadcast(m), "source")
         .groupBy("source")
         .agg(F.max("n_docs").alias("n_docs"),
              F.sqrt(F.sum(F.round((F.col("n_chars") - F.col("mu"))
                                   * (F.col("n_chars") - F.col("mu")), 6)
                           .cast("decimal(30,6)")).cast("double")
                     / F.max("n_docs")).alias("sigma"))
         .transform(materialize))  # feeds total + report
    tot = v.agg(F.sum(F.round(F.col("n_docs") * F.col("sigma"), 9)
                      .cast("decimal(30,9)")).cast("double").alias("t"))
    w = (F.round(F.col("n_docs") * F.col("sigma"), 9)
         / F.nullif(F.col("t"), F.lit(0.0)))
    return (v.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.round("sigma", 9).alias("sigma"),
                    w.alias("weight"),
                    (F.lit(_NEYMAN_BUDGET) * w).alias("allocation")))


# ---------------------------------------------------------------------------
# deterministic weighted sampling without replacement (round 11)
# ---------------------------------------------------------------------------

_ARES_K = 50
_ARES_SCALE = 1152921504606846976  # 2^60, exact in double


@query("sample_weighted_ares", f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ROUND(ln(CAST(CAST('0x' ||
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS DOUBLE) / {_ARES_SCALE})
               / n_chars, 9) AS ares_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, ares_key,
       CAST(ROW_NUMBER() OVER (ORDER BY ares_key DESC, doc_id ASC)
            AS BIGINT) AS draw_rank
FROM keyed
ORDER BY ares_key DESC, doc_id ASC
LIMIT {_ARES_K}
""")
def sample_weighted_ares(spark, sf_dir):
    """WEIGHTED sampling without replacement, deterministic (Efraimidis
    & Spirakis 2006, A-Res): each item draws u ~ U(0,1) and the k
    largest u^(1/w) win — equivalently the k largest ln(u)/w, the
    numerically-stable form used here. Inclusion probabilities are
    proportional to weight (document length), the property plain
    uniform samplers (sample_stratified_hash) lack, and the one you
    want when a labeling budget should cover TOKENS, not documents.
    u is md5-derived (60-bit integer / exact 2^60), so the draw is
    reproducible run-to-run, shard-independent, and cross-engine: the
    only library call is ln(), whose 1-ulp engine variance is fenced by
    round-9 on the final key (the repo's standard ln() treatment);
    doc_id breaks exact key ties.

    Scale: keys are per-row expressions (no state), and the top-k is a
    distributed TakeOrdered — per-partition k-selection then a k-way
    merge, never a global sort. Reservoir semantics at 100 TB: each
    shard keeps its own k largest keys; merging reservoirs re-takes the
    top k, exactly what this plan does."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("bigint").cast("double")
         / F.lit(_ARES_SCALE))
    keyed = d.select("doc_id",
                     F.col("n_chars").cast("bigint").alias("weight"),
                     F.round(F.log(u) / F.col("n_chars"), 9)
                     .alias("ares_key"))
    topk = (keyed.orderBy(F.desc("ares_key"), F.asc("doc_id"))
            .limit(_ARES_K))
    w = W.orderBy(F.desc("ares_key"), F.asc("doc_id"))
    return topk.withColumn(
        "draw_rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# data-constrained scaling: the value of repeating deduplicated data
# (round 11)
# ---------------------------------------------------------------------------

_DC_EPOCHS = [1, 2, 4, 8, 16]
# R* = 15.39 — the fitted repetition half-life from Muennighoff et al.
# 2023 ("Scaling Data-Constrained Language Models", eq. 6), carried as
# the integer ratio 1539/100 so both engines derive the identical double
_DC_RSTAR_NUM, _DC_RSTAR_DEN = 1539, 100


@query("mixture_data_constrained_epochs", f"""
WITH u AS (
  SELECT source, CAST(SUM(tok1) AS BIGINT) AS unique_tokens
  FROM (SELECT source, md5(text) AS fp,
               MIN(len(string_split(text, ' '))) AS tok1
        FROM documents GROUP BY source, md5(text))
  GROUP BY source
),
e AS (SELECT UNNEST([{', '.join(str(x) for x in _DC_EPOCHS)}]) AS epochs)
SELECT u.source, u.unique_tokens, CAST(e.epochs AS BIGINT) AS epochs,
       CAST(u.unique_tokens AS DOUBLE)
         + CAST(u.unique_tokens AS DOUBLE)
           * (CAST({_DC_RSTAR_NUM} AS DOUBLE) / {_DC_RSTAR_DEN})
           * (1 - ROUND(exp(-(CAST({_DC_RSTAR_DEN} AS DOUBLE)
                              * (e.epochs - 1)) / {_DC_RSTAR_NUM}), 9))
         AS effective_tokens,
       (CAST(u.unique_tokens AS DOUBLE)
         + CAST(u.unique_tokens AS DOUBLE)
           * (CAST({_DC_RSTAR_NUM} AS DOUBLE) / {_DC_RSTAR_DEN})
           * (1 - ROUND(exp(-(CAST({_DC_RSTAR_DEN} AS DOUBLE)
                              * (e.epochs - 1)) / {_DC_RSTAR_NUM}), 9)))
         / (CAST(u.unique_tokens AS DOUBLE) * e.epochs)
         AS token_efficiency
FROM u CROSS JOIN e
""")
def mixture_data_constrained_epochs(spark, sf_dir):
    """DATA-CONSTRAINED SCALING epoch planner (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): after dedup bounds each
    source's UNIQUE token supply, how much is an extra epoch of
    repetition worth? The paper's fitted decay gives effective tokens
    D' = U + U·R*·(1 - exp(-R/R*)) for R = epochs-1 repetitions with
    R* = 15.39: ~2-4 epochs are nearly free, value decays exponentially,
    and beyond ~16 epochs repetition adds almost nothing — the table a
    mixture planner consults when a source is too small for its target
    weight (pairs with mixture_unimax_allocation's epoch caps and the
    dedup_roi_report). Unique supply per source counts each distinct
    document text (md5 fingerprint) once.

    Determinism: R*/R ratios derive from the integer pair 1539/100
    identically per engine; exp() inputs are exact doubles and the
    output is round-9 fenced (the r10-piloted exp treatment); every
    later op is an IEEE-identical product/division — no decimal sums
    needed since nothing re-aggregates after the fence. Scale: one
    (source, fingerprint) aggregation — the dedup pass the pipeline
    already runs — then a |sources|×|epoch grid| projection."""
    d = t(spark, sf_dir, "documents")
    u = (d.groupBy("source", F.md5("text").alias("fp"))
         .agg(F.min(F.size(F.split("text", " "))).alias("tok1"))
         .groupBy("source")
         .agg(F.sum("tok1").cast("bigint").alias("unique_tokens")))
    e = (F.explode(F.array(*[F.lit(x) for x in _DC_EPOCHS]))
         .alias("epochs"))
    rstar = (F.lit(_DC_RSTAR_NUM).cast("double") / F.lit(_DC_RSTAR_DEN))
    decay = F.round(F.exp(-(F.lit(_DC_RSTAR_DEN).cast("double")
                            * (F.col("epochs") - 1))
                          / F.lit(_DC_RSTAR_NUM)), 9)
    eff = (F.col("unique_tokens").cast("double")
           + F.col("unique_tokens").cast("double") * rstar * (1 - decay))
    return (u.select("source", "unique_tokens", e)
            .select("source", "unique_tokens",
                    F.col("epochs").cast("bigint").alias("epochs"),
                    eff.alias("effective_tokens"),
                    (eff / (F.col("unique_tokens").cast("double")
                            * F.col("epochs"))).alias("token_efficiency")))
