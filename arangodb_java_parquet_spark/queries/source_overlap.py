"""Cross-source vocabulary overlap + prevalence-stable agreement (r12p).

SOURCE VOCABULARY JACCARD: the pairwise |V_a ∩ V_b| / |V_a ∪ V_b| matrix
over the corpus's sources — the mixture-design signal that says which
sources are redundant vocabulary-wise (near-1 pairs add tokens but not
words) vs complementary (near-0 pairs are where new capability lives);
document-level containment (dedup_cross_source_containment) cannot see
this because sources can share vocabulary without sharing documents.
GWET'S AC1: the chance-corrected agreement coefficient that stays stable
when prevalence is extreme — the known kappa paradox (two gates agreeing
95% of the time can have near-zero kappa if almost everything passes);
AC1 is the statistic reviewers ask for beside kappa on skewed gates.

Determinism: vocabulary sets are DISTINCT (source, token) projections and
every overlap count is an exact integer (the pair join is bounded by
per-token source-degree <= |sources|); AC1 is a pure integer-ratio
closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# pairwise source vocabulary Jaccard
# ---------------------------------------------------------------------------

_SVJ_SQL = """
WITH st AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok
        FROM documents)
),
vs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM st GROUP BY source
),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, va.v AS vocab_a, vb.v AS vocab_b, i.n_common,
       i.n_common / CAST(va.v + vb.v - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN vs va ON va.source = i.src_a
JOIN vs vb ON vb.source = i.src_b
"""


@query("source_vocab_jaccard", _SVJ_SQL)
def source_vocab_jaccard(spark, sf_dir):
    """PAIRWISE SOURCE VOCABULARY JACCARD: |V_a ∩ V_b|/|V_a ∪ V_b| for
    every source pair — the redundancy/complementarity matrix a
    mixture designer reads before weighting sources (two sources with
    Jaccard 0.9 buy almost no new vocabulary for their token cost;
    pairs near 0 are where coverage lives), the vocabulary-level
    companion to the document-level cross-source containment entry.
    Vocabularies are DISTINCT (source, token) projections; the
    intersection join is keyed on the token (per-token source degree
    is bounded by |sources| ~ 20, so the pair expansion is at most
    df^2 <= 400 per token — never corpus-quadratic); all counts exact
    integers, Jaccard one exact-rational division."""
    d = t(spark, sf_dir, "documents")
    st = (d.select("source",
                   F.explode(F.split(F.col("text"), " ")).alias("tok"))
          .distinct()
          .transform(materialize))  # feeds sizes + both join sides
    vs = st.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v"))
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), "tok")
    inter = (a.join(b, "tok")
             .filter(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))
    va = vs.select(F.col("source").alias("src_a"),
                   F.col("v").alias("vocab_a"))
    vb = vs.select(F.col("source").alias("src_b"),
                   F.col("v").alias("vocab_b"))
    return (inter.join(F.broadcast(va), "src_a")
            .join(F.broadcast(vb), "src_b")
            .select("src_a", "src_b", "vocab_a", "vocab_b", "n_common",
                    (F.col("n_common")
                     / (F.col("vocab_a") + F.col("vocab_b")
                        - F.col("n_common")).cast("double"))
                    .alias("jaccard")))


# ---------------------------------------------------------------------------
# Gwet's AC1 between the two binary quality gates
# ---------------------------------------------------------------------------

_AC1_SQL = """
WITH g AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS r1,
         CASE WHEN len(string_split(text, ' ')) >= 60 THEN 1 ELSE 0 END
           AS r2
  FROM documents
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         CAST(SUM(r1) AS BIGINT) AS k1, CAST(SUM(r2) AS BIGINT) AS k2
  FROM g
),
p AS (
  SELECT n, agree, agree / CAST(n AS DOUBLE) AS po,
         (k1 / CAST(n AS DOUBLE) + k2 / CAST(n AS DOUBLE)) / 2 AS pi
  FROM s
)
SELECT n AS n_docs, agree AS n_agree, po AS p_observed,
       2 * pi * (1 - pi) AS pe_gwet,
       (po - 2 * pi * (1 - pi)) / NULLIF(1 - 2 * pi * (1 - pi), 0)
         AS gwets_ac1
FROM p
"""


@query("eval_gwets_ac1", _AC1_SQL)
def eval_gwets_ac1(spark, sf_dir):
    """GWET'S AC1 (Gwet 2008): the chance-corrected agreement between
    the two binary quality gates with the prevalence-STABLE chance
    model Pe = 2 pi (1 - pi), pi = mean marginal — the fix for the
    kappa paradox (when nearly all documents pass both gates, Cohen's
    kappa collapses toward 0 despite near-perfect observed agreement;
    AC1 does not), completing the agreement family beside Cohen's /
    weighted / Fleiss' kappa and Krippendorff's alpha. All counts are
    exact integers from one combinable aggregation; Po, Pe and AC1
    are straight-line exact-rational IEEE."""
    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    g = d.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("r1"),
        F.when(ntok >= 60, 1).otherwise(0).alias("r2"))
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("bigint").alias("agree"),
        F.sum("r1").cast("bigint").alias("k1"),
        F.sum("r2").cast("bigint").alias("k2"))
    po = F.col("agree") / F.col("n").cast("double")
    pi = (F.col("k1") / F.col("n").cast("double")
          + F.col("k2") / F.col("n").cast("double")) / 2
    p = s.select("n", "agree", po.alias("po"), pi.alias("pi"))
    pe = 2 * F.col("pi") * (1 - F.col("pi"))
    return p.select(
        F.col("n").alias("n_docs"), F.col("agree").alias("n_agree"),
        F.col("po").alias("p_observed"), pe.alias("pe_gwet"),
        ((F.col("po") - pe) / F.nullif(1 - pe, F.lit(0.0)))
        .alias("gwets_ac1"))
