"""Compression-ratio quality signal — the LZ78 leg of the text-quality
family (beside the Gopher/C4 rule gates, repetition signals and the
n-gram LM perplexity buckets in `queries/curation.py`).

Real-world shape: production corpus filters (Dolma, RedPajama-v2,
CCNet descendants) carry a "compression ratio" signal — highly
compressible text is boilerplate/templated/repetitive and gets
down-weighted. gzip is not cross-engine reproducible, so the signal
here is the CLASSIC LZ78 PARSE (Ziv & Lempel 1978) over the token
stream: the number of distinct phrases the incremental dictionary
parse emits. phrases/tokens → 1 for incompressible text and → 0 as
repetition grows (it is also the plug-in estimator of the source
entropy rate, Wyner & Ziv 1989 — c(n)·log c(n)/n → H).

Implementation: one sequential fold per document (Spark `F.aggregate`
HOF vs DuckDB `list_reduce`), accumulator = a VARCHAR list whose FIRST
element is the current phrase-in-progress w and whose tail is the
emitted-phrase dictionary; per token c: if w+c is already a phrase,
extend w; else emit w+c and reset. Phrases are space-joined token
sequences (tokens are space-split, so the joiner cannot collide).
DuckDB's list_reduce has no initial-value argument and its accumulator
must have the ELEMENT type — so the token list is lifted to a
list-of-singleton-lists with the seed [''] prepended (the
forecast_holt_linear DOUBLE-list pattern, VARCHAR[] here; list
accumulators are rebuilt per step, so the in-place struct-update
divergence cannot apply).

Determinism: phrase counts and token counts are integers (exact);
per-source phrase_rate is a BIGINT/BIGINT plain division
(IEEE-identical, emitted unrounded). The doc-level mean is taken in
LOG space: raw ratios p/n are TERMINATING decimals (n is often
2^a·5^b) that can land exactly on a round-9 half-way point where
Spark (HALF_UP) and DuckDB (rint) disagree — observed at gate time —
while ln outputs are non-terminating, so round-9 → DECIMAL(30,9) sum
(scale 9: a scale-8 cast would re-round the 9th digit at ANOTHER
half-way boundary, also observed) → unrounded exact-sum/count average.

Scale: the fold is per-row map-side work (O(len·phrases) on ≤ a few
hundred tokens per doc — bounded by the chunking contract upstream);
the only shuffle is the 20-row source rollup. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    dsum, query, sql_dsum, t)

_LZ78_SQL = """WITH parsed AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_toks,
         list_reduce(
           list_prepend([''], list_transform(string_split(text, ' '),
                                             tk -> [tk])),
           (acc, x) -> CASE
             WHEN list_contains(acc[2:],
                    CASE WHEN acc[1] = '' THEN x[1]
                         ELSE acc[1] || ' ' || x[1] END)
             THEN list_prepend(
                    CASE WHEN acc[1] = '' THEN x[1]
                         ELSE acc[1] || ' ' || x[1] END, acc[2:])
             ELSE list_prepend(
                    '', list_append(acc[2:],
                      CASE WHEN acc[1] = '' THEN x[1]
                           ELSE acc[1] || ' ' || x[1] END))
           END) AS acc
  FROM documents
),
per_doc AS (
  SELECT doc_id, source, n_toks,
         (len(acc) - 1)
         + (CASE WHEN acc[1] = '' THEN 0 ELSE 1 END) AS n_phrases
  FROM parsed
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_phrases) AS BIGINT) AS sum_phrases,
       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_phrases) AS BIGINT) / CAST(SUM(n_toks) AS DOUBLE)
         AS phrase_rate,
       {avg_log} / COUNT(*) AS avg_log_ratio
FROM per_doc
GROUP BY source
ORDER BY source
""".format(avg_log=sql_dsum(
    "round(ln(CAST(n_phrases AS DOUBLE) / n_toks), 9)", 9))


@query("quality_lz78_compression", _LZ78_SQL)
def quality_lz78_compression(spark, sf_dir):
    """LZ78 phrase-count compression signal per source: the incremental
    dictionary parse as ONE aggregate() fold per document — map-side,
    no shuffle until the 20-row source rollup."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def step(acc, c):
        w = F.element_at(acc, 1)
        dic = F.slice(acc, 2, F.size(acc))
        cand = F.when(w == "", c).otherwise(
            F.concat(w, F.lit(" "), c))
        return (F.when(F.array_contains(dic, cand),
                       F.concat(F.array(cand), dic))
                .otherwise(F.concat(F.array(F.lit("")), dic,
                                    F.array(cand))))

    acc = F.aggregate(toks, F.array(F.lit("")), step)
    per_doc = d.select(
        "source",
        F.size(toks).alias("n_toks"),
        ((F.size(acc) - F.lit(1))
         + F.when(F.element_at(acc, 1) == "", 0).otherwise(1))
        .alias("n_phrases"))
    # per-doc ratios p/n are TERMINATING decimals (n is often 2^a*5^b)
    # that can land exactly on a round-9 half-way point, where Spark
    # (HALF_UP) and DuckDB (rint) disagree — so the doc-level average is
    # taken in LOG space (ln outputs are non-terminating; round-9 safe).
    log_ratio = F.log(F.col("n_phrases").cast("double")
                      / F.col("n_toks"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_phrases").cast("bigint").alias("sum_phrases"),
                 F.sum("n_toks").cast("bigint").alias("sum_tokens"),
                 (F.sum("n_phrases").cast("bigint")
                  / F.sum("n_toks").cast("double")).alias("phrase_rate"),
                 (dsum(F.round(log_ratio, 9), 9) / F.count(F.lit(1)))
                 .alias("avg_log_ratio"))
            .orderBy("source"))
