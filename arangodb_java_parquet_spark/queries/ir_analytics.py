"""IR / corpus-statistics queries: BM25 ranking, inverted index, token
entropy, per-source KL divergence, and containment-based template
detection — the retrieval-and-diagnostics leg of the LLM data pipeline
(beyond-reference mandate; the reference loader has no analytics surface).

Determinism: every float reduction is a round-9-then-exact-decimal sum
(queries/common.py rules); scalar corpus stats (N, avgdl, n_c) are exact
integer-derived doubles, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.operators.dedup import (
    containment_pairs, spread, word_ngrams)
from arangodb_java_parquet_spark.operators.ir import (
    bm25_scores, inverted_index, source_kl_divergence, token_entropy)
from arangodb_java_parquet_spark.queries.common import query, t
from arangodb_java_parquet_spark.queries.text_pipeline import _MINHASH_SIG_SQL

_BM25_TERMS = ("spark", "query", "table")
_BM25_TERMS_SQL = ", ".join(f"'{x}'" for x in _BM25_TERMS)


@query("ir_bm25_score", f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 SUM(len(string_split(text, ' '))) AS total_len
          FROM documents),
q AS (SELECT * FROM toks WHERE tok IN ({_BM25_TERMS_SQL})),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM q GROUP BY 1, 2),
dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY 1),
idf AS (
  SELECT tok,
         LN(1.0 + (CAST(stats.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
           AS idf
  FROM dft CROSS JOIN stats
)
SELECT tf.doc_id, dl.dl,
       CAST(SUM(CAST(ROUND(
         idf.idf * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                             / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
         9) AS DECIMAL(30,9))) AS DOUBLE) AS score
FROM tf
JOIN idf USING (tok)
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN stats
GROUP BY 1, 2
""")
def ir_bm25_score(spark, sf_dir):
    """BM25 scores for a fixed 3-term query over the document corpus
    (operators/ir.py:bm25_scores). Query-term filter prunes the explode
    before any shuffle; the df/idf side is |query| rows, broadcast; the
    per-doc contribution sum is combinable. k1=1.2, b=0.75."""
    d = t(spark, sf_dir, "documents")
    return bm25_scores(d, "text", "doc_id", list(_BM25_TERMS))


@query("ir_inverted_index", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
per_doc AS (SELECT tok, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
stats AS (SELECT tok, COUNT(*) AS df, SUM(tf) AS cf
          FROM per_doc GROUP BY 1),
capped AS (
  SELECT tok, doc_id,
         ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
  FROM per_doc
),
postings AS (
  SELECT tok,
         array_to_string(list_transform(list_sort(list(doc_id)),
                                        x -> CAST(x AS VARCHAR)), ',')
           AS postings
  FROM capped WHERE rn <= 10 GROUP BY tok
)
SELECT stats.tok, stats.df, CAST(stats.cf AS BIGINT) AS cf, postings.postings
FROM stats JOIN postings USING (tok)
""")
def ir_inverted_index(spark, sf_dir):
    """Inverted index with capped sorted posting lists
    (operators/ir.py:inverted_index): df/cf are combinable aggregations;
    the posting list is capped to 10 ids BEFORE collect_list (two-phase
    row_number over distinct (tok, doc) pairs), so hot tokens like 'the'
    never materialize a corpus-sized array. The posting list is emitted
    comma-joined: the external driver's pandas canonicalizer cannot hash
    top-level ARRAY columns (registry-wide guard in tests/test_registry.py)."""
    d = t(spark, sf_dir, "documents")
    idx = inverted_index(d, "text", "doc_id", posting_cap=10)
    return idx.select(
        "tok", "df", "cf",
        F.array_join(F.col("postings").cast("array<string>"), ",")
        .alias("postings"))


@query("text_token_entropy", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM tf GROUP BY 1)
SELECT doc_id, n_tokens, n_distinct,
       CAST(SUM(CAST(ROUND(
         (-(tf / CAST(n_tokens AS DOUBLE)))
           * LN(tf / CAST(n_tokens AS DOUBLE)),
         9) AS DECIMAL(30,9))) AS DOUBLE) AS entropy
FROM tf JOIN n USING (doc_id)
GROUP BY 1, 2, 3
""")
def text_token_entropy(spark, sf_dir):
    """Per-document unigram token entropy (operators/ir.py:token_entropy)
    — a repetitiveness quality signal: template/boilerplate pages score
    low. Pure per-document map-reduce, no corpus-wide state."""
    d = t(spark, sf_dir, "documents")
    return token_entropy(d, "text", "doc_id")


@query("mixture_kl_divergence", """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
src_tf AS (SELECT source, tok, COUNT(*) AS tf_s FROM toks GROUP BY 1, 2),
src_n AS (SELECT source, CAST(SUM(tf_s) AS BIGINT) AS n_s
          FROM src_tf GROUP BY 1),
corpus AS (SELECT tok, CAST(SUM(tf_s) AS BIGINT) AS tf_c
           FROM src_tf GROUP BY 1),
nc AS (SELECT CAST(SUM(tf_c) AS BIGINT) AS n_c FROM corpus)
SELECT source, MAX(n_s) AS n_tokens,
       CAST(SUM(CAST(ROUND(
         (tf_s / CAST(n_s AS DOUBLE))
           * LN((tf_s / CAST(n_s AS DOUBLE))
                / (tf_c / CAST(n_c AS DOUBLE))),
         9) AS DECIMAL(30,9))) AS DOUBLE) AS kl
FROM src_tf
JOIN src_n USING (source)
JOIN corpus USING (tok)
CROSS JOIN nc
GROUP BY source
""")
def mixture_kl_divergence(spark, sf_dir):
    """Per-source KL divergence against the corpus unigram distribution
    (operators/ir.py:source_kl_divergence) — the mixture-drift diagnostic
    for multi-source corpora. Corpus distribution is vocabulary-sized and
    broadcast."""
    d = t(spark, sf_dir, "documents")
    return source_kl_divergence(d, "text", "doc_id", "source")


@query("dedup_containment", """
WITH grams AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id,
               UNNEST(list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
                                     i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))
               AS shingle
        FROM documents WHERE doc_id < 100)
),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_common,
       ca.n_sh AS n_a, cb.n_sh AS n_b,
       i.n_common / ca.n_sh AS cont_a,
       i.n_common / cb.n_sh AS cont_b
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
WHERE GREATEST(i.n_common / ca.n_sh, i.n_common / cb.n_sh) >= 0.08
""")
def dedup_containment(spark, sf_dir):
    """Asymmetric containment over word-3-grams on the bounded verify
    universe (operators/dedup.py:containment_pairs) — catches short
    documents embedded in longer ones that Jaccard misses."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    grams = word_ngrams(d, "text", "doc_id", n=3, do_spread=False)
    return containment_pairs(grams, "doc_id", threshold=0.08, bounded=True)


def _lm_bigrams_stored(spark, sf_dir):
    """The corpus (doc_id, bg) BIGRAM TABLE as a stored artifact — the
    shared tokenization every bigram-LM entry starts from. First consumer
    in a store's lifetime runs the tokenize+explode once and persists the
    exact (bigint, string) rows (parquet round-trips them bit-exactly);
    every later consumer — stupid-backoff scoring, Kneser-Ney scoring —
    starts from a parquet scan instead of re-exploding the corpus. The
    same fit-once/consume-later split as components_materialized; at
    100 TB this is simply 'tokenize the corpus once', which every real
    LM-scoring pipeline does before fitting anything."""
    from arangodb_java_parquet_spark.operators.models import (
        ensure_model, store_root_for)

    def fit():
        d = t(spark, sf_dir, "documents")
        arr = F.split(F.col("text"), " ")
        bigram_expr = F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2),"
            " i -> concat(split(text, ' ')[i], ' ',"
            " split(text, ' ')[i + 1]))")
        return (d.filter(F.size(arr) >= 2)
                .select("doc_id", F.explode(bigram_expr).alias("bg")))

    return ensure_model(
        spark, store_root_for(sf_dir, "documents"),
        "lm_bigrams", "corpus_bigrams", fit)


def _lm_unigrams_stored(spark, sf_dir):
    """The corpus (tok, cnt1) UNIGRAM COUNT TABLE as a stored artifact —
    the other LM base table (exact bigint counts, parquet-exact)."""
    from arangodb_java_parquet_spark.operators.models import (
        ensure_model, store_root_for)

    def fit():
        d = t(spark, sf_dir, "documents")
        return (d.select(F.explode(F.split("text", " ")).alias("tok"))
                .groupBy("tok")
                .agg(F.count(F.lit(1)).alias("cnt1")))

    return ensure_model(
        spark, store_root_for(sf_dir, "documents"),
        "lm_unigrams", "unigram_counts", fit)


@query("quality_bigram_logprob", """
WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
bigrams AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i + 1])) AS bg
  FROM arrs WHERE len(a) >= 2
),
uni AS (SELECT tok, COUNT(*) AS cnt1
        FROM (SELECT UNNEST(a) AS tok FROM arrs) GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt1) AS BIGINT) AS total FROM uni),
bi AS (SELECT bg, COUNT(*) AS cnt2 FROM bigrams GROUP BY bg),
fitted AS (
  SELECT bg, ROUND(LN(cnt2::DOUBLE / u.cnt1::DOUBLE), 9) AS logp2
  FROM bi JOIN uni u ON u.tok = string_split(bg, ' ')[1]
  WHERE cnt2 >= 2
),
back AS (
  SELECT tok AS w2,
         ROUND(LN(0.4 * (cnt1::DOUBLE / total::DOUBLE)), 9) AS logp_bo
  FROM uni CROSS JOIN tot WHERE cnt1 >= 2
),
fl AS (SELECT ROUND(LN(0.4 * (1.0 / total::DOUBLE)), 9) AS floor_logp
       FROM tot)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(COALESCE(logp2, logp_bo, floor_logp)
                     AS DECIMAL(20,9))) AS DOUBLE)
         / COUNT(*) AS avg_logprob
FROM bigrams
LEFT JOIN fitted USING (bg)
LEFT JOIN back ON back.w2 = string_split(bg, ' ')[2]
CROSS JOIN fl
GROUP BY doc_id
""")
def quality_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score with stupid backoff
    (operators/curation.py:bigram_logprob_backoff) — catches shuffled or
    templated text whose unigrams look fine but whose transitions don't.
    Both model tables are frequency-floored before broadcast (the backoff
    threshold IS the stupid-backoff definition), so the broadcast side is
    the distribution head, never the raw bigram vocabulary. Consumes the
    STORED LM base tables (_lm_bigrams_stored / _lm_unigrams_stored —
    tokenize the corpus once, shared with the Kneser-Ney entry), so this
    entry never re-explodes the corpus; values are unchanged (exact rows,
    parquet-exact round-trip) and the oracle CTE mirrors the inline
    lineage."""
    from arangodb_java_parquet_spark.operators.curation import (
        bigram_logprob_backoff)
    d = t(spark, sf_dir, "documents")
    return bigram_logprob_backoff(
        d, "text", "doc_id",
        bigrams=_lm_bigrams_stored(spark, sf_dir),
        uni=_lm_unigrams_stored(spark, sf_dir))


@query("dedup_minhash_jaccard_estimate", _MINHASH_SIG_SQL + """
, bands AS (
  SELECT doc_id, 0 AS band_idx,
         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS band_hash FROM sigs
  UNION ALL SELECT doc_id, 1,
         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       ((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END)
      + (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END)) / 8.0
         AS est_jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
""")
def dedup_minhash_jaccard_estimate(spark, sf_dir):
    """Sketch-based Jaccard ESTIMATE from MinHash signature agreement
    (fraction of equal components) for every LSH candidate pair — the
    cheap scorer between candidate generation and exact verification in
    the dedup funnel. Because the signatures are deterministic md5
    minima, the estimate itself is fully value-checkable cross-engine —
    sketch parity, not just row parity. Joins move (id, 8 hashes) rows;
    the pair table is LSH-bounded."""
    from arangodb_java_parquet_spark.operators.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_signatures)
    d = t(spark, sf_dir, "documents")
    # materialize once: pairs, sa and sb otherwise re-derive the full
    # shingle+minhash lineage per consumer (non-canonicalizing md5/HOF
    # subtrees -> no ReusedExchange; the r15 3-pass fix)
    sigs = minhash_signatures(
        char_shingles(d, "text", "doc_id", k=5, distinct=False),
        "doc_id").transform(materialize)
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    sa = sigs.select([F.col("doc_id").alias("doc_a")]
                     + [F.col(f"h{j}").alias(f"a{j}") for j in range(8)])
    sb = sigs.select([F.col("doc_id").alias("doc_b")]
                     + [F.col(f"h{j}").alias(f"b{j}") for j in range(8)])
    agree = sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
                for j in range(8))
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b",
                    (agree / F.lit(8.0)).alias("est_jaccard")))


_BLOOM_POS_SQL = ", ".join(
    f"CAST(CAST('0x' || substring(md5('{j}:' || fp), 1, 8) AS BIGINT)"
    f" AS BIGINT) % 3968" for j in range(4))


@query("dedup_bloom_prefilter", f"""
WITH fps AS (
  SELECT doc_id, source, lower(replace(text, ' ', '')) AS fp
  FROM documents
),
build_pos AS (
  SELECT UNNEST([{_BLOOM_POS_SQL}]) AS p
  FROM fps WHERE doc_id % 20 = 0
),
bloom AS (
  SELECT CAST(p // 62 AS INT) AS word_idx,
         bit_or(1::BIGINT << CAST(p % 62 AS INT)) AS word
  FROM build_pos GROUP BY 1
),
probe AS (
  SELECT doc_id, source, UNNEST([{_BLOOM_POS_SQL}]) AS p
  FROM fps
),
hits AS (
  SELECT probe.doc_id, probe.source,
         COALESCE((bloom.word & (1::BIGINT << CAST(probe.p % 62 AS INT)))
                  <> 0, FALSE) AS hit
  FROM probe LEFT JOIN bloom ON bloom.word_idx = CAST(probe.p // 62 AS INT)
),
flags AS (
  SELECT doc_id, source, bool_and(hit) AS maybe_dup
  FROM hits GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN maybe_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM flags GROUP BY source
""")
def dedup_bloom_prefilter(spark, sf_dir):
    """Bloom-filter dedup pre-screen, built as PORTABLE relational
    operators (operators/dedup.py:bloom_build/bloom_probe — Spark's
    bloom_filter_agg is optimizer-internal, not user-facing): md5-derived
    bit positions, a bit_or bitmap aggregation into 64 broadcastable
    (word_idx, word) rows, and an all-bits-set probe. At 100 TB this turns
    "anti-join everything against a reference corpus" into a broadcast
    map-side screen that passes only probable matches to the exact verify
    join — no false negatives by construction, bounded false positives
    (tests/test_curation.py pins both). Because every bit is md5-derived,
    even the sketch itself is fully value-checked cross-engine."""
    from arangodb_java_parquet_spark.operators.dedup import (
        bloom_build, bloom_probe)
    d = t(spark, sf_dir, "documents")
    fps = d.select("doc_id", "source",
                   F.lower(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                   .alias("fp"))
    bloom = bloom_build(fps.filter(F.col("doc_id") % 20 == 0), "fp")
    flagged = bloom_probe(fps, "fp", bloom)
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("maybe_dup"), 1).otherwise(0))
                 .alias("n_flagged")))


@query("text_chi2_keyness", """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, COUNT(*) AS a FROM toks GROUP BY 1, 2),
srcn AS (SELECT source, CAST(SUM(a) AS BIGINT) AS n_src FROM st GROUP BY 1),
tokn AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS n_tok FROM st GROUP BY 1),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM st),
cells AS (
  SELECT st.source, st.tok, st.a,
         n_src - st.a AS b,
         n_tok - st.a AS c,
         n - n_src - n_tok + st.a AS d,
         n
  FROM st JOIN srcn USING (source) JOIN tokn USING (tok) CROSS JOIN tot
),
scored AS (
  SELECT source, tok, a,
         ROUND((CAST(n AS DOUBLE)
                * (a * CAST(d AS DOUBLE) - b * CAST(c AS DOUBLE))
                * (a * CAST(d AS DOUBLE) - b * CAST(c AS DOUBLE)))
               / ((a + b) * CAST(a + c AS DOUBLE)
                  * (b + d) * CAST(c + d AS DOUBLE)), 9) AS chi2
  FROM cells
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY chi2 DESC, tok) AS rnk
  FROM scored
)
SELECT source, tok, a AS n_occurrences, chi2, rnk
FROM ranked WHERE rnk <= 5
""")
def text_chi2_keyness(spark, sf_dir):
    """Distinctive-vocabulary mining: per source, the top-5 tokens by
    chi-square keyness against the rest of the corpus (the 2×2
    contingency chi², the standard corpus-linguistics / feature-selection
    statistic). All four cell counts derive from THREE combinable
    aggregations (source×token, source, token) joined back — the marginal
    tables are vocabulary/source-sized and broadcast; integer counts make
    the statistic exact up to one round-9 division."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("source",
                    F.explode(F.split("text", " ")).alias("tok"))
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("a"))
    srcn = st.groupBy("source").agg(F.sum("a").alias("n_src"))
    tokn = st.groupBy("tok").agg(F.sum("a").alias("n_tok"))
    tot = st.agg(F.sum("a").alias("n"))
    cells = (st.join(F.broadcast(srcn), "source")
             .join(F.broadcast(tokn), "tok")
             .crossJoin(F.broadcast(tot))
             .select("source", "tok", "a",
                     (F.col("n_src") - F.col("a")).alias("b"),
                     (F.col("n_tok") - F.col("a")).alias("c"),
                     (F.col("n") - F.col("n_src") - F.col("n_tok")
                      + F.col("a")).alias("d"),
                     "n"))
    delta = (F.col("a") * F.col("d").cast("double")
             - F.col("b") * F.col("c").cast("double"))
    chi2 = F.round(
        (F.col("n").cast("double") * delta * delta)
        / ((F.col("a") + F.col("b"))
           * (F.col("a") + F.col("c")).cast("double")
           * (F.col("b") + F.col("d"))
           * (F.col("c") + F.col("d")).cast("double")), 9)
    w = Window.partitionBy("source").orderBy(F.desc("chi2"), "tok")
    return (cells.select("source", "tok", F.col("a").alias("n_occurrences"),
                         chi2.alias("chi2"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5))


@query("quality_perplexity_buckets", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
lp AS (
  SELECT tok, round(ln(cnt::DOUBLE / total::DOUBLE), 9) AS logp
  FROM vocab CROSS JOIN tot WHERE cnt >= 2
),
fl AS (SELECT round(ln(1.0 / total::DOUBLE), 9) AS floor_logp FROM tot),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         round(CAST(SUM(CAST(COALESCE(logp, floor_logp) AS DECIMAL(20,9)))
                    AS DOUBLE) / COUNT(*), 9) AS avg_logprob
  FROM toks LEFT JOIN lp USING (tok) CROSS JOIN fl
  GROUP BY doc_id
),
bucketed AS (
  SELECT *, NTILE(5) OVER (ORDER BY avg_logprob DESC, doc_id) AS bucket
  FROM scored
)
SELECT bucket, COUNT(*) AS n_docs,
       MIN(avg_logprob) AS lo, MAX(avg_logprob) AS hi,
       CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
FROM bucketed
GROUP BY bucket
""")
def quality_perplexity_buckets(spark, sf_dir):
    """Perplexity-quintile curation report: score every document with the
    corpus unigram LM (operators/curation.py:unigram_logprob), cut the
    corpus into 5 equal quality buckets, and report each bucket's score
    range and token mass — the table behind 'train on the top-N quality
    buckets' decisions (CCNet's quality tiers). Composition of two
    verified stages; the NTILE runs over doc-level scores (report-sized
    input per partition at this output depth — cut on approx-percentile
    boundaries instead when doc count explodes)."""
    from arangodb_java_parquet_spark.operators.curation import (
        unigram_logprob)
    d = t(spark, sf_dir, "documents")
    scored = unigram_logprob(d, "text", "doc_id")
    w = Window.orderBy(F.desc("avg_logprob"), "doc_id")
    b = scored.withColumn("bucket", F.ntile(5).over(w))
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("avg_logprob").alias("lo"),
                 F.max("avg_logprob").alias("hi"),
                 F.sum("n_tokens").alias("total_tokens")))


@query("vocab_growth_curve", """
SELECT thr.n_docs,
       COUNT(DISTINCT tok) AS vocab_size,
       COUNT(*) AS total_tokens
FROM (SELECT UNNEST([100, 200, 300, 400, 500]) AS n_docs) thr
JOIN (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents) t
  ON t.doc_id < thr.n_docs
GROUP BY thr.n_docs
""")
def vocab_growth_curve(spark, sf_dir):
    """Heaps'-law vocabulary growth curve: distinct vocabulary and token
    mass at increasing corpus prefixes — the sub-linearity diagnostic
    behind vocab-size and dedup-threshold decisions. Five threshold rows
    broadcast against the token stream (each token contributes to every
    prefix containing it); the distinct count is the only shuffle. At
    100 TB swap COUNT(DISTINCT) for mergeable HLL sketches per prefix
    (agg_hll_mergeable_sketches shows that form)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    thr = spark.range(1, 6).select((F.col("id") * 100).alias("n_docs"))
    return (toks.join(F.broadcast(thr), F.col("doc_id") < F.col("n_docs"))
            .groupBy("n_docs")
            .agg(F.countDistinct("tok").alias("vocab_size"),
                 F.count(F.lit(1)).alias("total_tokens")))


@query("dedup_cross_source_matrix", """
WITH fps AS (
  SELECT DISTINCT
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                             ' ')) AS fp,
         source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_fingerprints
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
""")
def dedup_cross_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix — corpus governance: which source
    PAIRS share bag-of-words-identical documents (vocabulary-set
    fingerprint: order-insensitive, so shuffled mirrors still match),
    the report that drives
    source-priority dedup policies (keep the canonical source, drop
    mirrors). The self-join is keyed on fingerprint, so fan-out is
    bounded by each fingerprint's distinct-source set (<= |sources|);
    shuffle moves (md5, source) pairs only."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(
        F.array_sort(F.array_distinct(F.split(F.col("text"), " "))),
        " "))
    fps = d.select(fp.alias("fp"), "source").distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.source") < F.col("b.source")))
            .groupBy(F.col("a.source").alias("source_a"),
                     F.col("b.source").alias("source_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_fingerprints")))


@query("quality_composite_gate", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM tf GROUP BY 1),
ent AS (
  SELECT doc_id, n_tokens, n_distinct,
         CAST(SUM(CAST(ROUND((-(tf / CAST(n_tokens AS DOUBLE)))
                             * LN(tf / CAST(n_tokens AS DOUBLE)), 9)
                       AS DECIMAL(30,9))) AS DOUBLE) AS entropy
  FROM tf JOIN n USING (doc_id) GROUP BY 1, 2, 3
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
lp AS (SELECT tok, round(ln(cnt::DOUBLE / total::DOUBLE), 9) AS logp
       FROM vocab CROSS JOIN tot WHERE cnt >= 2),
fl AS (SELECT round(ln(1.0 / total::DOUBLE), 9) AS floor_logp FROM tot),
lm AS (
  SELECT doc_id,
         round(CAST(SUM(CAST(COALESCE(logp, floor_logp) AS DECIMAL(20,9)))
                    AS DOUBLE) / COUNT(*), 9) AS avg_logprob
  FROM toks LEFT JOIN lp USING (tok) CROSS JOIN fl
  GROUP BY doc_id
)
SELECT e.doc_id, e.n_tokens, e.entropy, lm.avg_logprob,
       CASE WHEN e.n_tokens BETWEEN 15 AND 2000
             AND e.entropy >= 2.0
             AND e.n_distinct / CAST(e.n_tokens AS DOUBLE) >= 0.2
             AND lm.avg_logprob >= -7.0
            THEN 1 ELSE 0 END AS keep
FROM ent e JOIN lm USING (doc_id)
""")
def quality_composite_gate(spark, sf_dir):
    """The end-to-end QUALITY GATE: length + token entropy + distinct
    ratio + corpus-LM score combined into one keep/drop decision — the
    composition every training pipeline actually ships (each signal
    catches what the others miss: entropy catches repetition, the LM
    catches gibberish, length catches fragments). All component operators
    are individually verified; the gate is their join, thresholds stated
    once. ONE token pass: the (doc_id, tok) explode is materialized once
    (localCheckpoint) and feeds both signals, and the LM vocabulary is
    the STORED unigram artifact (_lm_unigrams_stored) — all aggregations
    combinable, LM vocab broadcast (frequency-floored as always)."""
    from arangodb_java_parquet_spark.operators.curation import (
        unigram_logprob)
    from arangodb_java_parquet_spark.operators.ir import token_entropy
    d = t(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split("text", " ")).alias("tok"))
            .transform(materialize))
    vocab = _lm_unigrams_stored(spark, sf_dir).select(
        "tok", F.col("cnt1").alias("cnt"))
    ent = token_entropy(d, "text", "doc_id", toks=toks)
    lm = unigram_logprob(d, "text", "doc_id", toks=toks,
                         vocab=vocab).select("doc_id", "avg_logprob")
    joined = ent.join(lm, "doc_id")
    keep = (F.col("n_tokens").between(15, 2000)
            & (F.col("entropy") >= 2.0)
            & ((F.col("n_distinct") / F.col("n_tokens").cast("double"))
               >= 0.2)
            & (F.col("avg_logprob") >= -7.0))
    return joined.select(
        "doc_id", "n_tokens", "entropy", "avg_logprob",
        F.when(keep, 1).otherwise(0).alias("keep"))


@query("token_budget_plan", """
WITH per_source AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_source)
SELECT source, n_tokens,
       ROUND(n_tokens / CAST(total AS DOUBLE), 9) AS natural_share,
       CAST(CEIL(1000000.0 * (n_tokens / CAST(total AS DOUBLE))
                 / n_tokens) AS BIGINT) AS epochs_for_1m_budget
FROM per_source CROSS JOIN tot
""")
def token_budget_plan(spark, sf_dir):
    """Training token-budget planner: per source, available tokens, its
    natural share of the corpus, and how many EPOCHS of that source a
    1M-token mixture at natural weights would consume — the arithmetic
    behind 'do we have enough unique data or will we repeat?' (epoch
    counts > 1 flag the sources that data-constrained scaling laws worry
    about). One combinable count + a broadcast total."""
    d = t(spark, sf_dir, "documents")
    per_source = (d.groupBy("source")
                  .agg(F.sum(F.size(F.split("text", " ")))
                       .alias("n_tokens")))
    tot = per_source.agg(F.sum("n_tokens").alias("total"))
    share = F.col("n_tokens") / F.col("total").cast("double")
    return (per_source.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    F.round(share, 9).alias("natural_share"),
                    F.ceil(F.lit(1000000.0) * share / F.col("n_tokens"))
                    .cast("bigint").alias("epochs_for_1m_budget")))


@query("source_quality_scorecard", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM tf GROUP BY 1),
ent AS (
  SELECT doc_id, n_tokens, n_distinct,
         CAST(SUM(CAST(ROUND((-(tf / CAST(n_tokens AS DOUBLE)))
                             * LN(tf / CAST(n_tokens AS DOUBLE)), 9)
                       AS DECIMAL(30,9))) AS DOUBLE) AS entropy
  FROM tf JOIN n USING (doc_id) GROUP BY 1, 2, 3
),
gate AS (
  SELECT doc_id,
         CASE WHEN n_tokens BETWEEN 15 AND 2000
               AND entropy >= 2.0
               AND n_distinct / CAST(n_tokens AS DOUBLE) >= 0.2
              THEN 1 ELSE 0 END AS keep,
         n_tokens
  FROM ent
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(g.keep) AS BIGINT) AS n_kept,
       ROUND(SUM(g.keep) / CAST(COUNT(*) AS DOUBLE), 9) AS keep_rate,
       CAST(SUM(CASE WHEN g.keep = 1 THEN g.n_tokens ELSE 0 END)
            AS BIGINT) AS kept_tokens
FROM documents d JOIN gate g USING (doc_id)
GROUP BY d.source
""")
def source_quality_scorecard(spark, sf_dir):
    """Per-SOURCE quality scorecard: run the (length + entropy +
    distinct-ratio) gate per document, then aggregate keep-rate and
    surviving token mass by source — the procurement dashboard that
    decides which feeds are worth ingesting at all. Composition of the
    verified entropy gate with one extra combinable rollup."""
    from arangodb_java_parquet_spark.operators.ir import token_entropy
    d = t(spark, sf_dir, "documents")
    ent = token_entropy(d, "text", "doc_id")
    keep = (F.col("n_tokens").between(15, 2000)
            & (F.col("entropy") >= 2.0)
            & ((F.col("n_distinct") / F.col("n_tokens").cast("double"))
               >= 0.2))
    gate = ent.select("doc_id",
                      F.when(keep, 1).otherwise(0).alias("keep"),
                      "n_tokens")
    return (d.select("doc_id", "source").join(gate, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("keep").alias("n_kept"),
                 F.round(F.sum("keep") / F.count(F.lit(1)).cast("double"),
                         9).alias("keep_rate"),
                 F.sum(F.when(F.col("keep") == 1, F.col("n_tokens"))
                       .otherwise(0)).alias("kept_tokens")))


@query("token_zipf_slope", """
WITH vocab AS (
  SELECT tok, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk
  FROM vocab
),
pts AS (
  SELECT ROUND(LN(CAST(rnk AS DOUBLE)), 9) AS x,
         ROUND(LN(CAST(freq AS DOUBLE)), 9) AS y
  FROM ranked WHERE rnk <= 1000
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(30,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(30,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(30,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(30,9))) AS DOUBLE) AS sxy
  FROM pts
)
SELECT n AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope
FROM m
""")
def token_zipf_slope(spark, sf_dir):
    """Zipf's-law fit: OLS slope of ln(frequency) ~ ln(rank) over the
    top-1000 token types — natural corpora slope near -1; synthetic,
    templated, or over-deduplicated corpora deviate, making this a
    one-number distribution-health check. Vocabulary ranking window runs
    over the type table; the regression is the exact-decimal moment form
    (agg_linear_regression) on round-9 log points."""
    d = t(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("freq")))
    w = Window.orderBy(F.desc("freq"), "tok")
    pts = (vocab.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= 1000)
           .select(F.round(F.log(F.col("rnk").cast("double")), 9)
                   .alias("x"),
                   F.round(F.log(F.col("freq").cast("double")), 9)
                   .alias("y")))

    def ms(e):
        return F.sum(e.cast("decimal(30,9)")).cast("double")

    m = pts.agg(F.count(F.lit(1)).alias("n"), ms(F.col("x")).alias("sx"),
                ms(F.col("y")).alias("sy"),
                ms(F.col("x") * F.col("x")).alias("sxx"),
                ms(F.col("x") * F.col("y")).alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    return m.select(
        n.alias("n_points"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
        .alias("zipf_slope"))


@query("quality_signal_correlation", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM tf GROUP BY 1),
feats AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(CAST(ROUND((-(tf / CAST(n_tokens AS DOUBLE)))
                             * LN(tf / CAST(n_tokens AS DOUBLE)), 9)
                       AS DECIMAL(30,9))) AS DOUBLE) AS entropy
  FROM tf JOIN n USING (doc_id) GROUP BY 1, 2
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(n_tokens AS DECIMAL(30,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(n_tokens * CAST(n_tokens AS DOUBLE)
                       AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(entropy, 9) AS DECIMAL(30,9))) AS DOUBLE)
           AS sy,
         CAST(SUM(CAST(ROUND(entropy * entropy, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS syy,
         CAST(SUM(CAST(ROUND(n_tokens * entropy, 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS sxy
  FROM feats
)
SELECT n AS n_docs,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_len_entropy
FROM m
""")
def quality_signal_correlation(spark, sf_dir):
    """Are the quality signals REDUNDANT? Exact-moment correlation
    between document length and token entropy — high correlation means
    one of the two gate thresholds is dead weight; the feature-selection
    sanity check run before shipping a multi-signal filter. Composes the
    verified entropy feature with the exact-decimal moment correlation."""
    from arangodb_java_parquet_spark.operators.ir import token_entropy
    d = t(spark, sf_dir, "documents")
    feats = token_entropy(d, "text", "doc_id")

    def ms(e):
        return F.sum(e.cast("decimal(30,8)")).cast("double")

    x = F.col("n_tokens")
    y = F.col("entropy")
    def msr(e):
        # float operands: round-9 BEFORE the decimal cast -- a bare
        # decimal(,8) cast of a full-precision double rounds at a
        # half-ulp boundary differently per engine (one row is enough
        # to shift the moment by 1e-8)
        return F.sum(F.round(e, 9).cast("decimal(30,9)")).cast("double")

    m = feats.agg(F.count(F.lit(1)).alias("n"), ms(x).alias("sx"),
                  ms(x * x.cast("double")).alias("sxx"),
                  msr(y).alias("sy"), msr(y * y).alias("syy"),
                  msr(x * y).alias("sxy"))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        n.alias("n_docs"),
        F.round((n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx)
                   * F.sqrt(n * syy - sy * sy)), 9)
        .alias("corr_len_entropy"))


@query("dedup_rate_by_source", """
WITH fps AS (
  SELECT doc_id, source,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                             ' ')) AS fp
  FROM documents
),
ranked AS (
  SELECT source, fp,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM fps
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicates,
       ROUND(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 9) AS dup_rate
FROM ranked GROUP BY source
""")
def dedup_rate_by_source(spark, sf_dir):
    """Duplicate RATE per source under first-occurrence-wins (bag-of-
    words fingerprint): which feeds contribute mostly copies of content
    already seen elsewhere — the per-source companion of the
    cross-source matrix, and the number that prices a feed. The window
    partitions by fingerprint (each group = one content item), so no
    mega-partitions."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(
        F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " "))
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = (d.select("doc_id", "source", fp.alias("fp"))
              .withColumn("rn", F.row_number().over(w)))
    dups = F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
    return (ranked.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 dups.alias("n_duplicates"),
                 F.round(dups / F.count(F.lit(1)).cast("double"), 9)
                 .alias("dup_rate")))


@query("mixture_rebalance_rates", """
WITH per_source AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
               COUNT(*) AS n_sources
        FROM per_source)
SELECT source, n_tokens,
       ROUND(n_tokens / CAST(total AS DOUBLE), 9) AS natural_share,
       ROUND(LEAST(1.0, (1.0 / n_sources)
                        / (n_tokens / CAST(total AS DOUBLE))), 9)
         AS sample_rate,
       CASE WHEN (1.0 / n_sources) / (n_tokens / CAST(total AS DOUBLE))
                 > 1.0
            THEN 1 ELSE 0 END AS needs_upsampling
FROM per_source CROSS JOIN tot
""")
def mixture_rebalance_rates(spark, sf_dir):
    """Mixture REBALANCING plan: the per-source sampling rate that moves
    the corpus from its natural token shares to a uniform target mix —
    rates cap at 1.0 (can't downsample your way into more data) and the
    flag marks sources that would need repetition/up-sampling instead.
    The executable companion of mixture_source_weights: feed these rates
    into hash_sample's per-stratum thresholds. Pure arithmetic over the
    per-source aggregate + broadcast totals."""
    d = t(spark, sf_dir, "documents")
    per_source = (d.groupBy("source")
                  .agg(F.sum(F.size(F.split("text", " ")))
                       .alias("n_tokens")))
    tot = per_source.agg(F.sum("n_tokens").alias("total"),
                         F.count(F.lit(1)).alias("n_sources"))
    share = F.col("n_tokens") / F.col("total").cast("double")
    target = F.lit(1.0) / F.col("n_sources")
    return (per_source.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    F.round(share, 9).alias("natural_share"),
                    F.round(F.least(F.lit(1.0), target / share), 9)
                    .alias("sample_rate"),
                    F.when(target / share > 1.0, 1).otherwise(0)
                    .alias("needs_upsampling")))


# ---------------------------------------------------------------------------
# pseudo-relevance-feedback query expansion (round 7)
# ---------------------------------------------------------------------------

_PRF_FB_DOCS = 10
_PRF_TOPK = 10


@query("ir_query_expansion_prf", f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 SUM(len(string_split(text, ' '))) AS total_len
          FROM documents),
q AS (SELECT * FROM toks WHERE tok IN ({_BM25_TERMS_SQL})),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM q GROUP BY 1, 2),
dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY 1),
idf AS (
  SELECT tok,
         LN(1.0 + (CAST(stats.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
           AS idf
  FROM dft CROSS JOIN stats
),
scores AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(
           idf.idf * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                               / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
           9) AS DECIMAL(30,9))) AS DOUBLE) AS score
  FROM tf
  JOIN idf USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY 1
),
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM scores
  ) WHERE rn <= {_PRF_FB_DOCS}
),
fb_terms AS (
  SELECT t.tok, COUNT(DISTINCT t.doc_id) AS df_fb
  FROM toks t JOIN fb USING (doc_id)
  WHERE t.tok NOT IN ({_BM25_TERMS_SQL})
  GROUP BY t.tok
),
corpus_df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
scored AS (
  SELECT f.tok AS term, f.df_fb, c.df AS df_corpus,
         ROUND(f.df_fb * LN(1.0 + (CAST(s.n_docs AS DOUBLE) - c.df + 0.5)
                                  / (c.df + 0.5)), 9) AS offer_weight
  FROM fb_terms f JOIN corpus_df c ON c.tok = f.tok CROSS JOIN stats s
)
SELECT term, CAST(df_fb AS BIGINT) AS df_fb,
       CAST(df_corpus AS BIGINT) AS df_corpus, offer_weight, rn
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY offer_weight DESC, term) AS rn
  FROM scored
) WHERE rn <= {_PRF_TOPK}
""")
def ir_query_expansion_prf(spark, sf_dir):
    """Pseudo-relevance-feedback QUERY EXPANSION (Rocchio/Robertson
    offer-weight family): run the fixed BM25 query, take the top
    {_PRF_FB_DOCS} documents as pseudo-relevant, and rank their
    non-query terms by df_in_feedback x smoothed-idf — the classic
    automatic query expander every search stack ships. Reuses the
    value-checked BM25 scorer (operators/ir.py); the feedback set is a
    {_PRF_FB_DOCS}-row broadcast; term scoring is two combinable
    distinct-counts plus a round-9 product.

    Scale: corpus-wide work is the BM25 pass + one df aggregation (both
    combinable, token-keyed); everything downstream of the feedback join
    is bounded by the feedback docs' vocabulary."""
    d = t(spark, sf_dir, "documents")
    scores = bm25_scores(d, "text", "doc_id", list(_BM25_TERMS))
    wfb = Window.orderBy(F.desc("score"), "doc_id")
    fb = (scores.withColumn("rn", F.row_number().over(wfb))
          .filter(F.col("rn") <= _PRF_FB_DOCS).select("doc_id"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # corpus size as a LAZY broadcast scalar (was an eager d.count()
    # job at construction time — r15)
    nd = d.agg(F.count(F.lit(1)).alias("__n"))
    fb_terms = (toks.join(F.broadcast(fb), "doc_id")
                .filter(~F.col("tok").isin(*_BM25_TERMS))
                .groupBy("tok")
                .agg(F.countDistinct("doc_id").alias("df_fb")))
    corpus_df = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    idf = F.log(F.lit(1.0)
                + (F.col("__n").cast("double") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    scored = (fb_terms.join(corpus_df, "tok").crossJoin(F.broadcast(nd))
              .select(F.col("tok").alias("term"), "df_fb",
                      F.col("df").alias("df_corpus"),
                      F.round(F.col("df_fb") * idf, 9)
                      .alias("offer_weight")))
    wr = Window.orderBy(F.desc("offer_weight"), "term")
    return (scored.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= _PRF_TOPK)
            .select("term", F.col("df_fb").cast("bigint").alias("df_fb"),
                    F.col("df_corpus").cast("bigint").alias("df_corpus"),
                    "offer_weight", "rn"))


# ---------------------------------------------------------------------------
# RAKE keyword extraction (round 9)
# ---------------------------------------------------------------------------

# Candidate phrases are maximal runs of non-stopword words (Rose et al.
# 2010, "Automatic Keyword Extraction from Individual Documents"). The
# stopword list is a fixed constant so both engines split identically.
_RAKE_STOPS = (
    "the|of|and|a|an|in|to|is|for|on|with|as|by|at|or|be|this|that|it|"
    "from|are|was|were|has|have|had|not|but|we|you|they|he|she|its|"
    "their|our|will|can|if|so|all|no|more|one|about|into|than|then|"
    "these|there|which|when|what|who|how|also|other|some|such|only|"
    "over|most|after|before|between|both|each|few|may|where|why|any|"
    "because|through|during|again|against|very|s|t|just|now|i")
_RAKE_MAXW = 4
_RAKE_TOPK = 20

_RAKE_SQL = f"""
WITH norm AS (
  SELECT regexp_replace(lower(text), '[^a-z]+', ' ', 'g') AS s2
  FROM documents
),
delim AS (
  SELECT regexp_replace(s2, '\\b({_RAKE_STOPS})\\b', '|', 'g') AS s3
  FROM norm
),
rawp AS (SELECT UNNEST(string_split(s3, '|')) AS rp FROM delim),
phrases AS (
  SELECT trim(regexp_replace(rp, ' +', ' ', 'g')) AS p FROM rawp
),
pf AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS pfreq,
         CAST(len(string_split(p, ' ')) AS BIGINT) AS n_words
  FROM phrases
  WHERE p <> '' AND len(string_split(p, ' ')) <= {_RAKE_MAXW}
  GROUP BY p
),
tok AS (
  SELECT p, pfreq, n_words, UNNEST(string_split(p, ' ')) AS w FROM pf
),
wstats AS (
  SELECT w, CAST(SUM(pfreq) AS BIGINT) AS wfreq,
         CAST(SUM(pfreq * n_words) AS BIGINT) AS wdeg
  FROM tok GROUP BY w
),
wsc AS (
  SELECT w, (wdeg * 1000000000) // wfreq AS wscore_e9 FROM wstats
),
psc AS (
  SELECT t.p, CAST(SUM(ws.wscore_e9) AS BIGINT) AS score_e9
  FROM tok t JOIN wsc ws ON t.w = ws.w
  GROUP BY t.p
)
SELECT pf.p AS phrase, pf.n_words, pf.pfreq AS phrase_freq,
       psc.score_e9,
       psc.score_e9 / CAST(1000000000 AS DOUBLE) AS score
FROM psc JOIN pf ON psc.p = pf.p
ORDER BY psc.score_e9 DESC, phrase
LIMIT {_RAKE_TOPK}
"""


@query("keywords_rake", _RAKE_SQL)
def keywords_rake(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal non-stopword word runs; a word scores degree/frequency (degree
    = summed length of phrases containing it); a phrase scores the sum of
    its words' scores. Corpus-wide top-20 phrases.

    Determinism: the word score is computed in INTEGER 1e-9 units
    (deg * 1e9 DIV freq — floor division is identical in both engines),
    so phrase scores are exact BIGINT sums; the readable double is one
    IEEE division by 1e9 (an exactly representable double) at the very
    end. At larger corpora swap the 1e9 scale for 1e6 to keep
    deg * scale inside BIGINT.

    Scale: the token explode is O(total tokens); word stats are a
    vocab-bounded groupBy; the phrase score join is token rows against the
    vocab-sized score table; top-20 is orderBy+limit (TakeOrdered per-
    partition heaps). Nothing is quadratic, nothing collects."""
    d = t(spark, sf_dir, "documents")
    s2 = F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")
    s3 = F.regexp_replace(s2, f"\\b({_RAKE_STOPS})\\b", "|")
    rawp = d.select(F.explode(F.split(s3, "\\|")).alias("rp"))
    phrases = rawp.select(
        F.trim(F.regexp_replace(F.col("rp"), " +", " ")).alias("p"))
    nw = F.size(F.split(F.col("p"), " "))
    pf = (phrases
          .filter((F.col("p") != "") & (nw <= _RAKE_MAXW))
          .groupBy("p")
          .agg(F.count(F.lit(1)).cast("bigint").alias("pfreq"))
          .withColumn("n_words", nw.cast("bigint")))
    tok = pf.select("p", "pfreq", "n_words",
                    F.explode(F.split(F.col("p"), " ")).alias("w"))
    wstats = tok.groupBy("w").agg(
        F.sum("pfreq").cast("bigint").alias("wfreq"),
        F.sum(F.col("pfreq") * F.col("n_words")).cast("bigint")
        .alias("wdeg"))
    wsc = wstats.select(
        "w", F.expr("wdeg * CAST(1000000000 AS BIGINT) DIV wfreq")
        .alias("wscore_e9"))
    psc = (tok.join(wsc, "w")
           .groupBy("p")
           .agg(F.sum("wscore_e9").cast("bigint").alias("score_e9")))
    return (psc.join(pf, "p")
            .select(F.col("p").alias("phrase"), "n_words",
                    F.col("pfreq").alias("phrase_freq"), "score_e9",
                    (F.col("score_e9")
                     / F.lit(1000000000).cast("double")).alias("score"))
            .orderBy(F.desc("score_e9"), "phrase")
            .limit(_RAKE_TOPK))


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram language model (round 9c)
# ---------------------------------------------------------------------------

@query("quality_kneser_ney_logprob", """
WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
bigrams AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i + 1])) AS bg
  FROM arrs WHERE len(a) >= 2
),
bi AS (SELECT bg, COUNT(*) AS cnt2 FROM bigrams GROUP BY bg),
bsplit AS (
  SELECT bg, cnt2,
         string_split(bg, ' ')[1] AS v,
         string_split(bg, ' ')[2] AS w
  FROM bi
),
ctx AS (
  SELECT v, CAST(SUM(cnt2) AS BIGINT) AS cv,
         CAST(COUNT(*) AS BIGINT) AS n1v
  FROM bsplit GROUP BY v
),
wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1w FROM bsplit GROUP BY w),
ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM bi),
fitted AS (
  SELECT bg, ROUND(LN(
      (4 * cnt2 - 3) / CAST(4 * cv AS DOUBLE)
      + ((3 * n1v) / CAST(4 * cv AS DOUBLE)) * (n1w / CAST(ntypes AS DOUBLE))
    ), 9) AS logp
  FROM bsplit JOIN ctx USING (v) JOIN wt USING (w) CROSS JOIN ty
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(logp AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*)
         AS avg_logprob_kn
FROM bigrams JOIN fitted USING (bg)
GROUP BY doc_id
""")
def quality_kneser_ney_logprob(spark, sf_dir):
    """Interpolated Kneser-Ney bigram score (Kneser & Ney 1995; Chen &
    Goodman 1998) — the stronger LM companion to the stupid-backoff
    entry: absolute discounting (d = 3/4) redistributes mass to a
    CONTINUATION unigram (how many distinct contexts a word follows,
    not how often it occurs), which is what separates natural prose
    from templated text that reuses high-frequency words in few
    contexts.

      P_KN(w|v) = max(c(vw) - d, 0)/c(v.) + (d * N1+(v.)/c(v.)) * Pcont(w)
      Pcont(w)  = N1+(.w) / N1+(..)

    Scoring the fitting corpus means every scored bigram is observed, so
    no OOV branch is needed. All model quantities are integer counts;
    the discount enters as the integer ratio (4c-3)/4c (never a float
    literal — CLAUDE.md's literal rule); per-type ln is round-9 fenced;
    the per-doc mean is an exact decimal sum over one IEEE division.

    Scale: counts are map-side combinable, keyed by bigram/context/word
    (corpus text never shuffles); at 100 TB the three model tables get
    the same frequency-floor + capped-vocab treatment as
    quality_bigram_logprob (operators/curation.capped_vocab) — the KN
    interpolation already defines what truncated mass falls back to.
    Consumes the STORED corpus bigram table (_lm_bigrams_stored, shared
    with the stupid-backoff entry): both of this entry's bigram legs
    start from a parquet scan, the corpus is never re-exploded."""
    bigrams = _lm_bigrams_stored(spark, sf_dir)
    bi = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt2"))
    # Four consumers (ctx, wt, ntypes, the fitted join) read the bigram-
    # type table; materialize it once (lazy localCheckpoint) so the
    # corpus explode+count runs a single time, not per consumer.
    bsplit = bi.select(
        "bg", "cnt2",
        F.element_at(F.split(F.col("bg"), " "), 1).alias("v"),
        F.element_at(F.split(F.col("bg"), " "), 2).alias("w")
    ).transform(materialize)
    ctx = bsplit.groupBy("v").agg(
        F.sum("cnt2").cast("bigint").alias("cv"),
        F.count(F.lit(1)).cast("bigint").alias("n1v"))
    wt = bsplit.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1w"))
    ty = bsplit.agg(F.count(F.lit(1)).cast("bigint").alias("ntypes"))
    term1 = (4 * F.col("cnt2") - 3) / (4 * F.col("cv")).cast("double")
    lam = (3 * F.col("n1v")) / (4 * F.col("cv")).cast("double")
    pcont = F.col("n1w") / F.col("ntypes").cast("double")
    fitted = (bsplit.join(ctx, "v").join(wt, "w")
              .crossJoin(F.broadcast(ty))
              .select("bg",
                      F.round(F.log(term1 + lam * pcont), 9).alias("logp")))
    return (bigrams.join(fitted, "bg")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 (F.sum(F.col("logp").cast("decimal(20,9)")).cast("double")
                  / F.count(F.lit(1))).alias("avg_logprob_kn")))


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query-likelihood retrieval (round 9e)
# ---------------------------------------------------------------------------

_QL_MU = 2000  # Dirichlet prior mass (integer: no float literals)


@query("ir_dirichlet_lm_score", f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total FROM documents),
q AS (SELECT * FROM toks WHERE tok IN ({_BM25_TERMS_SQL})),
cfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM q GROUP BY tok),
qconst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CAST(ROUND(LN(({_QL_MU} * cf)
                                / CAST(total AS DOUBLE)), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS bg_const
  FROM cfs CROSS JOIN stats
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM q GROUP BY 1, 2),
corr AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(LN(1 + (CAST(tf.c AS DOUBLE) * total)
                                    / ({_QL_MU} * cfs.cf)), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS match_part
  FROM tf JOIN cfs USING (tok) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT dl.doc_id, CAST(dl.dl AS BIGINT) AS dl,
       qc.bg_const
         - qc.n_terms * ROUND(LN(CAST(dl.dl + {_QL_MU} AS DOUBLE)), 9)
         + COALESCE(corr.match_part, CAST(0 AS DOUBLE)) AS score
FROM dl
LEFT JOIN corr ON corr.doc_id = dl.doc_id
CROSS JOIN qconst qc
""")
def ir_dirichlet_lm_score(spark, sf_dir):
    """Query-likelihood retrieval with DIRICHLET smoothing (Zhai &
    Lafferty 2001), mu = {_QL_MU} — with BM25 and TF-IDF cosine this
    completes the classic lexical-ranking triple. Uses the sparse
    background-offset decomposition that makes QL scoring bounded at
    corpus scale: score(d) = sum_t ln(mu*P(t|C)) - |q|*ln(dl + mu)
    + sum_(t in d AND q) ln(1 + c_td * |C| / (mu * cf_t)), so only
    MATCHING (doc, term) pairs ever shuffle (the BM25 shape) and
    non-matching docs are scored from the per-doc length alone.

    Determinism: the query-constant and match corrections are round-9
    ln terms in exact decimal sums; smoothing ratios are pure integer
    ratios (mu is an integer constant, P(t|C) = cf/|C| stays a
    bigint-over-double division); the final score is two additions of
    identical doubles."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("tok"))
    dl = d.select("doc_id",
                  F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(F.sum(F.size(F.split("text", " "))).cast("bigint")
                  .alias("total"))
    q = toks.filter(F.col("tok").isin(list(_BM25_TERMS)))
    cfs = q.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    qconst = (cfs.crossJoin(F.broadcast(stats))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                   F.sum(F.round(F.log((_QL_MU * F.col("cf"))
                                       / F.col("total").cast("double")), 9)
                         .cast("decimal(20,9)")).cast("double")
                   .alias("bg_const")))
    tf = q.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    corr = (tf.join(F.broadcast(cfs), "tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.sum(F.round(F.log(
                1 + (F.col("c").cast("double") * F.col("total"))
                / (_QL_MU * F.col("cf"))), 9).cast("decimal(20,9)"))
                 .cast("double").alias("match_part")))
    return (dl.join(corr, "doc_id", "left")
            .crossJoin(F.broadcast(qconst))
            .select("doc_id", F.col("dl").cast("bigint").alias("dl"),
                    (F.col("bg_const")
                     - F.col("n_terms")
                     * F.round(F.log((F.col("dl") + _QL_MU)
                                     .cast("double")), 9)
                     + F.coalesce("match_part", F.lit(0).cast("double")))
                    .alias("score")))


# ---------------------------------------------------------------------------
# TextRank keyword extraction (round 9e)
# ---------------------------------------------------------------------------

_TR_ROUNDS = 3
_TR_TOPK = 20


def _textrank_sql() -> str:
    parts = ["""
WITH arrs AS (
  SELECT regexp_extract_all(text, '[a-z]{4,}') AS a FROM documents
),
bg AS (
  SELECT UNNEST(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i + 1])) AS bgs
  FROM arrs WHERE len(a) >= 2
),
dir_e AS (
  SELECT string_split(bgs, ' ')[1] AS src,
         string_split(bgs, ' ')[2] AS dst
  FROM bg
  WHERE string_split(bgs, ' ')[1] <> string_split(bgs, ' ')[2]
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
    SELECT src, dst FROM dir_e
    UNION ALL SELECT dst, src FROM dir_e
  ) GROUP BY src, dst
),
wdeg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS wd
         FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wdeg),
s0 AS (SELECT node, CAST(1 AS DOUBLE) / n AS s FROM wdeg CROSS JOIN nn)"""]
    for r in range(1, _TR_ROUNDS + 1):
        parts.append(f""",
m{r} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(ROUND(s.s * e.w / CAST(d.wd AS DOUBLE), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS mass
  FROM edges e
  JOIN s{r - 1} s ON s.node = e.src
  JOIN wdeg d ON d.node = e.src
  GROUP BY e.dst
),
s{r} AS (
  SELECT w.node,
         ROUND(CAST(3 AS DOUBLE) / (20 * n)
               + (CAST(17 AS DOUBLE) / 20)
                 * COALESCE(m.mass, CAST(0 AS DOUBLE)), 9) AS s
  FROM wdeg w LEFT JOIN m{r} m ON m.node = w.node CROSS JOIN nn
)""")
    parts.append(f"""
SELECT node AS token, s AS textrank_score,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT node, s, ROW_NUMBER() OVER (ORDER BY s DESC, node ASC) AS rn
  FROM s{_TR_ROUNDS}
) WHERE rn <= {_TR_TOPK}""")
    return "".join(parts)


@query("keywords_textrank", _textrank_sql())
def keywords_textrank(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — the
    graph-centrality companion to the degree-heuristic RAKE entry:
    content words (lowercase runs of length >= 4) become nodes, adjacent
    content words become weighted undirected edges, and {_TR_ROUNDS}
    fixed damped PageRank rounds (d = 17/20, an integer ratio) rank
    tokens by centrality; top {_TR_TOPK} with a token tiebreak.

    Per round: one edges-x-scores join + one combinable mass
    aggregation + a left join back to the node table (dangling-free by
    construction — every node of the undirected graph has out-weight).
    Plan depth is fixed by the round count; the vocabulary-sized score
    table is the only state. Per-edge mass terms are round-9 fenced
    into exact decimal sums; each round's score is one rounded affine
    expression, so the fixed point is engine-exact."""
    d = t(spark, sf_dir, "documents")
    arr = F.expr("regexp_extract_all(text, '[a-z]{4,}', 0)")
    bg = (d.select(arr.alias("a"))
          .filter(F.size("a") >= 2)
          .select(F.explode(F.expr(
              "transform(sequence(0, size(a) - 2),"
              " i -> concat(a[i], ' ', a[i + 1]))")).alias("bgs")))
    sp = F.split(F.col("bgs"), " ")
    dir_e = (bg.select(F.element_at(sp, 1).alias("src"),
                       F.element_at(sp, 2).alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    edges = (dir_e.unionAll(dir_e.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
             .transform(materialize))
    wdeg = (edges.groupBy(F.col("src").alias("node"))
            .agg(F.sum("w").cast("bigint").alias("wd"))
            .transform(materialize))
    # nn is a 1-row constant with 4 consumers (s0 + each round's damped
    # affine) — checkpoint it or its SinglePartition agg re-plans 4x
    nn = (wdeg.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
          .transform(materialize))
    # exchange discipline (VERDICT r10 #4): the score table is
    # vocabulary-sized (the only iteration state, see docstring), so
    # each round BROADCASTS (score ⨝ out-weight) into the edge table
    # and broadcasts the mass result back onto the node table — the
    # only exchange per round is the mass aggregation's groupBy(dst)
    # (10 exchanges -> 1/round + the initial edge build)
    s = (wdeg.crossJoin(F.broadcast(nn))
         .select("node", (F.lit(1).cast("double") / F.col("n")).alias("s")))
    for _ in range(_TR_ROUNDS):
        sw = (s.join(wdeg, "node")
              .select(F.col("node").alias("src"), "s",
                      F.col("wd").alias("swd")))
        mass = (edges.join(F.broadcast(sw), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.round(F.col("s") * F.col("w")
                                   / F.col("swd").cast("double"), 9)
                           .cast("decimal(20,9)")).cast("double")
                     .alias("mass")))
        s = (wdeg.join(F.broadcast(mass), "node", "left")
             .crossJoin(F.broadcast(nn))
             .select("node",
                     F.round(F.lit(3).cast("double") / (20 * F.col("n"))
                             + (F.lit(17).cast("double") / 20)
                             * F.coalesce("mass",
                                          F.lit(0).cast("double")), 9)
                     .alias("s")))
    shortlist = s.orderBy(F.desc("s"), F.asc("node")).limit(_TR_TOPK)
    wo = Window.orderBy(F.desc("s"), F.asc("node"))
    return (shortlist
            .withColumn("rank", F.row_number().over(wo).cast("bigint"))
            .select(F.col("node").alias("token"),
                    F.col("s").alias("textrank_score"), "rank"))


# ---------------------------------------------------------------------------
# b-bit minwise hashing (round 9e)
# ---------------------------------------------------------------------------

_BBIT_SQL_BITS_A = " + ".join(
    f"(CASE WHEN CAST('0x' || substring(sa.h{j}, 8, 1) AS INT) % 2"
    f" = CAST('0x' || substring(sb.h{j}, 8, 1) AS INT) % 2"
    f" THEN 1 ELSE 0 END)" for j in range(8))
_BBIT_SQL_FULL = " + ".join(
    f"(CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END)" for j in range(8))


@query("dedup_minhash_bbit", _MINHASH_SIG_SQL + f"""
, bands AS (
  SELECT doc_id, 0 AS band_idx,
         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS band_hash FROM sigs
  UNION ALL SELECT doc_id, 1,
         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST({_BBIT_SQL_BITS_A} AS BIGINT) AS agree_bits,
       (2 * ({_BBIT_SQL_BITS_A}) - 8) / CAST(8 AS DOUBLE)
         AS est_jaccard_1bit,
       ({_BBIT_SQL_FULL}) / CAST(8 AS DOUBLE) AS est_jaccard_full
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
""")
def dedup_minhash_bbit(spark, sf_dir):
    """b-BIT minwise hashing (Li & Koenig, CACM 2011), b = 1: keep only
    the lowest bit of each MinHash component and estimate Jaccard from
    1-bit agreement with the unbiased correction J_hat = 2*A - 1 (for
    b=1 the collision probability is J + (1-J)/2). This is the
    storage-collapsed sketch the paper made standard — 8 BITS per
    document instead of 8 32-bit words (a 32x shrink of signature
    state, the difference between an in-memory and a spilled dedup pass
    at 100 TB) — evaluated here against the full-width estimator on the
    same LSH candidate pairs so the estimator-vs-storage tradeoff is a
    queryable number.

    All agreement counts are integers; both estimates are single IEEE
    divisions of integer-derived operands (the 1-bit estimate may go
    negative on true-low-Jaccard pairs — that is the unbiased
    estimator's documented behavior, not clamped here)."""
    from arangodb_java_parquet_spark.operators.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_signatures)
    d = t(spark, sf_dir, "documents")
    # materialize once: pairs, sa and sb otherwise re-derive the full
    # shingle+minhash lineage per consumer (non-canonicalizing md5/HOF
    # subtrees -> no ReusedExchange; the r15 3-pass fix)
    sigs = minhash_signatures(
        char_shingles(d, "text", "doc_id", k=5, distinct=False),
        "doc_id").transform(materialize)
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    sa = sigs.select([F.col("doc_id").alias("doc_a")]
                     + [F.col(f"h{j}").alias(f"a{j}") for j in range(8)])
    sb = sigs.select([F.col("doc_id").alias("doc_b")]
                     + [F.col(f"h{j}").alias(f"b{j}") for j in range(8)])

    def bit(col):
        return F.conv(F.substring(col, 8, 1), 16, 10).cast("int") % 2

    agree1 = sum((bit(F.col(f"a{j}")) == bit(F.col(f"b{j}"))).cast("int")
                 for j in range(8))
    agree_full = sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
                     for j in range(8))
    return (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b",
                    agree1.cast("bigint").alias("agree_bits"),
                    ((2 * agree1 - 8) / F.lit(8).cast("double"))
                    .alias("est_jaccard_1bit"),
                    (agree_full / F.lit(8).cast("double"))
                    .alias("est_jaccard_full")))


# ---------------------------------------------------------------------------
# mixture divergence / smoothing / diversity wave (round 10)
# ---------------------------------------------------------------------------

@query("mixture_js_divergence", """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
sn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM st),
mat AS (
  SELECT s.source, v.tok, COALESCE(st.c, 0) AS c, sn.n
  FROM sn s CROSS JOIN vocab v
  LEFT JOIN st ON st.source = s.source AND st.tok = v.tok
  JOIN sn ON sn.source = s.source
),
terms AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CASE WHEN a.c > 0 THEN
           ROUND((a.c / CAST(a.n AS DOUBLE))
                 * LN(CAST(2 * a.c * b.n AS DOUBLE)
                      / CAST(a.c * b.n + b.c * a.n AS DOUBLE)), 9)
         ELSE 0e0 END AS ta,
         CASE WHEN b.c > 0 THEN
           ROUND((b.c / CAST(b.n AS DOUBLE))
                 * LN(CAST(2 * b.c * a.n AS DOUBLE)
                      / CAST(a.c * b.n + b.c * a.n AS DOUBLE)), 9)
         ELSE 0e0 END AS tb
  FROM mat a JOIN mat b ON a.tok = b.tok AND a.source < b.source
)
SELECT source_a, source_b,
       (CAST(SUM(CAST(ta AS DECIMAL(30,9))) AS DOUBLE)
        + CAST(SUM(CAST(tb AS DECIMAL(30,9))) AS DOUBLE))
         / CAST(2 AS DOUBLE) AS js_divergence
FROM terms GROUP BY 1, 2
""")
def mixture_js_divergence(spark, sf_dir):
    """PAIRWISE Jensen-Shannon divergence between source unigram
    distributions (Lin 1991) — the SYMMETRIC, bounded [0, ln 2] mixture
    diagnostic that complements mixture_kl_divergence's per-source-vs-
    corpus KL: which pairs of sources are interchangeable and which
    bring genuinely different text. Zeros are native to JS (a token
    absent from one source contributes only the other side's term), so
    no smoothing constant pollutes the value. Each term's log ratio is
    derived from INTEGER products only (p/m = 2*ca*nb / (ca*nb + cb*na))
    so both engines compute identical doubles; terms are round-9 fenced
    then exact-decimal summed. Shape: the (vocab x sources) incidence is
    vocab-sized (the same broadcast posture as the corpus distribution
    in mixture_kl_divergence); the pair join is vocab x source-pairs,
    with sources an enumerable handful at any corpus scale."""
    d = t(spark, sf_dir, "documents")
    st = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .transform(materialize))  # feeds totals, vocab, matrix
    sn = (st.groupBy("source")
          .agg(F.sum("c").cast("bigint").alias("n")))
    vocab = st.select("tok").distinct()
    mat = (sn.crossJoin(vocab)
           .join(st, ["source", "tok"], "left")
           .select("source", "tok",
                   F.coalesce(F.col("c"), F.lit(0)).alias("c"), "n"))
    a = mat.select(F.col("source").alias("source_a"), "tok",
                   F.col("c").alias("ca"), F.col("n").alias("na"))
    b = mat.select(F.col("source").alias("source_b"), "tok",
                   F.col("c").alias("cb"), F.col("n").alias("nb"))
    j = (a.join(b, "tok")
         .filter(F.col("source_a") < F.col("source_b")))
    denom = (F.col("ca") * F.col("nb")
             + F.col("cb") * F.col("na")).cast("double")
    ta = F.when(F.col("ca") > 0, F.round(
        (F.col("ca") / F.col("na").cast("double"))
        * F.log((2 * F.col("ca") * F.col("nb")).cast("double") / denom),
        9)).otherwise(F.lit(0.0))
    tb = F.when(F.col("cb") > 0, F.round(
        (F.col("cb") / F.col("nb").cast("double"))
        * F.log((2 * F.col("cb") * F.col("na")).cast("double") / denom),
        9)).otherwise(F.lit(0.0))
    return (j.select("source_a", "source_b", ta.alias("ta"), tb.alias("tb"))
            .groupBy("source_a", "source_b")
            .agg(((F.sum(F.col("ta").cast("decimal(30,9)")).cast("double")
                   + F.sum(F.col("tb").cast("decimal(30,9)"))
                   .cast("double"))
                  / F.lit(2).cast("double")).alias("js_divergence")))


@query("vocab_good_turing", """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
coc AS (SELECT source, c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM st GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM st GROUP BY 1)
SELECT t.source, t.n_tokens, t.vocab,
       COALESCE(MAX(CASE WHEN c.r = 1 THEN c.n_r END), 0) AS n1,
       COALESCE(MAX(CASE WHEN c.r = 2 THEN c.n_r END), 0) AS n2,
       COALESCE(MAX(CASE WHEN c.r = 3 THEN c.n_r END), 0) AS n3,
       COALESCE(MAX(CASE WHEN c.r = 1 THEN c.n_r END), 0)
         / CAST(t.n_tokens AS DOUBLE) AS p_unseen,
       2 * COALESCE(MAX(CASE WHEN c.r = 2 THEN c.n_r END), 0)
         / CAST(NULLIF(COALESCE(MAX(CASE WHEN c.r = 1 THEN c.n_r END), 0),
                       0) AS DOUBLE) AS r1_star,
       3 * COALESCE(MAX(CASE WHEN c.r = 3 THEN c.n_r END), 0)
         / CAST(NULLIF(COALESCE(MAX(CASE WHEN c.r = 2 THEN c.n_r END), 0),
                       0) AS DOUBLE) AS r2_star
FROM tot t LEFT JOIN coc c ON c.source = t.source
GROUP BY t.source, t.n_tokens, t.vocab
""")
def vocab_good_turing(spark, sf_dir):
    """GOOD-TURING frequency estimation per source (Good 1953): the
    count-of-counts table's head (N1, N2, N3), the unseen-mass estimate
    p0 = N1/N (the probability the NEXT token drawn from this source is
    a word never seen before — the coverage/novelty signal behind
    vocabulary-growth planning), and the Turing-smoothed adjusted counts
    r* = (r+1) N_{r+1}/N_r for r = 1, 2. Everything is integer counting
    (two combinable aggregations) until plain IEEE divisions — no
    rounding fence needed. Count-of-counts is at most max-frequency
    rows per source, report-sized at any corpus scale."""
    d = t(spark, sf_dir, "documents")
    st = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .transform(materialize))  # feeds count-of-counts + totals
    coc = (st.groupBy("source", F.col("c").alias("r"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_r")))
    tot = (st.groupBy("source")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("vocab")))
    nr = lambda r: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("r") == r, F.col("n_r"))), F.lit(0))
    return (tot.join(coc, "source", "left")
            .groupBy("source", "n_tokens", "vocab")
            .agg(nr(1).alias("n1"), nr(2).alias("n2"), nr(3).alias("n3"))
            .select("source", "n_tokens", "vocab", "n1", "n2", "n3",
                    (F.col("n1") / F.col("n_tokens").cast("double"))
                    .alias("p_unseen"),
                    (2 * F.col("n2")
                     / F.nullif(F.col("n1"), F.lit(0)).cast("double"))
                    .alias("r1_star"),
                    (3 * F.col("n3")
                     / F.nullif(F.col("n2"), F.lit(0)).cast("double"))
                    .alias("r2_star")))


@query("text_simpson_diversity", """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
agg AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS s2
  FROM st GROUP BY 1
)
SELECT source, n_tokens, vocab,
       s2 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS simpson_lambda,
       1e0 - s2 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
         AS gini_simpson,
       CAST(n_tokens * (n_tokens - 1) AS DOUBLE) / s2 AS inverse_simpson
FROM agg
""")
def text_simpson_diversity(spark, sf_dir):
    """SIMPSON DIVERSITY of each source's token distribution (Simpson
    1949, the unbiased finite-sample form λ = Σ c(c-1) / (N(N-1)) — the
    probability two tokens drawn without replacement are the same type),
    with the Gini-Simpson complement and the inverse-Simpson effective
    vocabulary size. Low diversity (high λ) flags template/boilerplate
    sources before they flood a training mix — the concentration twin of
    the entropy and Zipf diagnostics. Pure integer arithmetic (one
    combinable pass over (source, token) counts) until plain IEEE
    divisions: bit-identical on any engine, no rounding."""
    d = t(spark, sf_dir, "documents")
    st = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    agg = (st.groupBy("source")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("vocab"),
                F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint")
                .alias("s2")))
    nn = (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double")
    return agg.select(
        "source", "n_tokens", "vocab",
        (F.col("s2") / nn).alias("simpson_lambda"),
        (F.lit(1.0) - F.col("s2") / nn).alias("gini_simpson"),
        (nn / F.col("s2")).alias("inverse_simpson"))


_MATTR_W = 25


@query("quality_mattr", f"""
WITH toks AS (
  SELECT doc_id, i AS pos, (string_split(text, ' '))[i] AS tok,
         len(string_split(text, ' ')) AS n
  FROM (SELECT doc_id, text,
               UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS i
        FROM documents
        WHERE len(string_split(text, ' ')) >= {_MATTR_W})
),
prevs AS (
  SELECT doc_id, pos, n,
         COALESCE(LAG(pos) OVER (PARTITION BY doc_id, tok ORDER BY pos), 0)
           AS prev
  FROM toks
),
contrib AS (
  SELECT doc_id, n,
         GREATEST(LEAST(pos, n - {_MATTR_W} + 1)
                  - GREATEST(pos - {_MATTR_W} + 1, prev + 1, 1) + 1,
                  0) AS c
  FROM prevs
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(MAX(n) - {_MATTR_W} + 1 AS BIGINT) AS n_windows,
       CAST(SUM(c) AS BIGINT) AS distinct_window_sum,
       SUM(c) / (CAST({_MATTR_W} AS DOUBLE) * (MAX(n) - {_MATTR_W} + 1))
         AS mattr
FROM contrib GROUP BY doc_id
""")
def quality_mattr(spark, sf_dir):
    """MOVING-AVERAGE TYPE-TOKEN RATIO (MATTR, Covington & McFall 2010)
    — the length-independent lexical-diversity quality signal (plain TTR
    collapses as documents grow; MATTR averages TTR over every sliding
    _MATTR_W=25-token window). The naive form counts distinct types per window:
    O(tokens · w) and COUNT(DISTINCT) inside a frame, which neither
    engine supports. Rewritten CLOSED-FORM in O(tokens): a token
    occurrence at position p with previous same-type occurrence at q is
    the window-first occurrence exactly for window starts s in
    [max(p-w+1, q+1, 1), min(p, n-w+1)], so its total contribution to
    Σ_s distinct(s) is that interval's length — one LAG window per
    (doc, type) chain plus one combinable sum. Pure integer arithmetic
    to one final division. Per-document work, no corpus state: scales
    embarrassingly."""
    d = (t(spark, sf_dir, "documents")
         .filter(F.size(F.split("text", " ")) >= _MATTR_W))
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n"),
        F.posexplode(F.split("text", " ")).alias("p0", "tok"))
    prevs = toks.select(
        "doc_id", "n", (F.col("p0") + 1).alias("pos"), "tok").withColumn(
        "prev", F.coalesce(
            F.lag("pos").over(Window.partitionBy("doc_id", "tok")
                              .orderBy("pos")), F.lit(0)))
    w = _MATTR_W
    c = F.greatest(
        F.least(F.col("pos"), F.col("n") - w + 1)
        - F.greatest(F.col("pos") - w + 1, F.col("prev") + 1, F.lit(1))
        + 1, F.lit(0))
    return (prevs.select("doc_id", "n", c.alias("c"))
            .groupBy("doc_id")
            .agg(F.max("n").cast("bigint").alias("n_tokens"),
                 (F.max("n") - w + 1).cast("bigint").alias("n_windows"),
                 F.sum("c").cast("bigint").alias("distinct_window_sum"),
                 (F.sum("c")
                  / (F.lit(w).cast("double") * (F.max("n") - w + 1)))
                 .alias("mattr")))


_BD_TOPK = 30


@query("text_burrows_delta", f"""
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2),
sn AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1),
top AS (
  SELECT tok FROM (
    SELECT tok, SUM(c) AS tc,
           ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, tok) AS rn
    FROM st GROUP BY tok
  ) WHERE rn <= {_BD_TOPK}
),
f AS (
  SELECT s.source, tp.tok,
         COALESCE(st.c, 0) / CAST(s.n AS DOUBLE) AS fr
  FROM sn s CROSS JOIN top tp
  LEFT JOIN st ON st.source = s.source AND st.tok = tp.tok
),
mu AS (
  SELECT tok,
         CAST(SUM(CAST(ROUND(fr, 9) AS DECIMAL(30,9))) AS DOUBLE)
           / COUNT(*) AS m,
         COUNT(*) AS ns
  FROM f GROUP BY tok
),
z AS (
  -- zero-variance tokens (identical frequency in every source) carry
  -- no stylometric signal: z := 0 via NULLIF + COALESCE
  SELECT f.source, f.tok,
         COALESCE(ROUND((f.fr - mu.m)
               / sqrt(NULLIF(
                   CAST(SUM(CAST(ROUND((f2.fr - mu.m) * (f2.fr - mu.m),
                                       12) AS DECIMAL(30,12)))
                        AS DOUBLE) / mu.ns, 0)), 9), 0e0) AS z
  FROM f
  JOIN mu ON mu.tok = f.tok
  JOIN f f2 ON f2.tok = f.tok
  GROUP BY f.source, f.tok, f.fr, mu.m, mu.ns
),
d AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CAST(ROUND(ABS(a.z - b.z), 9) AS DECIMAL(30,9)))
              AS DOUBLE) / COUNT(*) AS burrows_delta
  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, burrows_delta FROM d
""")
def text_burrows_delta(spark, sf_dir):
    """BURROWS' DELTA stylometric distance between sources (Burrows
    2002, the standard authorship-attribution measure): z-score each
    source's relative frequency of the corpus's top-{_BD_TOPK} tokens
    against the across-source mean and population std of that token,
    then Delta(a, b) = mean |z_a - z_b| — sources with the same
    'authorial fingerprint' (function-word profile) score near zero
    even when their content words differ, which n-gram overlap cannot
    see. Frequencies are integer-ratio doubles; the variance (computed
    as an explicit deviation-square sum so both engines share one
    formulation) is round-12-then-decimal-summed; z and |Δz| round-9
    fenced. Every table after the one token pass is (top-K x sources)-
    sized — broadcast material at any corpus scale."""
    d = t(spark, sf_dir, "documents")
    st = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .transform(materialize))  # totals, top-K, matrix
    sn = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    top = (st.groupBy("tok").agg(F.sum("c").alias("tc"))
           .withColumn("rn", F.row_number().over(
               Window.orderBy(F.desc("tc"), "tok")))
           .filter(F.col("rn") <= _BD_TOPK).select("tok"))
    f = (sn.crossJoin(F.broadcast(top))
         .join(st, ["source", "tok"], "left")
         .select("source", "tok",
                 (F.coalesce(F.col("c"), F.lit(0))
                  / F.col("n").cast("double")).alias("fr"))
         .transform(materialize))  # feeds mu, the square sum, z
    mu = (f.groupBy("tok")
          .agg((F.sum(F.round("fr", 9).cast("decimal(30,9)"))
                .cast("double") / F.count(F.lit(1))).alias("m"),
               F.count(F.lit(1)).alias("ns")))
    f2 = f.select(F.col("tok").alias("tok2"), F.col("fr").alias("fr2"))
    var = (mu.join(f2, mu.tok == F.col("tok2"))
           .groupBy("tok", "m", "ns")
           .agg((F.sum(F.round((F.col("fr2") - F.col("m"))
                               * (F.col("fr2") - F.col("m")), 12)
                       .cast("decimal(30,12)")).cast("double")
                 / F.col("ns")).alias("v")))
    z = (f.join(F.broadcast(var), "tok")
         .select("source", "tok",
                 F.coalesce(
                     F.round((F.col("fr") - F.col("m"))
                             / F.sqrt(F.nullif(F.col("v"), F.lit(0.0))),
                             9),
                     F.lit(0.0)).alias("z")))
    za = z.select(F.col("source").alias("source_a"), "tok",
                  F.col("z").alias("za"))
    zb = z.select(F.col("source").alias("source_b"), "tok",
                  F.col("z").alias("zb"))
    return (za.join(zb, "tok")
            .filter(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg((F.sum(F.round(F.abs(F.col("za") - F.col("zb")), 9)
                        .cast("decimal(30,9)")).cast("double")
                  / F.count(F.lit(1))).alias("burrows_delta")))


@query("text_bigram_entropy_rate", """
WITH arrs AS (SELECT source, string_split(text, ' ') AS a FROM documents),
bg AS (
  SELECT source,
         UNNEST(list_transform(range(1, len(a)), i -> a[i])) AS w1,
         UNNEST(list_transform(range(1, len(a)), i -> a[i + 1])) AS w2
  FROM arrs WHERE len(a) >= 2
),
c12 AS (SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM bg GROUP BY 1, 2, 3),
c1 AS (SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c1
       FROM c12 GROUP BY 1, 2),
n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c12 GROUP BY 1)
SELECT c12.source,
       MAX(n.n) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
       CAST(SUM(CAST(ROUND(
         (0 - (c12.c / CAST(n.n AS DOUBLE)))
           * LN(c12.c / CAST(c1.c1 AS DOUBLE)), 9) AS DECIMAL(30,9)))
         AS DOUBLE) AS entropy_rate
FROM c12
JOIN c1 ON c1.source = c12.source AND c1.w1 = c12.w1
JOIN n ON n.source = c12.source
GROUP BY c12.source
""")
def text_bigram_entropy_rate(spark, sf_dir):
    """BIGRAM ENTROPY RATE per source — the conditional entropy
    H(W2 | W1) = -Σ p(w1,w2) ln p(w2|w1) of the source's token process
    (Shannon's entropy rate under a first-order Markov model): how
    predictable the NEXT token is given the current one. Template
    sources score far below their unigram entropy (the unigram entry
    can't see sequential repetition; this is the signal that catches
    mad-libs boilerplate with shuffled vocabulary). Both probabilities
    are integer-count ratios (c12/n and c12/c1), per-bigram terms
    round-9 then exact-decimal summed. Two combinable aggregations over
    (source, bigram) counts; conditional-context totals join back on
    the (source, w1) key — no corpus-wide state beyond the bigram
    table."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bg = (spread(d.filter(F.size(toks) >= 2))  # r15: one-task scan stage
          .select("source", F.posexplode(
              F.expr("transform(sequence(1, size(split(text, ' ')) - 1),"
                     " i -> struct(element_at(split(text, ' '), i) AS w1,"
                     " element_at(split(text, ' '), i + 1) AS w2))"))
              .alias("p0", "s"))
          .select("source", F.col("s.w1").alias("w1"),
                  F.col("s.w2").alias("w2")))
    c12 = (bg.groupBy("source", "w1", "w2")
           .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
           .transform(materialize))  # feeds c1, n, terms
    c1 = (c12.groupBy("source", "w1")
          .agg(F.sum("c").cast("bigint").alias("c1")))
    n = c12.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    term = F.round(
        (-(F.col("c") / F.col("n").cast("double")))
        * F.log(F.col("c") / F.col("c1").cast("double")), 9)
    return (c12.join(c1, ["source", "w1"]).join(F.broadcast(n), "source")
            .groupBy("source")
            .agg(F.max("n").alias("n_bigrams"),
                 F.count(F.lit(1)).cast("bigint").alias("distinct_bigrams"),
                 F.sum(term.cast("decimal(30,9)")).cast("double")
                 .alias("entropy_rate")))


# ---------------------------------------------------------------------------
# LSH banding parameter planner (round 11)
# ---------------------------------------------------------------------------

_LSH_CONFIGS = [(1, 8), (2, 4), (4, 2)]  # (rows_per_band, n_bands), r*b=8


def _lsh_pow_sql(base: str, n: int) -> str:
    """x^n as an explicit multiplication chain — identical text on both
    engines (library pow() is not cross-engine bit-stable; products of
    the dyadic-rational minhash estimates are exact)."""
    if n == 1:
        return base
    half = _lsh_pow_sql(base, n // 2)
    return f"({half}*{half})"


def _lsh_p_sql(r: int, b: int) -> str:
    xr = _lsh_pow_sql("s", r)
    tb = _lsh_pow_sql(f"(1 - {xr})", b)
    return f"(1 - {tb})"


def _lsh_planner_sql() -> str:
    est_cte = """
, bands AS (
  SELECT doc_id, 0 AS band_idx,
         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS band_hash FROM sigs
  UNION ALL SELECT doc_id, 1,
         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
est AS (
  SELECT ((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END)) / 8.0 AS s
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.doc_a
  JOIN sigs sb ON sb.doc_id = p.doc_b
)"""
    legs = []
    for r, b in _LSH_CONFIGS:
        p = _lsh_p_sql(r, b)
        legs.append(f"""
SELECT CAST({r} AS BIGINT) AS rows_per_band,
       CAST({b} AS BIGINT) AS n_bands,
       CAST(COUNT(*) AS BIGINT) AS n_scored_pairs,
       CAST(SUM(CAST(ROUND({p}, 9) AS DECIMAL(20,9))) AS DOUBLE)
         AS expected_candidates,
       CAST(SUM(CASE WHEN s >= CAST(1 AS DOUBLE) / 2
                     THEN CAST(ROUND(1 - {p}, 9) AS DECIMAL(20,9))
                     ELSE CAST(0 AS DECIMAL(20,9)) END) AS DOUBLE)
         AS expected_missed_ge_half
FROM est""")
    return est_cte + "\nUNION ALL\n".join(legs)


def _lsh_pow_col(x, n: int):
    if n == 1:
        return x
    half = _lsh_pow_col(x, n // 2)
    return half * half


@query("dedup_lsh_param_planner", _MINHASH_SIG_SQL + _lsh_planner_sql())
def dedup_lsh_param_planner(spark, sf_dir):
    """LSH BANDING PARAMETER PLANNER (the s-curve analysis of Leskovec,
    Rajaraman & Ullman, MMDS ch. 3): before re-running a 100 TB dedup
    with a different (rows-per-band r × bands b) split of the same 8
    minhashes, score each configuration against the CORPUS'S OWN
    observed pair-similarity distribution — for every current LSH
    candidate pair with estimated Jaccard s, the probability the config
    would surface it is p = 1-(1-s^r)^b. Reports, per config: the
    expected candidate volume (cost driver: sum of p) and the expected
    mass of s >= 1/2 pairs it would MISS (recall driver: sum of 1-p
    over likely duplicates). r=1 maximizes recall at maximal candidate
    cost; r=4 the reverse — the table makes the trade-off concrete on
    this corpus instead of on the textbook curve.

    Determinism: s is an exact dyadic rational (agreeing hashes / 8),
    p is an explicit multiplication chain (no library pow()), so every
    term is exact in double and cannot sit on a round-9 halfway point
    (dyadic values never end in 5·10^-10); terms round-9 into exact
    decimal sums. Scale: rides the LSH-bounded candidate pair table
    (one materialized banding, see lsh_candidate_pairs) — the planner
    costs one extra combinable aggregation per config over pairs that
    the dedup funnel already enumerates."""
    from arangodb_java_parquet_spark.operators.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_signatures)
    d = t(spark, sf_dir, "documents")
    # materialize once: pairs, sa and sb otherwise re-derive the full
    # shingle+minhash lineage per consumer (non-canonicalizing md5/HOF
    # subtrees -> no ReusedExchange; the r15 3-pass fix)
    sigs = minhash_signatures(
        char_shingles(d, "text", "doc_id", k=5, distinct=False),
        "doc_id").transform(materialize)
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    sa = sigs.select([F.col("doc_id").alias("doc_a")]
                     + [F.col(f"h{j}").alias(f"a{j}") for j in range(8)])
    sb = sigs.select([F.col("doc_id").alias("doc_b")]
                     + [F.col(f"h{j}").alias(f"b{j}") for j in range(8)])
    agree = sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
                for j in range(8))
    est = (pairs.join(sa, "doc_a").join(sb, "doc_b")
           .select((agree / F.lit(8.0)).alias("s"))
           .transform(materialize))  # feeds all three config aggs
    legs = []
    for r, b in _LSH_CONFIGS:
        p = F.lit(1) - _lsh_pow_col(
            F.lit(1) - _lsh_pow_col(F.col("s"), r), b)
        legs.append(est.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored_pairs"),
            F.sum(F.round(p, 9).cast("decimal(20,9)")).cast("double")
            .alias("expected_candidates"),
            F.sum(F.when(F.col("s") >= F.lit(1).cast("double") / 2,
                         F.round(F.lit(1) - p, 9).cast("decimal(20,9)"))
                  .otherwise(F.lit(0).cast("decimal(20,9)")))
            .cast("double").alias("expected_missed_ge_half"))
            .select(F.lit(r).cast("bigint").alias("rows_per_band"),
                    F.lit(b).cast("bigint").alias("n_bands"),
                    "n_scored_pairs", "expected_candidates",
                    "expected_missed_ge_half"))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# query likelihood with Jelinek-Mercer smoothing (round 11)
# ---------------------------------------------------------------------------

@query("ir_query_likelihood_jm", f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total FROM documents),
q AS (SELECT * FROM toks WHERE tok IN ({_BM25_TERMS_SQL})),
cfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM q GROUP BY tok),
qconst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(CAST(ROUND(LN(cf / (2.0e0 * total)), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS bg_const
  FROM cfs CROSS JOIN stats
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM q GROUP BY 1, 2),
corr AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(LN(1 + (CAST(tf.c AS DOUBLE) * total)
                                    / (CAST(cfs.cf AS DOUBLE) * dl.dl)),
                             9) AS DECIMAL(20,9))) AS DOUBLE)
           AS match_part
  FROM tf JOIN cfs USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT dl.doc_id, CAST(dl.dl AS BIGINT) AS dl,
       qc.bg_const + COALESCE(corr.match_part, CAST(0 AS DOUBLE)) AS score
FROM dl
LEFT JOIN corr ON corr.doc_id = dl.doc_id
CROSS JOIN qconst qc
""")
def ir_query_likelihood_jm(spark, sf_dir):
    """Query-likelihood retrieval with JELINEK-MERCER smoothing (Zhai &
    Lafferty 2001), lambda = 1/2 — the interpolation smoother that
    favors verbose queries, completing the smoothing family next to the
    Dirichlet entry (ir_dirichlet_lm_score, which favors short keyword
    queries). Same sparse background-offset decomposition: with
    lambda = 1/2, score(d) = sum_t ln(cf_t / (2|C|)) + sum_(t in d AND
    q) ln(1 + c_td * |C| / (cf_t * dl_d)), so only MATCHING (doc, term)
    pairs shuffle and unmatched docs score from the query constant
    alone — the bounded-postings shape all the lexical rankers here
    share. Determinism: round-9 ln terms in exact decimal sums;
    lambda enters as the integer literal 2 (never a float repr); the
    final score is one addition of identical doubles."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("tok"))
    dl = d.select("doc_id",
                  F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(F.sum(F.size(F.split("text", " "))).cast("bigint")
                  .alias("total"))
    q = toks.filter(F.col("tok").isin(list(_BM25_TERMS)))
    cfs = q.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    qconst = (cfs.crossJoin(F.broadcast(stats))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                   F.sum(F.round(F.log(F.col("cf")
                                       / (F.lit(2.0) * F.col("total"))), 9)
                         .cast("decimal(20,9)")).cast("double")
                   .alias("bg_const")))
    tf = q.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    corr = (tf.join(F.broadcast(cfs), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.sum(F.round(F.log(
                1 + (F.col("c").cast("double") * F.col("total"))
                / (F.col("cf").cast("double") * F.col("dl"))), 9)
                .cast("decimal(20,9)"))
                 .cast("double").alias("match_part")))
    return (dl.join(corr, "doc_id", "left")
            .crossJoin(F.broadcast(qconst))
            .select("doc_id", F.col("dl").cast("bigint").alias("dl"),
                    (F.col("bg_const")
                     + F.coalesce("match_part", F.lit(0).cast("double")))
                    .alias("score")))


# ---------------------------------------------------------------------------
# Yule's K characteristic (vocabulary-richness / repetitiveness index)
# ---------------------------------------------------------------------------

@query("text_yules_k", """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(10000 AS DOUBLE)
         * (CAST(SUM(tf * tf) AS BIGINT) - CAST(SUM(tf) AS BIGINT))
         / (CAST(SUM(tf) AS BIGINT) * CAST(SUM(tf) AS DOUBLE))
         AS yules_k
FROM tf GROUP BY doc_id
""")
def text_yules_k(spark, sf_dir):
    """YULE'S K characteristic (Yule 1944) per document:
    K = 10^4 * (sum_m m^2 V_m - N) / N^2, computed directly from the
    term-frequency table as 10^4 * (sum tf^2 - N) / N^2 — the classic
    length-robust repetitiveness index (higher = more repeated tokens),
    complementing MATTR (window type ratio) and Simpson diversity in the
    quality-signal family: K is the one that is provably insensitive to
    document LENGTH under Yule's urn model, so one threshold works
    across short and long documents. Pure integer moments (tf^2 sums)
    with ONE final IEEE division — no rounding anywhere. Two combinable
    aggregations keyed by doc; corpus tokens never shuffle by token."""
    d = t(spark, sf_dir, "documents")
    tf = (d.select("doc_id",
                   F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    n = F.sum("tf").cast("bigint")
    s2 = F.sum(F.col("tf") * F.col("tf")).cast("bigint")
    return (tf.groupBy("doc_id")
            .agg(n.alias("n_tokens"),
                 F.count(F.lit(1)).cast("bigint").alias("n_types"),
                 (F.lit(10000).cast("double") * (s2 - n)
                  / (n * n.cast("double"))).alias("yules_k")))


# ---------------------------------------------------------------------------
# Heaps' law fit on the vocabulary growth curve (round 12)
# ---------------------------------------------------------------------------

@query("vocab_heaps_law_fit", """
WITH growth AS (
  SELECT thr.n_docs,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM (SELECT UNNEST([100, 200, 300, 400, 500]) AS n_docs) thr
  JOIN (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents) t
    ON t.doc_id < thr.n_docs
  GROUP BY thr.n_docs
),
pts AS (
  SELECT ROUND(LN(CAST(nt AS DOUBLE)), 9) AS x,
         ROUND(LN(CAST(v AS DOUBLE)), 9) AS y
  FROM growth
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(20,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(20,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
           AS sxx,
         CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(20,9))) AS DOUBLE)
           AS sxy
  FROM pts
)
SELECT n AS n_points,
       ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 9) + 0.0
         AS beta,
       ROUND((sy * sxx - sx * sxy) / NULLIF(n * sxx - sx * sx, 0), 9)
         AS ln_k,
       ROUND(exp(ROUND((sy * sxx - sx * sxy)
                       / NULLIF(n * sxx - sx * sx, 0), 9)), 9) AS k_coef
FROM mo
""")
def vocab_heaps_law_fit(spark, sf_dir):
    """HEAPS' LAW FIT (Heaps 1978; Herdan 1960): V = K * N^beta — least
    squares on the (ln N, ln V) points of the vocabulary growth curve
    (the same 5 cumulative prefixes vocab_growth_curve emits). Beta is
    THE number a tokenizer/dedup planner consults: how fast does new
    vocabulary keep arriving as the corpus grows (natural text ~0.5;
    beta near 1 flags an open-ended identifier stream that will blow a
    fixed vocab). Determinism: round-9 ln points, round-9 products,
    exact decimal moments, closed-form slope AND intercept as ratios of
    the same moment expressions (no sequential estimate), round-9
    outputs; exp of a round-9-identical value is round-9 re-fenced (the
    r10-piloted exp rule). Corpus-sized work is one explode + count —
    the growth CTE is the verified vocab_growth_curve shape."""
    d = t(spark, sf_dir, "documents")
    thr = spark.range(1, 6).select((F.col("id") * 100).alias("n_docs"))
    toks = d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("tok"))
    growth = (toks.join(F.broadcast(thr),
                        F.col("doc_id") < F.col("n_docs"))
              .groupBy("n_docs")
              .agg(F.countDistinct("tok").cast("bigint").alias("v"),
                   F.count(F.lit(1)).cast("bigint").alias("nt")))
    pts = growth.select(
        F.round(F.log(F.col("nt").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("v").cast("double")), 9).alias("y"))
    mo = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(20,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,9)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(20,9)"))
        .cast("double").alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(20,9)"))
        .cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    den = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    ln_k = F.round((sy * sxx - sx * sxy) / den, 9)
    return mo.select(
        n.alias("n_points"),
        (F.round((n * sxy - sx * sy) / den, 9) + F.lit(0.0)).alias("beta"),
        ln_k.alias("ln_k"),
        F.round(F.exp(ln_k), 9).alias("k_coef"))


# ---------------------------------------------------------------------------
# query clarity score (round 13)
# ---------------------------------------------------------------------------

@query("ir_query_clarity", f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total_len
          FROM documents),
q AS (SELECT * FROM toks WHERE tok IN ({{terms}})),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM q GROUP BY 1, 2),
dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM q GROUP BY 1),
idf AS (
  SELECT tok,
         LN(1.0 + (CAST(stats.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
           AS idf
  FROM dft CROSS JOIN stats
),
scores AS (
  SELECT tf.doc_id,
         CAST(SUM(CAST(ROUND(
           idf.idf * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                               / (CAST(stats.total_len AS DOUBLE) / stats.n_docs))),
           9) AS DECIMAL(30,9))) AS DOUBLE) AS score
  FROM tf
  JOIN idf USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY 1
),
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM scores
  ) WHERE rn <= 10
),
fb_tf AS (
  SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS tf_fb
  FROM toks t JOIN fb USING (doc_id)
  GROUP BY t.tok
),
fb_len AS (SELECT CAST(SUM(tf_fb) AS BIGINT) AS len_fb FROM fb_tf),
ctf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf_c FROM toks GROUP BY 1),
terms_kl AS (
  SELECT ROUND((f.tf_fb / CAST(l.len_fb AS DOUBLE))
               * ROUND(LN((f.tf_fb * CAST(s.total_len AS DOUBLE))
                          / (CAST(l.len_fb AS DOUBLE) * c.tf_c)), 9), 9)
           AS term
  FROM fb_tf f
  JOIN ctf c USING (tok)
  CROSS JOIN fb_len l CROSS JOIN stats s
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n_fb_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM fb_tf) AS fb_vocab_size,
       (SELECT len_fb FROM fb_len) AS fb_len,
       CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE) AS clarity
FROM terms_kl
""".replace("{terms}", _BM25_TERMS_SQL))
def ir_query_clarity(spark, sf_dir):
    """QUERY CLARITY SCORE (Cronen-Townsend, Zhai & Croft 2002): the KL
    divergence between the feedback-set language model and the corpus
    model, KL = sum_w P(w|FB) ln(P(w|FB)/P(w|C)) over the top-10 BM25
    feedback documents' vocabulary — THE classic pre-retrieval
    performance predictor (an ambiguous query retrieves a feedback set
    that looks like the corpus, clarity ~ 0; a crisp query's feedback
    set concentrates, clarity high). Query-difficulty prediction is
    the triage signal an IR/RAG pipeline runs before trusting a
    retrieval answer. Reuses the value-checked BM25 scorer and the PRF
    entry's feedback construction; both language models are exact
    rational count ratios, the ln ratio is a single-shape round-9
    expression and the KL reduction an exact decimal sum. Corpus-scale
    work: the BM25 pass + one token count; everything after the
    feedback join is bounded by 10 documents' vocabulary."""
    d = t(spark, sf_dir, "documents")
    scores = bm25_scores(d, "text", "doc_id", list(_BM25_TERMS))
    wfb = Window.orderBy(F.desc("score"), "doc_id")
    # materialize the 10-row feedback set ONCE (ADVICE r13): fb fans out
    # to the fb_tf broadcast join AND the n_fb aggregate — without this
    # the corpus-scale BM25 scoring pass would execute twice at action
    # time, contradicting the "one BM25 pass" contract below.
    fb = (scores.withColumn("rn", F.row_number().over(wfb))
          .filter(F.col("rn") <= 10).select("doc_id")
          .transform(materialize))
    toks = (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .transform(materialize))  # corpus counts + feedback leg
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint")
        .alias("total_len"))
    # fb_tf (bounded by 10 documents' vocabulary) feeds three consumers
    # (fb_len, terms_kl, vocab) — materialize so the toks-join+groupBy
    # runs once, not three times.
    fb_tf = (toks.join(F.broadcast(fb), "doc_id")
             .groupBy("tok")
             .agg(F.count(F.lit(1)).cast("bigint").alias("tf_fb"))
             .transform(materialize))
    fb_len = fb_tf.agg(F.sum("tf_fb").cast("bigint").alias("len_fb"))
    ctf = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf_c"))
    # in-plan scalar (a .count() here would run a full extra BM25 job
    # at query-construction time)
    n_fb = fb.agg(F.count(F.lit(1)).cast("bigint").alias("n_fb_docs"))
    lr = F.round(F.log((F.col("tf_fb") * F.col("total_len").cast("double"))
                       / (F.col("len_fb").cast("double") * F.col("tf_c"))),
                 9)
    terms_kl = (fb_tf.join(ctf, "tok")
                .crossJoin(F.broadcast(fb_len))
                .crossJoin(F.broadcast(stats))
                .select(F.round(
                    (F.col("tf_fb") / F.col("len_fb").cast("double")) * lr,
                    9).alias("term")))
    vocab = fb_tf.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    out = terms_kl.agg(
        F.sum(F.col("term").cast("decimal(20,9)")).cast("double")
        .alias("clarity"))
    return (out.crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(fb_len))
            .crossJoin(F.broadcast(n_fb))
            .select("n_fb_docs",
                    F.col("v").alias("fb_vocab_size"),
                    F.col("len_fb").alias("fb_len"), "clarity"))
