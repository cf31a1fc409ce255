"""Corpus-linguistics statistics for tokenizer/mixture planning (r12f).

Four more first-class text-pipeline numbers: tokenizer FERTILITY per
language (how many subword units a whitespace word costs — the metric
that decides per-language token budgets in a multilingual mix), the
PARTIAL correlation between length signals controlling for a third (are
chars and tokens related beyond what word length explains), Church-Gale
ADAPTATION (the burstiness law: a word that appeared once in a document
is far likelier to appear again — the reason naive unigram LMs mis-score
documents), and Monroe et al.'s Dirichlet log-odds "FIGHTIN' WORDS"
keyness between the two largest sources (the variance-stabilized
replacement for chi-square keyness on sparse counts).

Determinism: token/char counts, document frequencies, and all moments are
exact BIGINT sums; subword counts use a FIXED 4-char-chunk segmentation
(ceil(len/4), integer arithmetic — a disclosed deterministic proxy for a
real BPE vocabulary, which is environment-dependent); the only
transcendentals are round-9-fenced logarithms on bit-identical operands.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# tokenizer fertility per language (subword units per whitespace word)
# ---------------------------------------------------------------------------

_FERT_SQL = """
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> (length(w) + 3) // 4))
              AS BIGINT) AS n_subwords
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
       SUM(n_subwords) / CAST(SUM(n_words) AS DOUBLE) AS fertility,
       SUM(n_chars) / CAST(SUM(n_words) AS DOUBLE) AS chars_per_word
FROM per_doc
GROUP BY lang
"""


@query("token_fertility_by_lang", _FERT_SQL)
def token_fertility_by_lang(spark, sf_dir):
    """TOKENIZER FERTILITY per language: subword units per whitespace
    word (and chars per word), the number that says how much more of
    the fixed token budget each language consumes per word — the core
    input to per-language sampling temperatures in a multilingual mix
    (a language with 1.8x fertility gets 1.8x fewer words for the same
    token count). Subword segmentation is the deterministic fixed
    4-char-chunk proxy ceil(len/4) (a real learned BPE is an artifact,
    not a function; the bpe_* entries fit one — this entry is the
    budget arithmetic on top). All counts are exact integer HOF sums
    per document then exact bigint rollups; the two ratios are exact-
    rational double divisions. One combinable aggregation."""
    d = t(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_words"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr("CAST(aggregate(split(text, ' '), 0L, "
               "(acc, w) -> acc + (length(w) + 3) div 4) AS BIGINT)")
        .alias("n_subwords"))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_words").cast("bigint").alias("n_words"),
                 F.sum("n_subwords").cast("bigint").alias("n_subwords"),
                 F.sum("n_chars").cast("bigint").alias("sc"))
            .select("lang", "n_docs", "n_words", "n_subwords",
                    (F.col("n_subwords") / F.col("n_words").cast("double"))
                    .alias("fertility"),
                    (F.col("sc") / F.col("n_words").cast("double"))
                    .alias("chars_per_word")))


# ---------------------------------------------------------------------------
# partial correlation: chars ~ tokens controlling for max word length
# ---------------------------------------------------------------------------

_PCORR_SQL = """
WITH v AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y,
         CAST(list_max(list_transform(string_split(text, ' '),
                                      w -> length(w))) AS BIGINT) AS z
  FROM documents
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(z * z) AS BIGINT) AS szz,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * z) AS BIGINT) AS sxz,
         CAST(SUM(y * z) AS BIGINT) AS syz
  FROM v
),
r AS (
  SELECT n,
         (n * sxy - sx * sy)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * (n * syy - sy * sy)) AS rxy,
         (n * sxz - sx * sz)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * (n * szz - sz * sz)) AS rxz,
         (n * syz - sy * sz)
           / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                  * (n * szz - sz * sz)) AS ryz
  FROM m
)
SELECT n AS n_docs, rxy AS r_chars_tokens, rxz AS r_chars_maxw,
       ryz AS r_tokens_maxw,
       (rxy - rxz * ryz)
         / NULLIF(sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 0)
         AS partial_r_given_maxw
FROM r
"""


@query("stats_partial_correlation", _PCORR_SQL)
def stats_partial_correlation(spark, sf_dir):
    """PARTIAL CORRELATION r_xy.z = (r_xy - r_xz r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)): the association between document chars
    and token count CONTROLLING for the longest word — the
    confound-removal primitive behind every "is this quality signal
    independent?" question when building composite filters (two gates
    with high partial correlation are redundant; the composite-gate
    entry should not double-count them). All three signals are
    integers (the max word length via an integer HOF), so all nine
    moments are exact bigint sums in ONE combinable aggregation; the
    three pairwise correlations and the partial are straight-line IEEE
    on identical operands (the n*Sxy - SxSy differences stay in exact
    bigint range through sf1)."""
    d = t(spark, sf_dir, "documents")
    v = d.select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
        F.expr("CAST(array_max(transform(split(text, ' '), "
               "w -> length(w))) AS BIGINT)").alias("z"))
    m = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("bigint").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("bigint").alias("syz"))
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return ((n * F.col(sab) - F.col(sa) * F.col(sb))
                / F.sqrt((n * F.col(saa) - F.col(sa) * F.col(sa))
                         .cast("double")
                         * (n * F.col(sbb) - F.col(sb) * F.col(sb))))

    r = m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"))
    part = ((F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.nullif(F.sqrt((1 - F.col("rxz") * F.col("rxz"))
                              * (1 - F.col("ryz") * F.col("ryz"))),
                       F.lit(0.0)))
    return r.select(
        F.col("n").alias("n_docs"),
        F.col("rxy").alias("r_chars_tokens"),
        F.col("rxz").alias("r_chars_maxw"),
        F.col("ryz").alias("r_tokens_maxw"),
        part.alias("partial_r_given_maxw"))


# ---------------------------------------------------------------------------
# Church-Gale adaptation: P(token in 2nd half | token in 1st half)
# ---------------------------------------------------------------------------

_ADAPT_TOPK = 50

_ADAPT_SQL = f"""
WITH arrs AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         len(string_split(text, ' ')) AS n
  FROM documents
),
halved AS (
  SELECT doc_id, l[1 : n // 2] AS first_half,
         l[n // 2 + 1 : n] AS second_half
  FROM arrs WHERE n >= 2
),
f AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, UNNEST(first_half) AS tok FROM halved)
),
s AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, UNNEST(second_half) AS tok FROM halved)
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM halved),
df1 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS d1 FROM f GROUP BY tok),
df2 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS d2 FROM s GROUP BY tok),
dboth AS (
  SELECT f.tok, CAST(COUNT(*) AS BIGINT) AS db
  FROM f JOIN s ON s.doc_id = f.doc_id AND s.tok = f.tok
  GROUP BY f.tok
),
joined AS (
  SELECT df1.tok, df1.d1, COALESCE(df2.d2, 0) AS d2,
         COALESCE(dboth.db, 0) AS db, nn.n_docs
  FROM df1
  LEFT JOIN df2 ON df2.tok = df1.tok
  LEFT JOIN dboth ON dboth.tok = df1.tok
  CROSS JOIN nn
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY d1 DESC, tok) AS rk
  FROM joined WHERE d1 >= 5
)
SELECT tok, d1 AS df_first, CAST(d2 AS BIGINT) AS df_second,
       CAST(db AS BIGINT) AS df_both,
       db / CAST(d1 AS DOUBLE) AS adaptation,
       d2 / CAST(n_docs AS DOUBLE) AS prior,
       (db * n_docs) / (CAST(d1 AS DOUBLE) * NULLIF(d2, 0)) AS boost
FROM ranked WHERE rk <= {_ADAPT_TOPK}
"""


@query("token_adaptation_churchgale", _ADAPT_SQL)
def token_adaptation_churchgale(spark, sf_dir):
    """CHURCH-GALE ADAPTATION (Church 2000, "Empirical estimates of
    adaptation"): split every document positionally in half; for each
    frequent token compare P(appears in 2nd half | appeared in 1st
    half) against the prior P(appears in 2nd half) — the boost ratio
    quantifies BURSTINESS (real content words adapt 5-10x; function
    words barely adapt), the property that breaks bag-of-words
    independence assumptions and motivates per-document dedup before
    LM scoring. Halves are exact array slices (both engines 1-based,
    the repo's inclusive-slice rule), presence sets are DISTINCT
    (doc, token) projections, and every output is an exact integer
    document-frequency ratio — no float reductions at all. Top-50 by
    first-half document frequency with a token tiebreak."""
    d = t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    arrs = d.select("doc_id", arr.alias("l"), F.size(arr).alias("n"))
    h = F.expr("n div 2")
    halved = (arrs.filter(F.col("n") >= 2)
              .select("doc_id",
                      F.slice(F.col("l"), F.lit(1), h).alias("first_half"),
                      F.slice(F.col("l"), h + 1, F.col("n") - h)
                      .alias("second_half"))
              .transform(materialize))  # feeds f, s and the count
    f = (halved.select("doc_id", F.explode("first_half").alias("tok"))
         .distinct())
    s = (halved.select("doc_id", F.explode("second_half").alias("tok"))
         .distinct())
    nn = halved.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    df1 = f.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("d1"))
    df2 = s.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("d2"))
    dboth = (f.join(s, ["doc_id", "tok"])
             .groupBy("tok").agg(F.count(F.lit(1)).cast("bigint")
                                 .alias("db")))
    joined = (df1.join(df2, "tok", "left").join(dboth, "tok", "left")
              .select("tok", "d1",
                      F.coalesce(F.col("d2"), F.lit(0)).alias("d2"),
                      F.coalesce(F.col("db"), F.lit(0)).alias("db"))
              .crossJoin(F.broadcast(nn)))
    ranked = (joined.filter(F.col("d1") >= 5)
              .withColumn("rk", F.row_number().over(
                  W.orderBy(F.desc("d1"), "tok"))))
    return (ranked.filter(F.col("rk") <= _ADAPT_TOPK)
            .select("tok", F.col("d1").alias("df_first"),
                    F.col("d2").cast("bigint").alias("df_second"),
                    F.col("db").cast("bigint").alias("df_both"),
                    (F.col("db") / F.col("d1").cast("double"))
                    .alias("adaptation"),
                    (F.col("d2") / F.col("n_docs").cast("double"))
                    .alias("prior"),
                    ((F.col("db") * F.col("n_docs"))
                     / (F.col("d1").cast("double")
                        * F.nullif(F.col("d2"), F.lit(0))))
                    .alias("boost")))


# ---------------------------------------------------------------------------
# Fightin' Words: Dirichlet-smoothed log-odds keyness, top-2 sources
# ---------------------------------------------------------------------------

_FW_A0 = 100  # total Dirichlet prior mass, split proportional to frequency
_FW_TOPK = 20
_FW_MIN = 10  # minimum combined count for a token to be scored

_FW_SQL = f"""
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
stot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM toks GROUP BY source
),
top2 AS (
  SELECT source, n_toks,
         ROW_NUMBER() OVER (ORDER BY n_toks DESC, source) AS g
  FROM stot QUALIFY g <= 2
),
counts AS (
  SELECT t.tok,
         CAST(SUM(CASE WHEN p.g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
         CAST(SUM(CASE WHEN p.g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS y2
  FROM toks t JOIN top2 p ON p.source = t.source
  GROUP BY t.tok
),
ns AS (
  SELECT MAX(CASE WHEN g = 1 THEN n_toks END) AS n1,
         MAX(CASE WHEN g = 2 THEN n_toks END) AS n2,
         MAX(CASE WHEN g = 1 THEN source END) AS src1,
         MAX(CASE WHEN g = 2 THEN source END) AS src2
  FROM top2
),
scored AS (
  SELECT c.tok, c.y1, c.y2, ns.src1, ns.src2,
         ROUND(ln((c.y1 + CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                          / (ns.n1 + ns.n2))
                  / (ns.n1 + {_FW_A0} - c.y1
                     - CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                       / (ns.n1 + ns.n2))), 9)
         - ROUND(ln((c.y2 + CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                            / (ns.n1 + ns.n2))
                    / (ns.n2 + {_FW_A0} - c.y2
                       - CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                         / (ns.n1 + ns.n2))), 9) AS delta,
         1 / (c.y1 + CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                     / (ns.n1 + ns.n2))
         + 1 / (c.y2 + CAST({_FW_A0} AS DOUBLE) * (c.y1 + c.y2)
                       / (ns.n1 + ns.n2)) AS var
  FROM counts c CROSS JOIN ns
  WHERE c.y1 + c.y2 >= {_FW_MIN}
),
zs AS (
  SELECT tok, src1, src2, y1, y2, delta, delta / sqrt(var) AS z,
         ROW_NUMBER() OVER (ORDER BY ABS(delta / sqrt(var)) DESC, tok)
           AS rk
  FROM scored
)
SELECT tok, src1, src2, y1, y2, delta AS delta_lor, z AS z_score
FROM zs WHERE rk <= {_FW_TOPK}
"""


@query("text_fightin_words", _FW_SQL)
def text_fightin_words(spark, sf_dir):
    """FIGHTIN' WORDS (Monroe, Colaresi & Quinn 2008): Dirichlet-
    smoothed log-odds-ratio keyness between the corpus's two largest
    sources, with the z-standardization delta/sqrt(1/(y1+a)+1/(y2+a))
    — the variance-stabilized replacement for chi-square keyness that
    does not over-rank rare tokens (the known failure of raw
    chi2/LLR keyness on sparse counts; complements text_chi2_keyness).
    The prior splits a0=100 pseudo-counts proportional to overall
    frequency (the paper's informative prior). Counts and totals are
    exact integers; the two log terms are round-9 fenced and their
    difference, the variance, and z are straight-line IEEE on
    identical operands; top-20 |z| with token tiebreak. One token
    rollup + a broadcast scalar cross."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("source",
                    F.explode(F.split(F.col("text"), " ")).alias("tok"))
    stot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks"))
    top2 = (stot.withColumn(
        "g", F.row_number().over(W.orderBy(F.desc("n_toks"), "source")))
        .filter(F.col("g") <= 2))
    counts = (toks.join(F.broadcast(top2), "source")
              .groupBy("tok")
              .agg(F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
                   .cast("bigint").alias("y1"),
                   F.sum(F.when(F.col("g") == 2, 1).otherwise(0))
                   .cast("bigint").alias("y2")))
    ns = top2.agg(
        F.max(F.when(F.col("g") == 1, F.col("n_toks"))).alias("n1"),
        F.max(F.when(F.col("g") == 2, F.col("n_toks"))).alias("n2"),
        F.max(F.when(F.col("g") == 1, F.col("source"))).alias("src1"),
        F.max(F.when(F.col("g") == 2, F.col("source"))).alias("src2"))
    aw = (F.lit(float(_FW_A0)) * (F.col("y1") + F.col("y2"))
          / (F.col("n1") + F.col("n2")))
    t1 = F.round(F.log((F.col("y1") + aw)
                       / (F.col("n1") + _FW_A0 - F.col("y1") - aw)), 9)
    t2 = F.round(F.log((F.col("y2") + aw)
                       / (F.col("n2") + _FW_A0 - F.col("y2") - aw)), 9)
    var = 1 / (F.col("y1") + aw) + 1 / (F.col("y2") + aw)
    scored = (counts.crossJoin(F.broadcast(ns))
              .filter(F.col("y1") + F.col("y2") >= _FW_MIN)
              .select("tok", "y1", "y2", "src1", "src2",
                      (t1 - t2).alias("delta"), var.alias("var")))
    z = F.col("delta") / F.sqrt(F.col("var"))
    zs = scored.withColumn("z", z).withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc(F.abs(F.col("z"))),
                                            "tok")))
    return (zs.filter(F.col("rk") <= _FW_TOPK)
            .select("tok", "src1", "src2", "y1", "y2",
                    F.col("delta").alias("delta_lor"),
                    F.col("z").alias("z_score")))
