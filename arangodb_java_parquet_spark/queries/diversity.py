"""Generation-diversity and temporal-rhythm profiles (wave r12m).

DISTINCT-n (Li et al. 2016): the fraction of n-gram tokens that are
unique — THE standard diversity readout for generated/synthetic text (a
mode-collapsed generator repeats bigrams; distinct-2 crashes long before
eyeballing does), run here over the corpus as the baseline any synthetic
augmentation must be compared against. CIRCADIAN ENTROPY: the Shannon
entropy of each event type's hour-of-day histogram — bot traffic is
flat (entropy -> ln 24), human traffic is peaked; the cheap
behavioral-authenticity signal for event streams.

Determinism: n-gram totals/distincts are exact integers (bounded
position expansion, no self-joins); the 24-term entropy reduction is a
round-9-fenced decimal sum over exact-rational shares.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import query, t

# ---------------------------------------------------------------------------
# distinct-n diversity over the corpus (n = 1, 2, 3)
# ---------------------------------------------------------------------------


def _dn_leg_sql(n: int) -> str:
    # Position bound derived FROM THE DATA (range(1, nt-(n-1)+1) per doc),
    # never a fixed literal: a regenerated testdata set with longer
    # documents must not silently undercount grams on the oracle side.
    gram = " || ' ' || ".join(f"l[i + {j}]" for j in range(n))
    return f"""
SELECT {n} AS n,
       CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       COUNT(DISTINCT gram) / CAST(COUNT(*) AS DOUBLE) AS distinct_ratio
FROM (
  SELECT {gram} AS gram
  FROM (
    SELECT UNNEST(range(1, greatest(nt - {n - 1}, 0) + 1)) AS i, l
    FROM (SELECT string_split(text, ' ') AS l,
                 len(string_split(text, ' ')) AS nt FROM documents)
  )
)"""


_DN_SQL = "\nUNION ALL\n".join(_dn_leg_sql(n) for n in (1, 2, 3))


@query("text_distinct_n", _DN_SQL)
def text_distinct_n(spark, sf_dir):
    """DISTINCT-n (Li et al. 2016, "A Diversity-Promoting Objective"):
    distinct n-grams / total n-grams for n = 1, 2, 3 over the corpus —
    the standard lexical-diversity readout for synthetic/generated
    text (mode collapse crashes distinct-2 long before humans notice
    repetition); computed on the real corpus it is the baseline any
    synthetic augmentation batch must be held against before mixing
    in. N-grams come from a bounded position expansion per document
    (the posexplode idiom — token positions joined against a constant
    range, never a self-join), totals and distinct counts are exact
    integers, the ratio an exact-rational double. Three combinable
    legs; the distinct shuffles on the bounded n-gram vocabulary."""
    d = t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    base = d.select(arr.alias("l"), F.size(arr).alias("nt"))
    out = None
    for n in (1, 2, 3):
        parts = [F.element_at("l", (F.col("i") + j).cast("int"))
                 for j in range(n)]
        gram = parts[0] if n == 1 else F.concat_ws(" ", *parts)
        # Spark sequence(start, stop) DESCENDS when stop < start, so a
        # doc shorter than n would emit position 0 — guard the length
        # first (the SQL side's u.i <= nt - (n-1) bound).
        grams = (base.filter(F.col("nt") >= n)
                 .select(F.explode(
                     F.sequence(F.lit(1), F.col("nt") - (n - 1)))
                     .alias("i"), "l")
                 .select(gram.alias("gram")))
        leg = grams.agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.countDistinct("gram").cast("bigint")
            .alias("distinct_ngrams")).select(
            F.lit(n).alias("n"), "total_ngrams", "distinct_ngrams",
            (F.col("distinct_ngrams")
             / F.col("total_ngrams").cast("double"))
            .alias("distinct_ratio"))
        out = leg if out is None else out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# circadian entropy of each event type's hour-of-day histogram
# ---------------------------------------------------------------------------

_CIRC_SQL = """
WITH h AS (
  SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1
),
terms AS (
  SELECT h.event_type, t.n, h.hr, h.c,
         ROUND(-(h.c / CAST(t.n AS DOUBLE))
               * ln(h.c / CAST(t.n AS DOUBLE)), 9) AS term
  FROM h JOIN tot t ON t.event_type = h.event_type
),
peak AS (
  SELECT event_type, hr AS peak_hour, c AS peak_count
  FROM (SELECT event_type, hr, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, hr) AS rk
        FROM h)
  WHERE rk = 1
)
SELECT x.event_type, MAX(x.n) AS n_events,
       CAST(SUM(CAST(x.term AS DECIMAL(20,9))) AS DOUBLE)
         AS circadian_entropy,
       ROUND(CAST(SUM(CAST(x.term AS DECIMAL(20,9))) AS DOUBLE)
             / ln(CAST(24 AS DOUBLE)), 9) AS entropy_norm,
       MAX(p.peak_hour) AS peak_hour,
       MAX(p.peak_count) / CAST(MAX(x.n) AS DOUBLE) AS peak_share
FROM terms x JOIN peak p ON p.event_type = x.event_type
GROUP BY x.event_type
"""


@query("event_circadian_entropy", _CIRC_SQL)
def event_circadian_entropy(spark, sf_dir):
    """CIRCADIAN ENTROPY per event type: Shannon entropy of the
    hour-of-day histogram, normalized by ln 24, plus the peak hour and
    its share — the behavioral-authenticity screen for event streams
    (organic human activity is day-night peaked, entropy_norm well
    below 1; scripted/bot traffic is flat, entropy_norm -> 1), the
    same "too uniform to be human" logic the Benford audit applies to
    amounts. Hour counts are exact integers from one combinable
    rollup (UTC-pinned timestamps via queries.common.t), shares are
    exact rationals, the <=24-term entropy reduction is a round-9
    decimal sum, and the peak is an integer-ordered top-1 with an
    hour tiebreak."""
    ev = t(spark, sf_dir, "events")
    h = (ev.groupBy("event_type",
                    F.hour(F.col("ts").cast("timestamp")).alias("hr"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
         .transform(materialize))  # feeds totals, terms, peak
    tot = h.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"))
    p_ = F.col("c") / F.col("n").cast("double")
    terms = (h.join(tot, "event_type")
             .select("event_type", "n", "hr", "c",
                     F.round(-p_ * F.log(p_), 9).alias("term")))
    peak = (h.withColumn("rk", F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("c"), "hr")))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("hr").alias("peak_hour"),
                F.col("c").alias("peak_count")))
    ent = F.sum(F.col("term").cast("decimal(20,9)")).cast("double")
    return (terms.join(peak, "event_type")
            .groupBy("event_type")
            .agg(F.max("n").alias("n_events"),
                 ent.alias("circadian_entropy"),
                 F.round(ent / F.log(F.lit(24.0)), 9).alias("entropy_norm"),
                 F.max("peak_hour").alias("peak_hour"),
                 (F.max("peak_count") / F.max("n").cast("double"))
                 .alias("peak_share")))
