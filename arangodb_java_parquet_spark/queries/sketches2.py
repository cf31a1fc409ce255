"""MISRA-GRIES HEAVY HITTERS (Misra & Gries 1982; the SpaceSaving/
frequent-items family, Cormode & Hadjieleftheriou VLDB 2008 survey) —
the deterministic frequent-items summary missing from the sketch
family beside count-min (`agg_count_min_sketch`), AMS F2, KMV, HLL
and the GK quantile summary: k counters guarantee every item with
true frequency > N/(k+1) survives, with undercount ≤ N/(k+1).

Construction: one token stream per source (documents concatenated in
doc_id order — the deterministic stream-order contract), folded
through the classic update: increment a live counter, else occupy a
free slot, else decrement ALL counters and drop zeros. The
accumulator is a flat VARCHAR list [item₁, cnt₁, item₂, cnt₂, …]
(items prefixed 't' so a token can never collide with a digit-string
count); every branch REBUILDS the list (the DuckDB 1.0 list_reduce
identity-return corruption, CLAUDE.md). Final counters join back to
the EXACT per-source counts, so the output exposes estimate, truth,
and the N/(k+1) bound side by side — the self-auditing shape of the
CMS entry.

Determinism: everything is integer/string; the bound n/(k+1) is a
BIGINT/INT plain division emitted as DOUBLE. Output keys sorted.

Scale: the per-source fold is sequential by construction (MG is a
STREAM summary — on a cluster the same update runs per partition and
summaries MERGE by counter-wise addition + global decrement; the
single-stream form here is the oracle-checkable contract); the exact
join is one hash aggregate. Sources are independent rows — the fold
parallelizes across sources.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    materialize, query, t)

_K = 8  # counters per source

# fold step over token element x (DuckDB: x = [tok]; enc = 't' || tok)
_MG_STEP = f"""CASE
  WHEN COALESCE(list_position(acc, 't' || x[1]), 0) > 0 THEN
    list_transform(range(1, len(acc) + 1), q ->
      CASE WHEN q = COALESCE(list_position(acc, 't' || x[1]), 0) + 1
           THEN CAST(CAST(acc[q] AS INTEGER) + 1 AS VARCHAR)
           ELSE acc[q] || '' END)
  WHEN len(acc) < {2 * _K} THEN acc || ['t' || x[1], '1']
  ELSE flatten(list_transform(range(1, len(acc) // 2 + 1), pi ->
    CASE WHEN CAST(acc[2 * pi] AS INTEGER) - 1 > 0
         THEN [acc[2 * pi - 1] || '', CAST(CAST(acc[2 * pi] AS INTEGER)
                                           - 1 AS VARCHAR)]
         ELSE [] END))
END"""

_MG_SQL = f"""WITH dt AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
streams AS (
  SELECT source, flatten(list(toks ORDER BY doc_id)) AS stream
  FROM dt GROUP BY source
),
folded AS (
  SELECT source, len(stream) AS n_tokens,
         list_reduce(
           list_prepend([]::VARCHAR[],
                        list_transform(stream, tk -> [tk])),
           (acc, x) -> {_MG_STEP}) AS acc
  FROM streams
),
summary AS (
  SELECT source, n_tokens,
         UNNEST(list_transform(range(1, len(acc) // 2 + 1),
                               i -> acc[2 * i - 1][2:])) AS token,
         UNNEST(list_transform(range(1, len(acc) // 2 + 1),
                               i -> CAST(acc[2 * i] AS BIGINT)))
           AS mg_count
  FROM folded
),
exact AS (
  SELECT source, tok AS token, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY source, tok
)
SELECT s.source, s.token, s.mg_count, e.true_count,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(s.n_tokens AS BIGINT) / CAST({_K + 1} AS DOUBLE)
         AS max_undercount
FROM summary s JOIN exact e
  ON s.source = e.source AND s.token = e.token
ORDER BY s.source, s.token
"""


@query("sketch_misra_gries", _MG_SQL)
def sketch_misra_gries(spark, sf_dir):
    """Per-source Misra-Gries(k=8) heavy hitters with the exact
    counts and the N/(k+1) bound joined alongside. One fold per
    source; sources parallelize."""
    d = t(spark, sf_dir, "documents")
    dt = d.select("doc_id", "source",
                  F.split("text", " ").alias("toks"))
    streams = (dt.groupBy("source")
               .agg(F.flatten(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("doc_id", "toks"))),
                   lambda s: s.getField("toks"))).alias("stream")))

    def step(acc, x):
        enc = F.concat(F.lit("t"), x)
        pos = F.coalesce(F.array_position(acc, enc), F.lit(0))
        inc = F.transform(
            F.sequence(F.lit(1), F.size(acc)),
            lambda q: F.when(
                q == (pos + F.lit(1)).cast("int"),
                (F.element_at(acc, q.cast("int")).cast("int")
                 + F.lit(1)).cast("string"))
            .otherwise(F.concat(F.element_at(acc, q.cast("int")),
                                F.lit(""))))
        add = F.concat(acc, F.array(enc, F.lit("1")))
        dec = F.flatten(F.transform(
            F.sequence(F.lit(1), (F.size(acc) / 2).cast("int")),
            lambda pi: F.when(
                F.element_at(acc, (pi * 2).cast("int")).cast("int")
                - 1 > 0,
                F.array(
                    F.concat(F.element_at(acc, (pi * 2 - 1)
                                          .cast("int")), F.lit("")),
                    (F.element_at(acc, (pi * 2).cast("int"))
                     .cast("int") - 1).cast("string")))
            .otherwise(F.array().cast("array<string>"))))
        return (F.when(pos > 0, inc)
                .when(F.size(acc) < 2 * _K, add)
                .otherwise(dec))

    folded = streams.select(
        "source", F.size("stream").alias("n_tokens"),
        F.aggregate("stream", F.array().cast("array<string>"), step)
        .alias("acc"))
    folded = materialize(folded)  # acc feeds the pair expansion
    summary = (folded.select(
        "source", "n_tokens",
        F.posexplode(F.transform(
            # guard: sequence(1, 0) DESCENDS in Spark; an acc emptied
            # by a full decrement round must yield no pairs
            F.when(F.size("acc") >= 2,
                   F.sequence(F.lit(1),
                              (F.size("acc") / 2).cast("int")))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.struct(
                F.substring(F.element_at("acc", (i * 2 - 1)
                                         .cast("int")),
                            F.lit(2), F.lit(1000)).alias("token"),
                F.element_at("acc", (i * 2).cast("int"))
                .cast("bigint").alias("mg_count"))))
        .alias("pidx", "pair"))
        .select("source", "n_tokens",
                F.col("pair.token").alias("token"),
                F.col("pair.mg_count").alias("mg_count")))
    exact = (d.select("source",
                      F.explode(F.split("text", " ")).alias("token"))
             .groupBy("source", "token")
             .agg(F.count(F.lit(1)).cast("bigint")
                  .alias("true_count")))
    return (summary.join(exact, ["source", "token"])
            .select("source", "token", "mg_count", "true_count",
                    F.col("n_tokens").cast("bigint").alias("n_tokens"),
                    (F.col("n_tokens").cast("bigint")
                     / F.lit(_K + 1).cast("double"))
                    .alias("max_undercount"))
            .orderBy("source", "token"))
