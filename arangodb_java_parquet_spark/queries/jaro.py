"""JARO-WINKLER string similarity (Jaro 1989; Winkler 1990) over
blocked part-name pairs — the classic record-linkage comparator the
Fellegi-Sunter entry (`linkage_fellegi_sunter`) and the
Levenshtein-based fuzzy join (`dedup_fuzzy_levenshtein`,
`join_fuzzy_name_match`) sit beside; JW is the comparator the US
Census record-linkage literature standardized on.

Definition (implemented identically on both engines, no library
function — DuckDB's built-in jaro_winkler_similarity is NOT used, so
the oracle checks the ALGORITHM, not a black box):

  m   = # matching chars: equal chars within a window
        w = floor(max(|s|,|t|)/2) − 1, each target position used at
        most once, scanned greedily left-to-right (lowest unused
        position first — the canonical two-pass matching);
  tr  = # positions where the matched subsequences disagree;
  J   = (m/|s| + m/|t| + (m − tr/2)/m) / 3        (0 if m = 0);
  JW  = J + ℓ·p·(1−J),  ℓ = common prefix ≤ 4,  p = 1/10.

Blocking: (p_brand, p_size) equi-join (1.6k pairs at sf0.01 — the
linkage-blocking contract: JW is O(|s|·w) per pair and must only ever
run INSIDE blocks); output = global top-25 pairs by (JW desc, keys).

Determinism ledger: the matching fold's accumulator is a VARCHAR pair
[used-flags string, matched-chars string]; the no-match branch
REBUILDS the list (`|| ''`) — the DuckDB 1.0 list_reduce
identity-return corruption (CLAUDE.md, bisected on
bandit_ucb1_replay). The window scan / transposition count / prefix
length are flattened list_min / list_sum transforms (no nested
folds). All arithmetic is integer-derived doubles (plain divisions,
p = CAST(1 AS DOUBLE)/10) — IEEE-identical, emitted UNROUNDED.
Spark-side empty ranges are F.when-guarded: sequence(a, b) with
a > b DESCENDS in Spark while DuckDB range(a, b+1) is empty.

Scale: the block join is the standard linkage shape (hash-partition
by block key, pairs never leave their block); the per-pair fold is
bounded by name length. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_TOPN = 25

# window-scan: min unused matching position for source char i (999 =
# none); referenced twice (condition + overlay index).
_JMIN = ("list_min(list_transform("
         "CASE WHEN greatest(1, CAST(x[1] AS INTEGER) - w)"
         " <= least(lt, CAST(x[1] AS INTEGER) + w)"
         " THEN range(greatest(1, CAST(x[1] AS INTEGER) - w),"
         " least(lt, CAST(x[1] AS INTEGER) + w) + 1)"
         " ELSE range(1, 1) END, jj -> "
         "CASE WHEN substr(t, jj, 1) = substr(s, CAST(x[1] AS INTEGER), 1)"
         " AND substr(acc[1], jj, 1) = '0' THEN jj ELSE 999 END))")

_STEP = (f"CASE WHEN {_JMIN} < 999 THEN "
         f"[substr(acc[1], 1, {_JMIN} - 1) || '1'"
         f" || substr(acc[1], {_JMIN} + 1, 1000), "
         "acc[2] || substr(s, CAST(x[1] AS INTEGER), 1)] "
         "ELSE [acc[1] || '', acc[2] || ''] END")

_JW_SQL = f"""WITH p AS (
  SELECT p_partkey, p_name, p_brand, p_size FROM part
),
pairs AS (
  SELECT a.p_partkey AS k1, b.p_partkey AS k2,
         a.p_name AS s, b.p_name AS t
  FROM p a JOIN p b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.p_partkey < b.p_partkey
),
calc AS (
  SELECT k1, k2, s, t, len(s) AS ls, len(t) AS lt,
         greatest((greatest(len(s), len(t)) // 2) - 1, 0) AS w
  FROM pairs
),
m1 AS (
  SELECT k1, k2, s, t, ls, lt,
         list_reduce(
           list_prepend([repeat('0', lt), ''],
             list_transform(range(1, ls + 1),
                            ii -> [CAST(ii AS VARCHAR), ''])),
           (acc, x) -> {_STEP}) AS acc
  FROM calc
),
m2 AS (
  SELECT k1, k2, s, t, ls, lt,
         acc[2] AS ms, len(acc[2]) AS m,
         array_to_string(list_transform(range(1, lt + 1), jj ->
           CASE WHEN substr(acc[1], jj, 1) = '1'
                THEN substr(t, jj, 1) ELSE '' END), '') AS mt
  FROM m1
),
m3 AS (
  SELECT k1, k2, s, t, ls, lt, m,
         COALESCE(list_sum(list_transform(range(1, m + 1), kk ->
           CASE WHEN substr(ms, kk, 1) <> substr(mt, kk, 1)
                THEN 1 ELSE 0 END)), 0) AS tr,
         (CASE WHEN COALESCE(list_min(list_transform(
                 range(1, least(least(ls, lt), 4) + 1), pp ->
                 CASE WHEN substr(s, pp, 1) <> substr(t, pp, 1)
                      THEN pp ELSE 999 END)), 999) = 999
               THEN least(least(ls, lt), 4)
               ELSE COALESCE(list_min(list_transform(
                 range(1, least(least(ls, lt), 4) + 1), pp ->
                 CASE WHEN substr(s, pp, 1) <> substr(t, pp, 1)
                      THEN pp ELSE 999 END)), 999) - 1 END) AS pl
  FROM m2
),
scored AS (
  SELECT k1, k2, s, t, CAST(m AS BIGINT) AS m,
         CAST(tr AS BIGINT) AS tr, CAST(pl AS BIGINT) AS prefix_len,
         CASE WHEN m = 0 THEN CAST(0 AS DOUBLE)
              ELSE ((CAST(m AS DOUBLE) / ls + CAST(m AS DOUBLE) / lt
                     + (CAST(m AS DOUBLE) - tr / CAST(2 AS DOUBLE)) / m)
                    / 3)
                   + CAST(pl AS DOUBLE) * (CAST(1 AS DOUBLE) / 10)
                   * (1 - ((CAST(m AS DOUBLE) / ls
                            + CAST(m AS DOUBLE) / lt
                            + (CAST(m AS DOUBLE)
                               - tr / CAST(2 AS DOUBLE)) / m) / 3))
         END AS jw
  FROM m3
)
SELECT k1, k2, s AS name1, t AS name2, m, tr, prefix_len, jw, rn
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY jw DESC, k1, k2) AS rn
      FROM scored)
WHERE rn <= {_TOPN}
"""


@query("dedup_jaro_winkler", _JW_SQL)
def dedup_jaro_winkler(spark, sf_dir):
    """Blocked Jaro-Winkler top-25: (brand, size) equi-join blocking,
    the canonical greedy window matching as a per-pair fold, flattened
    transposition/prefix scans, TakeOrdered output."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size")
    a = p.select(F.col("p_partkey").alias("k1"),
                 F.col("p_name").alias("s"),
                 "p_brand", "p_size")
    b = p.select(F.col("p_partkey").alias("k2"),
                 F.col("p_name").alias("t_"),
                 F.col("p_brand").alias("b2"),
                 F.col("p_size").alias("z2"))
    pairs = (a.join(b, (F.col("p_brand") == F.col("b2"))
                    & (F.col("p_size") == F.col("z2"))
                    & (F.col("k1") < F.col("k2")))
             .select("k1", "k2", "s", "t_"))
    calc = pairs.select(
        "k1", "k2", "s", "t_",
        F.length("s").alias("ls"), F.length("t_").alias("lt"),
        F.greatest(
            F.expr("(greatest(length(s), length(t_)) div 2) - 1"),
            F.lit(0)).alias("w"))
    # A broadcast self-join of a single-file dim emits ONE partition
    # (measured: 160k pairs / 1 task at sf0.1 — the whole matching
    # fold ran single-threaded, 8.4 s). Spread the expensive per-pair
    # fold across the cluster keyed by pair id; at scale the blocking
    # key already partitions this, but a one-file dim needs the
    # explicit spread.
    calc = calc.repartition(32, "k1", "k2")

    sC, tC = F.col("s"), F.col("t_")
    lsC, ltC, wC = F.col("ls"), F.col("lt"), F.col("w")

    def jmin(acc, i):
        lo = F.greatest(F.lit(1), i - wC)
        hi = F.least(ltC, i + wC)
        rng = F.when(lo <= hi, F.sequence(lo, hi)) \
            .otherwise(F.array().cast("array<int>"))
        return F.array_min(F.transform(
            rng,
            lambda jj: F.when(
                (F.substring(tC, jj, F.lit(1))
                 == F.substring(sC, i, F.lit(1)))
                & (F.substring(F.element_at(acc, 1), jj, F.lit(1))
                   == "0"),
                jj).otherwise(F.lit(999))))

    def step(acc, i):
        jm = jmin(acc, i)
        flags = F.element_at(acc, 1)
        upd = F.array(
            F.concat(F.substring(flags, F.lit(1), jm - 1),
                     F.lit("1"),
                     F.substring(flags, jm + 1, F.lit(1000))),
            F.concat(F.element_at(acc, 2),
                     F.substring(sC, i, F.lit(1))))
        keep = F.array(F.concat(flags, F.lit("")),
                       F.concat(F.element_at(acc, 2), F.lit("")))
        return F.when(jm < 999, upd).otherwise(keep)

    m1 = calc.withColumn(
        "acc", F.aggregate(
            F.sequence(F.lit(1), lsC),
            F.array(F.repeat(F.lit("0"), ltC), F.lit("")),
            step))

    msC = F.element_at("acc", 2)
    mC = F.length(msC)
    mtC = F.array_join(F.transform(
        F.sequence(F.lit(1), ltC),
        lambda jj: F.when(
            F.substring(F.element_at("acc", 1), jj, F.lit(1)) == "1",
            F.substring(tC, jj, F.lit(1))).otherwise(F.lit(""))), "")
    m2 = m1.select("k1", "k2", "s", "t_", "ls", "lt",
                   msC.alias("ms"), mC.alias("m"), mtC.alias("mt"))

    trC = F.coalesce(
        F.aggregate(
            F.when(F.col("m") >= 1,
                   F.sequence(F.lit(1), F.col("m")))
            .otherwise(F.array().cast("array<int>")),
            F.lit(0),
            lambda acc2, kk: acc2 + F.when(
                F.substring(F.col("ms"), kk, F.lit(1))
                != F.substring(F.col("mt"), kk, F.lit(1)),
                F.lit(1)).otherwise(F.lit(0))),
        F.lit(0))
    pmax = F.least(F.least(F.col("ls"), F.col("lt")), F.lit(4))
    fmis = F.coalesce(F.array_min(F.transform(
        F.sequence(F.lit(1), pmax),
        lambda pp: F.when(
            F.substring(F.col("s"), pp, F.lit(1))
            != F.substring(F.col("t_"), pp, F.lit(1)),
            pp).otherwise(F.lit(999)))), F.lit(999))
    plC = F.when(fmis == 999, pmax).otherwise(fmis - 1)
    m3 = m2.select("k1", "k2", "s", "t_", "ls", "lt", "m",
                   trC.alias("tr"), plC.alias("pl"))
    md = F.col("m").cast("double")
    jaro = ((md / F.col("ls") + md / F.col("lt")
             + (md - F.col("tr") / F.lit(2).cast("double"))
             / F.col("m")) / F.lit(3))
    jw = F.when(F.col("m") == 0, F.lit(0.0)).otherwise(
        jaro + F.col("pl").cast("double")
        * (F.lit(1).cast("double") / F.lit(10)) * (F.lit(1) - jaro))
    scored = m3.select(
        "k1", "k2", F.col("s").alias("name1"),
        F.col("t_").alias("name2"),
        F.col("m").cast("bigint").alias("m"),
        F.col("tr").cast("bigint").alias("tr"),
        F.col("pl").cast("bigint").alias("prefix_len"),
        jw.alias("jw"))
    w_ = W.orderBy(F.desc("jw"), "k1", "k2")
    return (scored.withColumn("rn", F.row_number().over(w_))
            .filter(F.col("rn") <= _TOPN))
