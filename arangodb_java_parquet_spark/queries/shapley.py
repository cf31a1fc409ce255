"""SHAPLEY-VALUE channel attribution (Shapley 1953; Zhao, Mahboobi &
Maldonado 2018, "Shapley Value Methods for Attribution Modeling in
Online Advertising") — the game-theoretic leg of the attribution
family beside last-touch / linear / position-based / time-decay
(`queries/trend.py`).

Model (the family's conversion convention): 'purchase' events are
conversions; a user's JOURNEY is the set of distinct non-purchase
event types touched strictly BEFORE their first purchase. The
coalition value v(S) = number of converting journeys whose touched-set
is a subset of S; the Shapley credit of channel i is

    φ_i = Σ_{S ⊆ N\\{i}} |S|!·(k−1−|S|)!/k! · (v(S∪{i}) − v(S)).

This entry computes the FULL subset enumeration (channel sets as
bitmasks, all 2^k coalitions — k is derived from the data, not
hard-coded), keeping every term INTEGER (counts × factorial weights)
until one final BIGINT / k!-as-DOUBLE division — decimal-exact by
construction. For this additive v the closed form φ_i =
Σ_{R ∋ i} C(R)/|R| holds (each journey splits equally across its
touched channels); the pytest pin verifies the enumeration against
that independent identity.

Portability ledger: DuckDB factorial() returns HUGEINT and
bit_count() TINYINT — both cast to BIGINT (the HUGEINT hash trap);
masks are built with BIGINT shifts (max shift k−1 ≪ 62, inside the
62-usable-bit contract); bitwise & / bit_or are exact on both engines.

Scale: ONE pass over events to per-user (first-purchase, mask) — a
window rank plus a bit_or rollup, both combinable; everything after
is 2^k-row arithmetic (k = #channels, single digits in any real
funnel), broadcast-size at any event volume. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    materialize, query, t)

_SHAPLEY_SQL = """WITH ch AS (
  SELECT channel,
         (CAST(1 AS BIGINT) << (CAST(ROW_NUMBER()
            OVER (ORDER BY channel) AS BIGINT) - 1)) AS bit
  FROM (SELECT DISTINCT event_type AS channel FROM events
        WHERE event_type <> 'purchase')
),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM ch),
fp AS (
  SELECT user_id, ts AS fts, event_id AS fid FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
),
jm AS (
  SELECT e.user_id, BIT_OR(c.bit) AS mask
  FROM events e
  JOIN fp ON e.user_id = fp.user_id
  JOIN ch c ON e.event_type = c.channel
  WHERE (e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id < fp.fid))
  GROUP BY e.user_id
),
cm AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM jm GROUP BY mask),
subs AS (
  SELECT UNNEST(range(0, (SELECT CAST(1 AS BIGINT) << k FROM kk))) AS s
),
vv AS (
  SELECT subs.s, CAST(COALESCE(SUM(cm.c), 0) AS BIGINT) AS v
  FROM subs LEFT JOIN cm ON (cm.mask & subs.s) = cm.mask
  GROUP BY subs.s
),
terms AS (
  SELECT ch.channel,
         CAST(factorial(CAST(bit_count(subs.s) AS INTEGER)) AS BIGINT)
         * CAST(factorial(CAST(kk.k - 1 - bit_count(subs.s) AS INTEGER))
                AS BIGINT)
         * (v1.v - v0.v) AS term
  FROM ch CROSS JOIN kk CROSS JOIN subs
  JOIN vv v0 ON v0.s = subs.s
  JOIN vv v1 ON v1.s = (subs.s | ch.bit)
  WHERE (subs.s & ch.bit) = 0
),
touched AS (
  SELECT ch.channel, CAST(COALESCE(SUM(cm.c), 0) AS BIGINT) AS n_journeys
  FROM ch LEFT JOIN cm ON (cm.mask & ch.bit) <> 0
  GROUP BY ch.channel
)
SELECT t.channel, t.n_journeys,
       CAST(SUM(terms.term) AS BIGINT)
       / (SELECT CAST(CAST(factorial(CAST(k AS INTEGER)) AS BIGINT)
                      AS DOUBLE) FROM kk) AS shapley_phi
FROM terms JOIN touched t ON terms.channel = t.channel
GROUP BY t.channel, t.n_journeys
ORDER BY t.channel
"""


@query("attribution_shapley", _SHAPLEY_SQL)
def attribution_shapley(spark, sf_dir):
    """Exact Shapley attribution by full coalition enumeration: events
    collapse to per-user (first purchase, touched-channel bitmask) in
    one pass; the 2^k coalition lattice, factorial weights and marginal
    contributions are all broadcast-size integer arithmetic with a
    single final division by k!."""
    e = t(spark, sf_dir, "events")
    ch = (e.filter(F.col("event_type") != "purchase")
          .select(F.col("event_type").alias("channel")).distinct()
          .withColumn("idx",
                      F.row_number().over(W.orderBy("channel")) - 1)
          .withColumn("bit", F.expr(
              "shiftleft(CAST(1 AS BIGINT), idx)"))
          .drop("idx"))
    # ch feeds 4 consumers (kk, jm, terms, touched) — materialize the
    # k-row frame so the distinct-scan lineage runs once.
    ch = materialize(ch)
    kk = ch.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    fp = (e.filter(F.col("event_type") == "purchase")
          .withColumn("rn", F.row_number().over(
              W.partitionBy("user_id").orderBy("ts", "event_id")))
          .filter(F.col("rn") == 1)
          .select("user_id", F.col("ts").alias("fts"),
                  F.col("event_id").alias("fid")))
    jm = (e.join(F.broadcast(ch),
                 e["event_type"] == F.col("channel"))
          .join(fp, "user_id")
          .filter((F.col("ts") < F.col("fts"))
                  | ((F.col("ts") == F.col("fts"))
                     & (F.col("event_id") < F.col("fid"))))
          .groupBy("user_id")
          .agg(F.expr("bit_or(bit)").alias("mask")))
    # cm feeds 2 consumers (vv, touched) — materialize so the events
    # scan + first-purchase window + bit_or rollup lineage runs once.
    cm = materialize(jm.groupBy("mask")
                     .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    subs = kk.select(
        F.explode(F.sequence(
            F.lit(0).cast("bigint"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))")
            - 1)).alias("s"))
    vv = (subs.join(cm, (F.col("mask").bitwiseAND(F.col("s"))
                         == F.col("mask")), "left")
          .groupBy("s")
          .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint")
               .alias("v")))
    v0 = vv.select(F.col("s").alias("s0"), F.col("v").alias("va"))
    v1 = vv.select(F.col("s").alias("s1"), F.col("v").alias("vb"))
    wt = (F.factorial(F.expr("bit_count(s)"))
          * F.factorial((F.col("k") - 1
                         - F.expr("bit_count(s)")).cast("int")))
    terms = (ch.crossJoin(F.broadcast(kk)).crossJoin(F.broadcast(subs))
             .filter(F.col("s").bitwiseAND(F.col("bit")) == 0)
             .join(v0, F.col("s0") == F.col("s"))
             .join(v1, F.col("s1") == F.col("s").bitwiseOR(F.col("bit")))
             .select("channel", "k",
                     (wt * (F.col("vb") - F.col("va"))).alias("term")))
    touched = (ch.join(
        cm, F.col("mask").bitwiseAND(F.col("bit")) != 0, "left")
        .groupBy("channel")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint")
             .alias("n_journeys")))
    phi = (terms.groupBy("channel", "k")
           .agg(F.sum("term").cast("bigint").alias("num"))
           .select("channel",
                   (F.col("num")
                    / F.factorial(F.col("k").cast("int"))
                    .cast("double")).alias("shapley_phi")))
    return (phi.join(touched, "channel")
            .select("channel", "n_journeys", "shapley_phi")
            .orderBy("channel"))
