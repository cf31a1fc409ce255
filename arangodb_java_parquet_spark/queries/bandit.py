"""OFFLINE BANDIT POLICY EVALUATION by REPLAY (Li, Chu, Langford &
Wang, WSDM 2011, "Unbiased Offline Evaluation of Contextual-bandit-
based News Article Recommendation Algorithms") for the UCB1 policy
(Auer, Cesa-Bianchi & Fischer 2002) — the sequential-decision leg of
the user-behavior family beside the Markov chains and the HMM
decoder.

Replay method: walk each user's logged event stream in time order;
at every logged event the CANDIDATE policy picks an arm (arm = the
event type, reward = [value > corpus lower-median]); only when the
policy's pick MATCHES the logged arm does the round count — the
matched subsequence is an unbiased sample of on-policy behavior.
UCB1: play each unplayed arm once (lowest index first), then
argmax_a  mean_a + sqrt(2·ln(T)/n_a)  with T = matched rounds + 1;
ties break to the lowest arm index (strict > scan in index order).

Determinism ledger: rewards are exact 0/1 doubles (median = exact
rank selection, the Viterbi-entry pattern); arm means are
integer-valued-double ratios (IEEE-identical); ln(T) is
round(ln(integer), 9) (the ln pilot class); sqrt is correctly
rounded per IEEE-754 on both engines; the argmax compares
bit-identical doubles. The whole per-user replay is ONE aggregate()
fold (accumulator = [matched, reward_sum, n_1..k, s_1..k] as a
2+2k DOUBLE list, k data-derived) with the unplayed-scan and the
UCB argmax as transform + array_min/array_max expressions — NOT
nested folds: DuckDB 1.0 corrupts a list_reduce nested inside a
list_reduce lambda on multi-row vectors (see the fragment comment).
CTR is emitted UNROUNDED with a NULLIF-guarded denominator.

Scale: one shuffle to (user, ordered [arm, reward] list); the replay
is per-row map-side work linear in stream length × k. The arm table
is a k-row broadcast. No driver collect.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    materialize, query, t)

_MAXU = 150  # bound the output: users 0..149

# SQL fragments over the fold accumulator `acc` (1-based):
#   acc[1] matched, acc[2] reward sum, acc[2+a] n_a, acc[2+k+a] s_a.
#
# DuckDB 1.0 list_reduce CORRUPTION (bisected here, r15): when the
# fold lambda can return the accumulator UNCHANGED (`ELSE acc`) and
# the folded lists in the row-vector have VARIABLE lengths, rows'
# accumulators cross-contaminate (user 7's 81-step fold returned the
# untouched seed in a 150-row batch; 132/150 wrong in a synthetic;
# single-row and fixed-length batches are correct). Fix: the no-match
# branch REBUILDS the list (`list_transform(acc, ee -> ee + 0)`) —
# 0/150 wrong after. The unplayed-scan and the UCB argmax are also
# expressed with list_transform + list_min/list_max (not nested
# folds): argmax = the LOWEST index attaining the max score —
# identical tie semantics to a strict-> ascending scan.
_MZ = ("list_min(list_transform(range(1, k + 1), za -> "
       "CASE WHEN acc[2 + za] = 0 THEN CAST(za AS DOUBLE)"
       " ELSE CAST(99 AS DOUBLE) END))")

_SL = ("list_transform(range(1, k + 1), sa -> "
       "acc[2 + k + sa] / acc[2 + sa]"
       " + sqrt(2 * round(ln(acc[1] + 1), 9) / acc[2 + sa]))")

_AM = (f"list_min(list_transform(range(1, k + 1), ma -> "
       f"CASE WHEN ({_SL})[ma] = list_max({_SL})"
       f" THEN CAST(ma AS DOUBLE) ELSE CAST(99 AS DOUBLE) END))")

_CHOSEN = f"CASE WHEN {_MZ} < 90 THEN {_MZ} ELSE {_AM} END"

_STEP = (f"CASE WHEN {_CHOSEN} = x[1] THEN "
         "[acc[1] + 1, acc[2] + x[2]]"
         " || list_transform(range(1, k + 1), ua ->"
         " acc[2 + ua] + CASE WHEN CAST(ua AS DOUBLE) = x[1]"
         " THEN 1 ELSE 0 END)"
         " || list_transform(range(1, k + 1), ub ->"
         " acc[2 + k + ub] + CASE WHEN CAST(ub AS DOUBLE) = x[1]"
         " THEN x[2] ELSE 0 END)"
         # identity-return `ELSE acc` is the DuckDB 1.0
         # list_reduce corruption trigger (see below): the
         # no-match branch must REBUILD the accumulator.
         " ELSE list_transform(acc, ee -> ee + 0) END")

_UCB_SQL = f"""WITH ev AS (
  SELECT user_id, ts, event_id, event_type, value FROM events
  WHERE user_id < {_MAXU}
),
med AS (
  SELECT v AS med FROM (
    SELECT value AS v,
           ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk,
           COUNT(*) OVER () AS n
    FROM ev) WHERE rk = (n + 1) // 2
),
arms AS (
  SELECT event_type AS arm,
         CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS ai
  FROM (SELECT DISTINCT event_type FROM ev)
),
kk AS (SELECT CAST(COUNT(*) AS INTEGER) AS k FROM arms),
obs AS (
  SELECT e.user_id,
         list([CAST(a.ai AS DOUBLE),
               CASE WHEN e.value > m.med THEN CAST(1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END]
              ORDER BY e.ts, e.event_id) AS os
  FROM ev e JOIN arms a ON e.event_type = a.arm CROSS JOIN med m
  GROUP BY e.user_id
),
run AS (
  SELECT user_id, len(os) AS n,
         list_reduce(
           list_prepend(list_transform(range(1, 3 + 2 * k),
                                       zz -> CAST(0 AS DOUBLE)),
                        os),
           (acc, x) -> {_STEP}) AS acc
  FROM obs CROSS JOIN kk
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(acc[1] AS BIGINT) AS n_matched,
       CAST(acc[2] AS BIGINT) AS total_reward,
       array_to_string(list_transform(range(1, k + 1), pa ->
         CAST(CAST(acc[2 + pa] AS BIGINT) AS VARCHAR)), '-')
         AS arm_pulls,
       acc[2] / NULLIF(acc[1], 0) AS replay_ctr
FROM run CROSS JOIN kk
ORDER BY user_id
"""


@query("bandit_ucb1_replay", _UCB_SQL)
def bandit_ucb1_replay(spark, sf_dir):
    """Per-user UCB1 replay: one shuffle to ordered (arm, reward)
    lists, then the matched-round simulation as a per-row fold with
    nested unplayed-scan / argmax folds. See module docstring."""
    e = (t(spark, sf_dir, "events")
         .filter(F.col("user_id") < _MAXU)
         .select("user_id", "ts", "event_id", "event_type", "value"))
    wmed = W.orderBy("value", "event_id")
    med = (e.select(F.col("value").alias("v"),
                    F.row_number().over(wmed).alias("rk"),
                    F.count(F.lit(1)).over(
                        W.partitionBy(F.lit(1))).alias("n"))
           .filter(F.col("rk") == F.expr("(n + 1) div 2"))
           .select(F.col("v").alias("med")))
    arms = (e.select(F.col("event_type").alias("arm")).distinct()
            .withColumn("ai", F.row_number().over(W.orderBy("arm"))
                        .cast("bigint")))
    arms = materialize(arms)
    kk = arms.agg(F.count(F.lit(1)).cast("int").alias("k"))
    obs = (e.join(F.broadcast(arms),
                  e["event_type"] == F.col("arm"))
           .crossJoin(F.broadcast(med))
           .select("user_id",
                   F.struct(
                       "ts", "event_id",
                       F.array(F.col("ai").cast("double"),
                               F.when(F.col("value") > F.col("med"),
                                      F.lit(1.0)).otherwise(F.lit(0.0)))
                       .alias("ar")).alias("rec"))
           .groupBy("user_id")
           .agg(F.transform(F.array_sort(F.collect_list("rec")),
                            lambda r: r.getField("ar")).alias("os")))

    # No nested aggregate() inside the outer fold's lambda — mirrors
    # the DuckDB 1.0 nested-list_reduce corruption workaround (see the
    # SQL fragment comment): unplayed-scan and argmax via transform +
    # array_min/array_max, argmax = lowest index attaining the max.
    def mz(acc, k):
        return F.array_min(F.transform(
            F.sequence(F.lit(1), k),
            lambda za: F.when(
                F.element_at(acc, (za + F.lit(2)).cast("int")) == 0,
                za.cast("double")).otherwise(F.lit(99.0))))

    def scores(acc, k):
        def sc(sa):
            n_a = F.element_at(acc, (sa + F.lit(2)).cast("int"))
            s_a = F.element_at(acc, (sa + F.lit(2) + k).cast("int"))
            return (s_a / n_a
                    + F.sqrt(F.lit(2)
                             * F.round(F.log(F.element_at(acc, 1)
                                             + F.lit(1)), 9) / n_a))
        return F.transform(F.sequence(F.lit(1), k), sc)

    def am(acc, k):
        sl = scores(acc, k)
        mx = F.array_max(scores(acc, k))
        return F.array_min(F.transform(
            F.sequence(F.lit(1), k),
            lambda ma: F.when(
                F.element_at(sl, ma.cast("int")) == mx,
                ma.cast("double")).otherwise(F.lit(99.0))))

    def step_fn(kcol):
        def step(acc, x):
            chosen = F.when(mz(acc, kcol) < 90, mz(acc, kcol)) \
                .otherwise(am(acc, kcol))
            upd = F.concat(
                F.array(F.element_at(acc, 1) + F.lit(1),
                        F.element_at(acc, 2) + F.element_at(x, 2)),
                F.transform(
                    F.sequence(F.lit(1), kcol),
                    lambda ua: F.element_at(acc, (ua + F.lit(2))
                                            .cast("int"))
                    + F.when(ua.cast("double") == F.element_at(x, 1),
                             F.lit(1)).otherwise(F.lit(0))),
                F.transform(
                    F.sequence(F.lit(1), kcol),
                    lambda ub: F.element_at(
                        acc, (ub + F.lit(2) + kcol).cast("int"))
                    + F.when(ub.cast("double") == F.element_at(x, 1),
                             F.element_at(x, 2))
                    .otherwise(F.lit(0.0))))
            return F.when(chosen == F.element_at(x, 1), upd) \
                .otherwise(acc)
        return step

    kcol = F.col("k")
    seed = F.transform(F.sequence(F.lit(1), F.lit(2) + kcol * 2),
                       lambda _: F.lit(0.0))
    run = (obs.crossJoin(F.broadcast(kk))
           .select("user_id", "k", F.size("os").alias("n"),
                   F.aggregate("os", seed, step_fn(kcol)).alias("acc")))
    run = materialize(run)  # acc feeds 4 output expressions
    return (run.select(
        "user_id", F.col("n").cast("bigint").alias("n_events"),
        F.element_at("acc", 1).cast("bigint").alias("n_matched"),
        F.element_at("acc", 2).cast("bigint").alias("total_reward"),
        F.array_join(F.transform(
            F.sequence(F.lit(1), kcol),
            lambda pa: F.element_at("acc", (pa + F.lit(2))
                                    .cast("int"))
            .cast("bigint").cast("string")), "-").alias("arm_pulls"),
        (F.element_at("acc", 2)
         / F.nullif(F.element_at("acc", 1), F.lit(0.0)))
        .alias("replay_ctr"))
        .orderBy("user_id"))
