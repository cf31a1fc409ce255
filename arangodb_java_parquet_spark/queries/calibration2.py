"""TEMPERATURE SCALING (Guo et al. 2017, "On Calibration of Modern
Neural Networks") — the parametric leg of the calibration family
beside the binned reliability report (`calibration_report`), the
Spiegelhalter Z, Hosmer-Lemeshow, Brier decomposition and the isotonic
PAVA fit (`eval_isotonic_calibration`).

Setup: binary outcome y = [o_orderstatus = 'F']; the "model score" is
the deterministic monotone logit z = round(ln(price / median), 9)
(median = EXACT rank selection with o_orderkey tiebreak — a data
value). Temperature scaling fits the single scalar s = 1/T minimizing
the sigmoid cross-entropy NLL(s) = Σ ln(1+exp(s·z)) − y·s·z by
FIXED-ROUND NEWTON iteration from s = 1:

    g = Σ z·(p − y),   h = Σ z²·p·(1−p),   s ← s − g/h,
    p = sigmoid(s·z).

Output: the (round, s, T = 1/s, NLL) trajectory — rounds 0..4 —
the quantity a calibration pipeline monitors for convergence.

Determinism ledger: z is round-9 (ln of a ratio of identical
doubles); s·z is a product of bit-identical doubles; p =
round(sigmoid, 9) rides the r10 pilot (round(exp(x),9) is
cross-engine safe for bit-identical x); per-row g/h/NLL terms are
round-9 then DECIMAL(20,9)-summed (exact, order-free); the Newton
update s − g/h and T = 1/s are plain IEEE-identical arithmetic on
identical doubles, emitted UNROUNDED (the exact-sum rule — and
round-9 of a near-multiple-of-1e-9 would sit exactly on the half-way
divergence).

Scale: the score table is one orders pass (combinable); each Newton
round is ONE map-side-partial aggregate producing a 1-row scalar
frame that is materialized and broadcast back — the driver never
collects; 4 rounds = 4 passes (or one pass with a 5-way rollup at a
real deployment's scale; the round structure is the point here).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    materialize, query, t)

_ROUNDS = 4

_P9 = "round(1 / (1 + exp(-(s * z))), 9)"


def _tsc_sql() -> str:
    parts = ["""WITH base AS MATERIALIZED (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         round(ln(o_totalprice / m.med), 9) AS z
  FROM orders CROSS JOIN (
    SELECT v AS med FROM (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
               AS rk,
             COUNT(*) OVER () AS n
      FROM orders) WHERE rk = (n + 1) // 2) m
),
s0 AS (SELECT CAST(1 AS DOUBLE) AS s)"""]
    for r in range(1, _ROUNDS + 1):
        parts.append(f""",
g{r} AS MATERIALIZED (
  SELECT s.s,
         CAST(SUM(CAST(round(z * ({_P9} - y), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS g,
         CAST(SUM(CAST(round((z * z) * ({_P9} * (1 - {_P9})), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) AS h
  FROM base CROSS JOIN s{r - 1} s GROUP BY s.s
),
s{r} AS (SELECT s - g / NULLIF(h, 0) AS s FROM g{r})""")
    nll = ("CAST(SUM(CAST(round(ln(1 + round(exp(s.s * z), 9))"
           " - y * (s.s * z), 9) AS DECIMAL(20,9))) AS DOUBLE)")
    outs = []
    for r in range(0, _ROUNDS + 1):
        outs.append(f"""SELECT {r} AS rnd, s.s AS scale_s,
       1 / s.s AS temperature, {nll} AS nll
FROM base CROSS JOIN s{r} s GROUP BY s.s""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(outs) \
        + "\nORDER BY rnd"


@query("eval_temperature_scaling", _tsc_sql())
def eval_temperature_scaling(spark, sf_dir):
    """Fixed-round Newton temperature fit; see module docstring. Each
    round: one combinable aggregate -> 1-row scalar frame,
    materialized (the DoReMi per-round pattern) and broadcast back."""
    o = t(spark, sf_dir, "orders")
    wmed = W.orderBy("o_totalprice", "o_orderkey")
    med = (o.select(F.col("o_totalprice").alias("v"),
                    F.row_number().over(wmed).alias("rk"),
                    F.count(F.lit(1)).over(
                        W.partitionBy(F.lit(1))).alias("n"))
           .filter(F.col("rk") == F.expr("(n + 1) div 2"))
           .select(F.col("v").alias("med")))
    # spread before the checkpoint: the scan is one task per row group,
    # so an unspread base materializes as ONE partition and every one of
    # the 9 Newton-round aggregates (4 g/h + 5 NLL, each a full pass of
    # exp/round work over base) would run single-threaded (r15:
    # 4.02 s -> ~1.7 s)
    from arangodb_java_parquet_spark.operators.dedup import spread
    base = materialize(
        spread(o).crossJoin(F.broadcast(med)).select(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            .alias("y"),
            F.round(F.log(F.col("o_totalprice") / F.col("med")), 9)
            .alias("z")))

    def d9(col):
        return F.sum(col.cast("decimal(20,9)")).cast("double")

    def p9(s):
        return F.round(F.lit(1) / (F.lit(1) + F.exp(-(s * F.col("z")))),
                       9)

    def nll_at(srow, rnd):
        s = F.col("s")
        term = F.round(F.log(F.lit(1) + F.round(F.exp(s * F.col("z")),
                                                9))
                       - F.col("y") * (s * F.col("z")), 9)
        return (base.crossJoin(F.broadcast(srow))
                .groupBy("s")
                .agg(d9(term).alias("nll"))
                .select(F.lit(rnd).cast("int").alias("rnd"),
                        F.col("s").alias("scale_s"),
                        (F.lit(1) / F.col("s")).alias("temperature"),
                        "nll"))

    srow = materialize(med.select(F.lit(1.0).alias("s")).limit(1)
                       .select("s"))
    out = [nll_at(srow, 0)]
    for r in range(1, _ROUNDS + 1):
        s = F.col("s")
        p = p9(s)
        z = F.col("z")
        upd = (base.crossJoin(F.broadcast(srow))
               .groupBy("s")
               .agg(d9(F.round(z * (p - F.col("y")), 9)).alias("g"),
                    d9(F.round((z * z) * (p * (F.lit(1) - p)), 9))
                    .alias("h")))
        srow = materialize(
            upd.select((F.col("s") - F.col("g")
                        / F.nullif(F.col("h"), F.lit(0.0)))
                       .alias("s")))
        out.append(nll_at(srow, r))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("rnd")
