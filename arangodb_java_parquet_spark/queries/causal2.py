"""PROPENSITY-SCORE SUBCLASSIFICATION (Rosenbaum & Rubin 1983/1984:
stratifying on the estimated propensity score removes ~90% of
confounding bias with as few as five strata) — the second CAUSAL
entry beside `causal_diff_in_diff`: DiD needs a time dimension;
subclassification needs only covariates, and is the workhorse
observational adjustment.

Design: units = orders; treatment = the DiD entry's rule (customer
in an even-regionkey nation); outcome = floor(o_totalprice) exact
integer; covariate cells = month(o_orderdate) × c_mktsegment. The
propensity in each cell is the FREQUENCY estimate p̂ = n_treat/n
(an integer-ratio double — no fitted model, so the whole pipeline is
deterministic); cells are grouped into 5 strata by NTILE(5) over
(p̂, cell-id) — rank-based binning with a unique tiebreak, never a
threshold on a float. The ATT is the treated-weighted stratum
contrast

    ATT = Σ_s (n_{T,s} / N_T) · (ȳ_{T,s} − ȳ_{C,s}),

each term round-9 then DECIMAL(20,9)-summed (5 unordered terms —
the decimal fence), strata missing an arm contribute NULL-skipped
terms (NULLIF-guarded means; disclosed estimator behavior).

Output: one row per stratum (sizes, propensity range, arm means,
contrast) with the ATT repeated — the reviewer-facing balance table
shape.

Scale: one orders⋈customer⋈nation pass (dims broadcast) into a
cell aggregate; strata/ATT are ≤60-row arithmetic. No driver
collect.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_NS = 5  # strata

_PS_SQL = f"""WITH base AS (
  SELECT CAST(month(o.o_orderdate) AS BIGINT) AS mth, c.c_mktsegment,
         CASE WHEN n.n_regionkey % 2 = 0 THEN 1 ELSE 0 END AS treat,
         CAST(floor(o.o_totalprice) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
cells AS (
  SELECT mth, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(treat) AS BIGINT) AS nt,
         CAST(SUM(treat * y) AS BIGINT) AS syt,
         CAST(SUM((1 - treat) * y) AS BIGINT) AS syc
  FROM base GROUP BY mth, c_mktsegment
),
scored AS (
  SELECT *, CAST(nt AS DOUBLE) / n AS phat,
         NTILE({_NS}) OVER (ORDER BY CAST(nt AS DOUBLE) / n,
                            mth, c_mktsegment) AS stratum
  FROM cells
),
strata AS (
  SELECT stratum,
         CAST(SUM(nt) AS BIGINT) AS n_treat,
         CAST(SUM(n - nt) AS BIGINT) AS n_ctrl,
         MIN(phat) AS phat_min, MAX(phat) AS phat_max,
         CAST(SUM(syt) AS BIGINT) AS syt,
         CAST(SUM(syc) AS BIGINT) AS syc
  FROM scored GROUP BY stratum
),
tot AS (SELECT CAST(SUM(n_treat) AS BIGINT) AS n_t_all FROM strata),
contr AS (
  SELECT s.stratum, s.n_treat, s.n_ctrl, s.phat_min, s.phat_max,
         s.syt / CAST(NULLIF(s.n_treat, 0) AS DOUBLE) AS m_treat,
         s.syc / CAST(NULLIF(s.n_ctrl, 0) AS DOUBLE) AS m_ctrl,
         (s.syt / CAST(NULLIF(s.n_treat, 0) AS DOUBLE)
          - s.syc / CAST(NULLIF(s.n_ctrl, 0) AS DOUBLE)) AS diff,
         round((CAST(s.n_treat AS DOUBLE) / t.n_t_all)
               * (s.syt / CAST(NULLIF(s.n_treat, 0) AS DOUBLE)
                  - s.syc / CAST(NULLIF(s.n_ctrl, 0) AS DOUBLE)), 9)
           AS term
  FROM strata s CROSS JOIN tot t
)
SELECT stratum, n_treat, n_ctrl, phat_min, phat_max,
       m_treat, m_ctrl, diff,
       (SELECT CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE)
        FROM contr) AS att
FROM contr
ORDER BY stratum
"""


@query("causal_propensity_strata", _PS_SQL)
def causal_propensity_strata(spark, sf_dir):
    """5-stratum propensity subclassification: frequency propensity
    per (month, segment) cell, NTILE rank binning, treated-weighted
    decimal-exact ATT. See module docstring."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    base = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n),
                  c["c_nationkey"] == n["n_nationkey"])
            .select(F.month("o_orderdate").cast("bigint").alias("mth"),
                    "c_mktsegment",
                    F.when(F.col("n_regionkey") % 2 == 0, 1)
                    .otherwise(0).alias("treat"),
                    F.floor("o_totalprice").cast("bigint").alias("y")))
    cells = (base.groupBy("mth", "c_mktsegment")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("treat").cast("bigint").alias("nt"),
                  F.sum(F.col("treat") * F.col("y")).cast("bigint")
                  .alias("syt"),
                  F.sum((F.lit(1) - F.col("treat")) * F.col("y"))
                  .cast("bigint").alias("syc")))
    phat = F.col("nt").cast("double") / F.col("n")
    scored = cells.select(
        "*", phat.alias("phat"),
        F.ntile(_NS).over(
            W.orderBy(phat, "mth", "c_mktsegment")).alias("stratum"))
    strata = (scored.groupBy("stratum")
              .agg(F.sum("nt").cast("bigint").alias("n_treat"),
                   F.sum(F.col("n") - F.col("nt")).cast("bigint")
                   .alias("n_ctrl"),
                   F.min("phat").alias("phat_min"),
                   F.max("phat").alias("phat_max"),
                   F.sum("syt").cast("bigint").alias("syt"),
                   F.sum("syc").cast("bigint").alias("syc")))
    tot = strata.agg(F.sum("n_treat").cast("bigint").alias("n_t_all"))
    m_t = (F.col("syt")
           / F.nullif(F.col("n_treat"), F.lit(0)).cast("double"))
    m_c = (F.col("syc")
           / F.nullif(F.col("n_ctrl"), F.lit(0)).cast("double"))
    contr = (strata.crossJoin(F.broadcast(tot))
             .select("stratum", "n_treat", "n_ctrl",
                     "phat_min", "phat_max",
                     m_t.alias("m_treat"), m_c.alias("m_ctrl"),
                     (m_t - m_c).alias("diff"),
                     F.round((F.col("n_treat").cast("double")
                              / F.col("n_t_all")) * (m_t - m_c), 9)
                     .alias("term")))
    att = contr.agg(
        F.sum(F.col("term").cast("decimal(20,9)")).cast("double")
        .alias("att"))
    return (contr.crossJoin(F.broadcast(att))
            .select("stratum", "n_treat", "n_ctrl", "phat_min",
                    "phat_max", "m_treat", "m_ctrl", "diff", "att")
            .orderBy("stratum"))
