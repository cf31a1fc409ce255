"""DIFFERENCE-IN-DIFFERENCES (the canonical 2×2 natural-experiment
estimator; Card & Krueger 1994 popularized the design) — the CAUSAL
leg of the A/B-evaluation family beside the randomized-experiment
tooling (`eval_cuped_adjustment`, `eval_proportions_ztest`,
`ab_test_conversion_lift`): when assignment is NOT randomized, DiD
removes both the group-level baseline difference and the common time
shock under the parallel-trends assumption.

Design on this corpus: treatment = orders by customers of
even-regionkey nations, the policy date = the EXACT rank-selected
median order date ((n+1)//2-th by (date, orderkey) — a data value);
outcome = floor(o_totalprice) as an exact integer (floor of
bit-identical doubles; integerizing makes all four cells' first and
second moments EXACT BIGINT sums — the Welch-t idiom, so means,
cell variances, the DiD estimate, its large-sample standard error
sqrt(Σ s²_g/n_g) and the t-ratio are straight-line IEEE expressions
on identical operands, emitted UNROUNDED).

    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)

Scale: one orders⋈customer⋈nation pass (dim joins broadcast) into a
4-row combinable moment aggregate; everything after is 1-row
arithmetic. The s1/n·s1 ordering keeps the variance numerator in
double range (the BIGINT-variance overflow class, r13).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_DID_SQL = """WITH base AS (
  SELECT o.o_orderkey, o.o_orderdate,
         CAST(floor(o.o_totalprice) AS BIGINT) AS y,
         CASE WHEN n.n_regionkey % 2 = 0 THEN 1 ELSE 0 END AS treat
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
cut AS (
  SELECT d AS cutoff FROM (
    SELECT o_orderdate AS d,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rk,
           COUNT(*) OVER () AS nn
    FROM base)
  WHERE rk = (nn + 1) // 2
),
cells AS (
  SELECT treat, CASE WHEN o_orderdate > cutoff THEN 1 ELSE 0 END AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s1,
         CAST(SUM(y * y) AS BIGINT) AS s2
  FROM base CROSS JOIN cut
  GROUP BY 1, 2
),
w AS (
  SELECT
    MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN s1 END) AS s1_t1,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN s2 END) AS s2_t1,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN s1 END) AS s1_t0,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN s2 END) AS s2_t0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN s1 END) AS s1_c1,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN s2 END) AS s2_c1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN s1 END) AS s1_c0,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN s2 END) AS s2_c0
  FROM cells
),
st AS (
  SELECT n_t1, n_t0, n_c1, n_c0,
         s1_t1 / CAST(n_t1 AS DOUBLE) AS m_t1,
         s1_t0 / CAST(n_t0 AS DOUBLE) AS m_t0,
         s1_c1 / CAST(n_c1 AS DOUBLE) AS m_c1,
         s1_c0 / CAST(n_c0 AS DOUBLE) AS m_c0,
         (s2_t1 - s1_t1 / CAST(n_t1 AS DOUBLE) * s1_t1)
           / (n_t1 - 1) / n_t1 AS v_t1,
         (s2_t0 - s1_t0 / CAST(n_t0 AS DOUBLE) * s1_t0)
           / (n_t0 - 1) / n_t0 AS v_t0,
         (s2_c1 - s1_c1 / CAST(n_c1 AS DOUBLE) * s1_c1)
           / (n_c1 - 1) / n_c1 AS v_c1,
         (s2_c0 - s1_c0 / CAST(n_c0 AS DOUBLE) * s1_c0)
           / (n_c0 - 1) / n_c0 AS v_c0
  FROM w
)
SELECT CAST(n_t1 AS BIGINT) AS n_t1, CAST(n_t0 AS BIGINT) AS n_t0,
       CAST(n_c1 AS BIGINT) AS n_c1, CAST(n_c0 AS BIGINT) AS n_c0,
       m_t1, m_t0, m_c1, m_c0,
       (m_t1 - m_t0) - (m_c1 - m_c0) AS did,
       sqrt(v_t1 + v_t0 + v_c1 + v_c0) AS se,
       ((m_t1 - m_t0) - (m_c1 - m_c0))
         / NULLIF(sqrt(v_t1 + v_t0 + v_c1 + v_c0), 0) AS t_stat
FROM st
"""


@query("causal_diff_in_diff", _DID_SQL)
def causal_diff_in_diff(spark, sf_dir):
    """2×2 DiD: broadcast dim joins -> 4-cell exact-bigint moment
    aggregate -> one-row estimator. See module docstring."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    base = (o.join(F.broadcast(c),
                   o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n),
                  c["c_nationkey"] == n["n_nationkey"])
            .select("o_orderkey", "o_orderdate",
                    F.floor("o_totalprice").cast("bigint").alias("y"),
                    F.when(F.col("n_regionkey") % 2 == 0, 1)
                    .otherwise(0).alias("treat")))
    wcut = W.orderBy("o_orderdate", "o_orderkey")
    cut = (base.select(F.col("o_orderdate").alias("d"),
                       F.row_number().over(wcut).alias("rk"),
                       F.count(F.lit(1)).over(
                           W.partitionBy(F.lit(1))).alias("nn"))
           .filter(F.col("rk") == F.expr("(nn + 1) div 2"))
           .select(F.col("d").alias("cutoff")))
    cells = (base.crossJoin(F.broadcast(cut))
             .groupBy("treat",
                      F.when(F.col("o_orderdate") > F.col("cutoff"), 1)
                      .otherwise(0).alias("post"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("y").cast("bigint").alias("s1"),
                  F.sum(F.col("y") * F.col("y")).cast("bigint")
                  .alias("s2")))

    def pick(tv, pv, col):
        return F.max(F.when((F.col("treat") == tv)
                            & (F.col("post") == pv), F.col(col)))

    w = cells.agg(*[
        pick(tv, pv, col).alias(f"{col}_{'t' if tv else 'c'}{pv}")
        for tv in (1, 0) for pv in (1, 0)
        for col in ("n", "s1", "s2")])
    def mean(g):
        return F.col(f"s1_{g}") / F.col(f"n_{g}").cast("double")

    def var(g):
        return ((F.col(f"s2_{g}")
                 - F.col(f"s1_{g}") / F.col(f"n_{g}").cast("double")
                 * F.col(f"s1_{g}"))
                / (F.col(f"n_{g}") - 1) / F.col(f"n_{g}"))

    did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    se = F.sqrt(var("t1") + var("t0") + var("c1") + var("c0"))
    return w.select(
        *[F.col(f"n_{g}").cast("bigint").alias(f"n_{g}")
          for g in ("t1", "t0", "c1", "c0")],
        mean("t1").alias("m_t1"), mean("t0").alias("m_t0"),
        mean("c1").alias("m_c1"), mean("c0").alias("m_c0"),
        did.alias("did"), se.alias("se"),
        (did / F.nullif(se, F.lit(0.0))).alias("t_stat"))
