"""TPC-H Q2/Q20 plan shapes over a SYNTHESIZED partsupp relation.

The driver corpus ships no partsupp table (README/SURVEY §6), so the
correlated min-cost-supplier scalar subquery (Q2) and the
quantity-threshold semi-join chain (Q20) — the two classic partsupp plan
shapes — are exercised against a partsupp synthesized deterministically
from part × a 4-row exploder, with supplier keys, supply cost and
available quantity all integer-arithmetic functions of (p_partkey, i).
Spark and the DuckDB oracle compute the identical relation independently
(same closed-form arithmetic), so every downstream comparison is exact.

Scale notes: the synthesis is a narrow projection + 4-way explode (no
shuffle); Q2 computes the per-part minimum with a window over the
already-joined eligible suppliers (one shuffle on ps_partkey) instead of
re-evaluating a correlated subquery per row; Q20 is a semi-join funnel
(parts -> partsupp -> shipped-quantity threshold -> suppliers) where every
dimension join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (dsum, query,
                                                        sql_dsum, t)

# 4 candidate suppliers per part; cost/qty in closed form so both engines
# derive bit-identical values (integer ops + one double division).
_PS_SQL = """
ns AS (SELECT COUNT(*) AS n FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + u.i) % ns.n AS ps_suppkey,
         1.0 + ((p_partkey * 31 + ((p_partkey * 7 + u.i) % ns.n) * 17)
                % 10000) / 100.0 AS ps_supplycost,
         1 + ((p_partkey * 13 + u.i * 101) % 200) AS ps_availqty
  FROM part, ns, (SELECT UNNEST(range(0, 4)) AS i) u
)
"""


def synth_partsupp(spark, sf_dir):
    """The Spark twin of the partsupp CTE: part × explode(0..3), supplier
    count via a broadcast scalar (no driver-side action)."""
    p = t(spark, sf_dir, "part").select("p_partkey")
    ns = t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("__ns"))
    exploded = (p.crossJoin(F.broadcast(ns))
                .select("p_partkey", "__ns",
                        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")))
    suppkey = (F.col("p_partkey") * 7 + F.col("i")) % F.col("__ns")
    return exploded.select(
        F.col("p_partkey").alias("ps_partkey"),
        suppkey.alias("ps_suppkey"),
        (F.lit(1.0)
         + ((F.col("p_partkey") * 31 + suppkey * 17) % 10000) / F.lit(100.0))
        .alias("ps_supplycost"),
        (F.lit(1) + (F.col("p_partkey") * 13 + F.col("i") * 101) % 200)
        .alias("ps_availqty"))


@query("q2_min_cost_supplier", f"""
WITH {_PS_SQL}
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       ps.ps_supplycost
FROM part p
JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size <= 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
LIMIT 100
""")
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) achieving
    the minimum supply cost within a region. The correlated scalar
    subquery decorrelates to a per-part MIN window over the eligible
    (region-filtered) supplier rows — one shuffle on ps_partkey, then an
    equality filter keeps all tied minima, exactly the subquery's
    semantics. Dims broadcast; top-100 via TakeOrderedAndProject."""
    ps = synth_partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (t(spark, sf_dir, "part")
         .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
         .select("p_partkey", "p_type"))

    eligible = (ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
                .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
                .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey))
    w = W.partitionBy("ps_partkey")
    cheapest = (eligible
                .withColumn("__min_cost", F.min("ps_supplycost").over(w))
                .filter(F.col("ps_supplycost") == F.col("__min_cost")))
    return (cheapest.join(p, cheapest.ps_partkey == p.p_partkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                    "ps_supplycost")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey",
                     "ps_supplycost")
            .limit(100))


@query("q20_excess_inventory_suppliers", f"""
WITH {_PS_SQL},
qty AS (
  SELECT l_partkey, l_suppkey,
         {sql_dsum('l_quantity')} * 0.5 AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name LIKE 'NATION_1%'
  AND s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN qty ON qty.l_partkey = ps.ps_partkey
              AND qty.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
        AND ps.ps_availqty > qty.half_qty)
""")
def q20_excess_inventory_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers (in the NATION_1* nations) of 'small%' parts whose available
    quantity exceeds half of what they actually shipped in 1996 — the
    semi-join funnel: part filter -> partsupp semi-join -> threshold
    against the per-(part,supplier) shipped-quantity aggregate ->
    supplier semi-join. The only shuffles are the lineitem aggregate and
    the partsupp/qty equi-join; part and nation sides broadcast."""
    ps = synth_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem")
    parts = (t(spark, sf_dir, "part")
             .filter(F.col("p_name").like("small%")).select("p_partkey"))
    qty = (li.filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1997-01-01"))
           .groupBy("l_partkey", "l_suppkey")
           .agg((dsum("l_quantity") * 0.5).alias("half_qty")))
    excess = (ps.join(F.broadcast(parts),
                      ps.ps_partkey == parts.p_partkey, "left_semi")
              .join(qty, (F.col("ps_partkey") == qty.l_partkey)
                    & (F.col("ps_suppkey") == qty.l_suppkey))
              .filter(F.col("ps_availqty") > F.col("half_qty"))
              .select("ps_suppkey"))
    s = t(spark, sf_dir, "supplier")
    n = (t(spark, sf_dir, "nation")
         .filter(F.col("n_name").like("NATION_1%")))
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
            .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
            .select("s_suppkey", "s_name", "s_acctbal"))
