"""Subquery-shaped TPC-H coverage: EXISTS (Q4), derived-table max (Q15),
correlated scalar average (Q17), anti-join + global scalar subquery (Q22).
These exercise Catalyst's subquery rewrites (RewritePredicateSubquery,
scalar-subquery to join) — plan paths the plain join queries don't hit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    dsum, query, sql_dsum, t)


@query("q4_order_priority", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""")
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4: correlated EXISTS with an extra correlated predicate —
    expressed through the SQL surface so Catalyst's subquery rewrite (to a
    left-semi join) is the plan under test."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("q4_orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("q4_lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM q4_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM q4_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """)


@query("q15_top_supplier", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: derived revenue view + uncorrelated scalar MAX subquery."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1997-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_revenue")))
    s = t(spark, sf_dir, "supplier")
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (s.join(rev, s.s_suppkey == rev.supplier_no)
            .join(F.broadcast(max_rev),
                  F.col("total_revenue") == F.col("m"))
            .select("s_suppkey", "s_name", "total_revenue"))


@query("q17_small_quantity_revenue", f"""
SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""")
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: correlated scalar AVG subquery — implemented as the
    decorrelated agg+join (the plan Catalyst would rewrite to; avg per
    partkey is computed once, broadcast, then filtered against)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = (li.groupBy(F.col("l_partkey").alias("ap_partkey"))
               .agg(F.avg("l_quantity").alias("avg_qty")))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(avg_qty),
                  li.l_partkey == F.col("ap_partkey"))
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly")))


@query("q22_global_sales_opportunity", f"""
WITH eligible AS (
  SELECT c_custkey, c_acctbal, substring(c_name, 13, 2) AS cntrycode
  FROM customer
  WHERE c_acctbal > 0.0
),
avg_bal AS (
  SELECT {sql_dsum('c_acctbal')} / COUNT(*) AS a FROM eligible
)
SELECT e.cntrycode, COUNT(*) AS numcust, {sql_dsum('e.c_acctbal')} AS totacctbal
FROM eligible e, avg_bal
WHERE e.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                  AND o.o_totalprice > 450000)
GROUP BY e.cntrycode
""")
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: global scalar-average subquery + NOT EXISTS
    anti-join (customers with above-average balance and no large orders) +
    substring-derived grouping key."""
    c = t(spark, sf_dir, "customer")
    eligible = (c.filter(F.col("c_acctbal") > 0.0)
                .select("c_custkey", "c_acctbal",
                        F.substring("c_name", 13, 2).alias("cntrycode")))
    avg_bal = eligible.agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("a"))
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (eligible.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum("c_acctbal").alias("totacctbal")))
