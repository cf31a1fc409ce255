"""Relational operator inventory (SURVEY.md §2.2): scans, filter/project,
joins (incl. broadcast, semi, anti), aggregations (hash/sort, distinct,
rollup/cube/grouping sets), sort/limit/top-k, set ops, scalar functions
(string/date/math/conditional/JSON), pivot.

The reference has none of these (SURVEY.md §2.2 — its only pipeline is
scan->encode->sink, ParquetArangoLoader.java:139-154); each entry here is the
engine capability supplied by native Spark primitives, declared and
oracle-checked.

Scale notes are given per query; the common ones:
  * dimension tables (region/nation/customer/supplier/part at TPC-H scale
    ratios) are broadcast — no shuffle of the fact table for those joins;
  * aggregations are partial/final (map-side combine) automatically;
  * all filters/projections sit directly on the parquet scan (pushdown).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    davg, dsum, query, sql_davg, sql_dsum, t)

# ---------------------------------------------------------------------------
# TPC-H-style analytic queries
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: 2-key hash agg, 8 aggregates, filter pushed to scan.

    Scale: partial aggregation collapses each map task to ≤|flag×status|=6
    rows before the shuffle — the shuffle moves O(6·tasks) rows regardless of
    input size, so this survives 100 TB unchanged."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dsum("l_quantity").alias("sum_qty"),
                 dsum("l_extendedprice").alias("sum_base_price"),
                 dsum(disc_price).alias("sum_disc_price"),
                 dsum(charge).alias("sum_charge"),
                 davg("l_quantity").alias("avg_qty"),
                 davg("l_extendedprice").alias("avg_price"),
                 davg("l_discount").alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter + 3-way join + agg + top-k.

    Scale: customer (1/10 of lineitem rows, filtered to 1/5 of that) is
    broadcast — lineitem⋈orders is the only shuffle; ORDER BY..LIMIT is
    TakeOrdered (no global sort)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dsum(revenue).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10))


_Q5_ORACLE = f"""
SELECT n.n_name, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@query("q5_local_supplier_volume", _Q5_ORACLE)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join with a region filter.

    Scale: region/nation/customer/supplier are all broadcast (each ≪ fact);
    the only shuffled join is lineitem⋈orders on orderkey. Join order keeps
    the fact table on the streaming side throughout."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1998-01-01")))
    li = t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                  & (s.s_nationkey == c.c_nationkey))
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(dsum(revenue).alias("revenue")))


_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-aggregate; every predicate reaches the
    parquet reader (range + between), zero shuffle beyond the final 1-row
    combine."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & (F.col("l_discount").between(0.05, 0.07))
                      & (F.col("l_quantity") < 24))
            .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


# ---------------------------------------------------------------------------
# core operators
# ---------------------------------------------------------------------------

@query("filter_project_pushdown", """
SELECT l_orderkey, l_partkey, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00' AND l_discount > 0.08
""")
def filter_project_pushdown(spark, sf_dir):
    """Projection + selective filter: ReadSchema is 5 columns, both predicates
    in PushedFilters (verified in tests/test_plans.py)."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "2001-06-01")
                      & (F.col("l_discount") > 0.08))
            .select("l_orderkey", "l_partkey", "l_extendedprice"))


@query("topk_orders", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def topk_orders(spark, sf_dir):
    """Global top-k: TakeOrderedAndProject — each partition keeps k rows,
    driver merges k·p rows; no global sort at any scale."""
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(10))


@query("agg_rollup", f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (Expand + single shuffle)."""
    return (t(spark, sf_dir, "orders")
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@query("agg_cube", f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def agg_cube(spark, sf_dir):
    """CUBE over two low-cardinality keys."""
    return (t(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 dsum("l_quantity").alias("sum_qty")))


@query("agg_grouping_sets", f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""")
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (same Catalyst Expand)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query("agg_count_distinct", """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""")
def agg_count_distinct(spark, sf_dir):
    """Distinct aggregation (two-phase Expand+agg in Spark)."""
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.count(F.lit(1)).alias("n_orders")))


@query("join_semi", """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 50000)
""")
def join_semi(spark, sf_dir):
    """LEFT SEMI join (EXISTS). Scale: the filtered orders side shuffles
    only its join key after partial distinct; customer stays partitioned."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@query("join_anti", """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""")
def join_anti(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS): customers with no URGENT-priority
    order. The right side is filtered so the result is NON-EMPTY at
    every test scale — an anti join whose oracle comparison matches on
    zero rows is a trivial pass (the bare customers-without-orders form
    returns nothing at sf0.01, caught by the zero-row audit)."""
    c = t(spark, sf_dir, "customer")
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_mktsegment"))


@query("set_ops", """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
SELECT 'both' AS op, c_custkey FROM (SELECT c_custkey FROM building
                                     INTERSECT SELECT c_custkey FROM rich) i
UNION ALL
SELECT 'building_only' AS op, c_custkey FROM (SELECT c_custkey FROM building
                                              EXCEPT SELECT c_custkey FROM rich) e
""")
def set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL in one result (tagged rows)."""
    c = t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    both = building.intersect(rich).select(F.lit("both").alias("op"), "c_custkey")
    only = building.exceptAll(rich).distinct().select(
        F.lit("building_only").alias("op"), "c_custkey")
    return both.unionByName(only)


@query("case_bucketing", f"""
SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
            WHEN o_totalprice < 20000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY 1
""")
def case_bucketing(spark, sf_dir):
    """Conditional expressions (CASE WHEN) + agg on the derived key."""
    o = t(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") < 1000, "small")
              .when(F.col("o_totalprice") < 20000, "medium")
              .otherwise("large").alias("bucket"))
    return (o.groupBy(bucket)
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@query("pivot_wide", f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
""")
def pivot_wide(spark, sf_dir):
    """PIVOT (wide aggregation); fixed pivot values so the plan is a single
    agg pass, no extra distinct-values job."""
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(dsum("l_quantity"))
            .withColumnRenamed("O", "qty_O")
            .withColumnRenamed("F", "qty_F"))


# ---------------------------------------------------------------------------
# scalar function coverage
# ---------------------------------------------------------------------------

@query("scalar_string_funcs", """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
FROM part
""")
def scalar_string_funcs(spark, sf_dir):
    """String function coverage: upper/substring/length/concat/replace/like."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"),
                 F.col("p_size").cast("string")).alias("brand_size"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).cast("int")
        .alias("has_a"))


@query("scalar_date_funcs", f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY 1, 2
""")
def scalar_date_funcs(spark, sf_dir):
    """Date/time extraction + group by derived calendar keys."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("order_year"),
                      F.month("o_orderdate").alias("order_month"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@query("scalar_math_funcs", """
SELECT p_partkey,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       ABS(p_size - 25) AS size_dist,
       CAST(p_partkey % 7 AS BIGINT) AS key_mod,
       CAST(POWER(CAST(p_size AS DOUBLE), 2.0) AS DOUBLE) AS size_sq
FROM part
""")
def scalar_math_funcs(spark, sf_dir):
    """Math function coverage: floor/ceil/abs/mod/power (all deterministic)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("size_sq"))


@query("scalar_json_funcs", f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1
""")
def scalar_json_funcs(spark, sf_dir):
    """JSON path extraction over the events.props string column."""
    e = t(spark, sf_dir, "events")
    return (e.groupBy(F.get_json_object("props", "$.k").cast("bigint")
                      .alias("k_value"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("sum_value")))
