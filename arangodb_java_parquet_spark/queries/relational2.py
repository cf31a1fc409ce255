"""Second relational batch: TPC-H-flavored analytics (Q10/Q12/Q14/Q18/Q19
shapes), argmin-per-group, full-outer/cross joins, unpivot, exact
percentiles, regexp/null-handling/date-arithmetic scalar coverage, array
functions. Completes the SURVEY.md §2.2 category matrix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import (
    dsum, query, sql_dsum, t)


@query("q10_returned_items", f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Scale: customer+nation broadcast; lineitem filtered on the scan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(dsum(rev).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
            .orderBy(F.desc("revenue"), "c_custkey").limit(20))


@query("q12_priority_shipping", """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
GROUP BY l.l_linestatus
""")
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape: conditional counting (CASE inside SUM)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, (li.l_orderkey == o.o_orderkey)
                    & (li.l_shipdate >= o.o_orderdate))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count")))


@query("q14_promo_effect", f"""
SELECT 100.0 * ({sql_dsum("CASE WHEN p.p_type = 'PROMO' "
                          "THEN l.l_extendedprice * (1 - l.l_discount) "
                          "ELSE 0.0 END")})
             / ({sql_dsum('l.l_extendedprice * (1 - l.l_discount)')})
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-03-01 00:00:00'
""")
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: conditional-revenue ratio; part is broadcast."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1997-03-01")))
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg((F.lit(100.0) * dsum(promo) / dsum(rev))
                 .alias("promo_revenue_pct")))


@query("q18_large_orders", f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {sql_dsum('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING {sql_dsum('l.l_quantity')} > 150
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""")
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over an aggregate + top-k."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (li.join(o, o.o_orderkey == li.l_orderkey)
            .join(F.broadcast(c), c.c_custkey == o.o_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(dsum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 150)
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20))


@query("q19_disjunctive_predicates", f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 40)
""")
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-column predicates (tests OR
    pushdown / join-condition planning)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (((F.col("p_brand") == "Brand#13")
             & F.col("p_size").between(1, 15)
             & F.col("l_quantity").between(1, 20))
            | ((F.col("p_brand") == "Brand#19")
               & F.col("p_size").between(10, 30)
               & F.col("l_quantity").between(10, 40)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(dsum(rev).alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


@query("argmin_per_group", """
SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice
FROM part p
JOIN (SELECT p_brand, MIN(p_retailprice) AS min_price
      FROM part GROUP BY p_brand) m
  ON p.p_brand = m.p_brand AND p.p_retailprice = m.min_price
""")
def argmin_per_group(spark, sf_dir):
    """Cheapest part per brand (argmin): agg + join-back, the shuffle-
    friendly formulation (vs a window over the whole table)."""
    p = t(spark, sf_dir, "part").alias("p")
    m = (t(spark, sf_dir, "part").groupBy("p_brand")
         .agg(F.min("p_retailprice").alias("min_price"))
         .withColumnRenamed("p_brand", "m_brand").alias("m"))
    return (p.join(F.broadcast(m),
                   (F.col("p.p_brand") == F.col("m.m_brand"))
                   & (F.col("p.p_retailprice") == F.col("m.min_price")))
            .select("p.p_brand", "p.p_partkey", "p.p_name",
                    "p.p_retailprice"))


@query("join_full_outer", """
WITH cust AS (SELECT c_nationkey, COUNT(*) AS n_cust
              FROM customer GROUP BY c_nationkey),
     supp AS (SELECT s_nationkey, COUNT(*) AS n_supp
              FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM cust c FULL OUTER JOIN supp s ON c.c_nationkey = s.s_nationkey
""")
def join_full_outer(spark, sf_dir):
    """FULL OUTER join with COALESCE null-handling."""
    c = (t(spark, sf_dir, "customer").groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).alias("n_cust")))
    s = (t(spark, sf_dir, "supplier").groupBy("s_nationkey")
         .agg(F.count(F.lit(1)).alias("n_supp")))
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"))


@query("join_cross", """
SELECT r.r_name, m.c_mktsegment
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) m
""")
def join_cross(spark, sf_dir):
    """Explicit cross join (tiny × tiny; any bigger pairing goes through
    the LSH/bucketed patterns instead)."""
    r = t(spark, sf_dir, "region").select("r_name")
    m = t(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.crossJoin(m)


@query("unpivot_metrics", """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
FROM customer
""")
def unpivot_metrics(spark, sf_dir):
    """Unpivot (wide -> long) via stack()."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("stack(2, 'acctbal', c_acctbal,"
               " 'nationkey', CAST(c_nationkey AS DOUBLE))")
        .alias("metric", "value"))


@query("agg_exact_percentiles", """
SELECT c_mktsegment,
       quantile_cont(c_acctbal, 0.5) AS median_bal,
       quantile_cont(c_acctbal, 0.9) AS p90_bal,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
FROM customer
GROUP BY c_mktsegment
""")
def agg_exact_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (median, p90) per segment."""
    c = t(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment")
            .agg(F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
                 F.expr("percentile(c_acctbal, 0.9)").alias("p90_bal"),
                 F.min("c_acctbal").cast("double").alias("min_bal"),
                 F.max("c_acctbal").cast("double").alias("max_bal")))


@query("agg_approx_distinct")
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — sketch values are engine-
    specific so this entry is rows-only; the exact twin
    (agg_count_distinct) is the oracle-checked variant."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.approx_count_distinct("o_custkey").alias("approx_customers"),
                 F.expr("approx_percentile(o_totalprice, 0.5)")
                 .alias("approx_median_price")))


@query("scalar_regexp_funcs", """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       CASE WHEN regexp_matches(p_name, '^(small|large)') THEN 1 ELSE 0 END
         AS sized,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
""")
def scalar_regexp_funcs(spark, sf_dir):
    """Regexp scalar coverage: extract/match/replace (patterns restricted to
    the RE2 ∩ Java-regex common subset so both engines agree)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").rlike("^(small|large)"), 1).otherwise(0)
        .cast("int").alias("sized"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"))


@query("scalar_null_handling", """
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
       CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END
         AS price_filled,
       (o_orderstatus = 'O') AS is_open
FROM orders
""")
def scalar_null_handling(spark, sf_dir):
    """NULLIF / COALESCE / IS NULL / boolean projection."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")),
                   F.lit("PENDING")).alias("status_resolved"),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice")).alias("price_filled"),
        (F.col("o_orderstatus") == "O").alias("is_open"))


@query("scalar_date_arith", """
SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT)
         AS ship_delay_days,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate + INTERVAL 120 DAY
GROUP BY 1
""")
def scalar_date_arith(spark, sf_dir):
    """Date arithmetic: day differences + interval bounds, histogrammed."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (li.join(o, (li.l_orderkey == o.o_orderkey)
                    & (li.l_shipdate
                       < F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")))
            .groupBy(F.datediff("l_shipdate", "o_orderdate")
                     .alias("ship_delay_days"))
            .agg(F.count(F.lit(1)).alias("n_lines")))


_MOMENTS = """
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
"""


@query("agg_moment_stats", f"""
WITH m AS ({_MOMENTS})
SELECT l_returnflag, n,
       round(sx / n, 9) AS mean_qty,
       round((sxx - sx * sx / n) / (n - 1), 9) AS var_qty,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 9) AS stddev_qty,
       round((n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
         AS corr_qty_price
FROM m
""")
def agg_moment_stats(spark, sf_dir):
    """Statistical aggregates (mean/variance/stddev/correlation) computed
    from exact decimal moment sums so results are deterministic bit-for-bit
    — unlike streaming stddev/corr whose float accumulation is
    order-dependent. Still one shuffle, still map-side combinable (the
    moments are plain sums)."""
    li = t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    def ms(e):
        return F.sum(e.cast("decimal(30,8)")).cast("double")

    m = (li.groupBy("l_returnflag")
         .agg(F.count("l_quantity").alias("n"), ms(q).alias("sx"),
              ms(q * q).alias("sxx"), ms(p).alias("sy"),
              ms(p * p).alias("syy"), ms(q * p).alias("sxy")))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    # rounded to 9 decimals: the cancellation-sensitive derived stats can
    # differ by a few ulps across engines (expression fusion/FMA), even
    # with identical exact moments in
    return m.select(
        "l_returnflag", "n",
        F.round(sx / n, 9).alias("mean_qty"),
        F.round((sxx - sx * sx / n) / (n - 1), 9).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 9).alias("stddev_qty"),
        F.round((n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 9)
        .alias("corr_qty_price"))


@query("agg_bool_and_or", """
SELECT o_orderpriority,
       bool_and(o_totalprice > 100) AS all_over_100,
       bool_or(o_orderstatus = 'F') AS any_finished,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""")
def agg_bool_and_or(spark, sf_dir):
    """Boolean aggregates (every/any)."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.expr("bool_and(o_totalprice > 100)").alias("all_over_100"),
                 F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
                 F.count(F.lit(1)).alias("n_orders")))


@query("sort_nulls_ordering", """
SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
FROM customer
ORDER BY seg NULLS FIRST, c_custkey
LIMIT 30
""")
def sort_nulls_ordering(spark, sf_dir):
    """Explicit NULLS FIRST ordering + limit (null placement changes which
    rows survive the limit, so the oracle checks the semantics)."""
    c = t(spark, sf_dir, "customer")
    return (c.select("c_custkey",
                     F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
                     .alias("seg"))
            .orderBy(F.col("seg").asc_nulls_first(), "c_custkey")
            .limit(30))


@query("scalar_date_trunc", f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS order_quarter,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY 1, 2
""")
def scalar_date_trunc(spark, sf_dir):
    """date_trunc to month/quarter grain (the partition-key derivation every
    time-partitioned lake table uses)."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date")
        .alias("order_month"),
        F.date_trunc("quarter", "o_orderdate").cast("date")
        .alias("order_quarter"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice").alias("total")))


@query("union_by_name_missing_cols", """
SELECT c_custkey AS entity_key, c_acctbal AS balance, c_mktsegment AS segment
FROM customer
UNION ALL BY NAME
SELECT s_suppkey AS entity_key, s_acctbal AS balance, NULL AS segment
FROM supplier
""")
def union_by_name_missing_cols(spark, sf_dir):
    """unionByName with missing columns (schema evolution across sources —
    the mixed-vintage-files reality of any long-lived lake)."""
    c = (t(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("entity_key"),
                 F.col("c_acctbal").alias("balance"),
                 F.col("c_mktsegment").alias("segment")))
    s = (t(spark, sf_dir, "supplier")
         .select(F.col("s_suppkey").alias("entity_key"),
                 F.col("s_acctbal").alias("balance")))
    return c.unionByName(s, allowMissingColumns=True)


@query("agg_collect_list_sorted", """
SELECT o_orderpriority,
       array_to_string(list_sort(array_agg(DISTINCT o_orderstatus)), ',')
         AS statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""")
def agg_collect_list_sorted(spark, sf_dir):
    """Array aggregation (collect_set) — sorted so the result is
    deterministic under any partitioning (unsorted collect_list is the
    classic nondeterminism bug in distributed aggs). The array is joined
    to a comma-separated string so hash-comparison harnesses that cannot
    canonicalize array-typed cells still value-check it."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.array_join(F.sort_array(F.collect_set("o_orderstatus")),
                              ",").alias("statuses"),
                 F.count(F.lit(1)).alias("n_orders")))


@query("set_ops_all_variants", """
WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_linestatus = 'F'),
     b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25)
SELECT 'intersect_all' AS op, flag, COUNT(*) AS n FROM
  (SELECT flag FROM a INTERSECT ALL SELECT flag FROM b) GROUP BY flag
UNION ALL
SELECT 'except_all' AS op, flag, COUNT(*) AS n FROM
  (SELECT flag FROM a EXCEPT ALL SELECT flag FROM b) GROUP BY flag
""")
def set_ops_all_variants(spark, sf_dir):
    """Duplicate-preserving set ops (INTERSECT ALL / EXCEPT ALL) —
    multiset semantics, counted per key for a compact deterministic
    result."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("flag"))
    ia = (a.intersectAll(b).groupBy("flag")
          .agg(F.count(F.lit(1)).alias("n"))
          .select(F.lit("intersect_all").alias("op"), "flag", "n"))
    ea = (a.exceptAll(b).groupBy("flag")
          .agg(F.count(F.lit(1)).alias("n"))
          .select(F.lit("except_all").alias("op"), "flag", "n"))
    return ia.unionByName(ea)


@query("posexplode_positions", """
-- Position bound derived FROM THE DATA (per-doc LATERAL over the token
-- list length), never a fixed literal: a regenerated testdata set with
-- >2000-token documents must not silently truncate the oracle side
-- (the diversity.py r13 fixed-range rule).
SELECT d.doc_id, CAST(u.i - 1 AS INT) AS pos, d.l[u.i] AS tok
FROM (SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id < 20) d,
     LATERAL (SELECT UNNEST(range(1, len(d.l) + 1)) AS i) u
""")
def posexplode_positions(spark, sf_dir):
    """posexplode: tokens with their ordinal positions (the LATERAL
    VIEW/UNNEST WITH ORDINALITY pattern)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (d.select("doc_id",
                     F.posexplode(F.split(F.col("text"), " "))
                     .alias("pos", "tok")))


@query("array_functions", """
SELECT doc_id,
       len(list_distinct(string_split(text, ' '))) AS n_unique_words,
       (string_split(text, ' '))[1] AS first_word,
       list_sort(list_distinct(string_split(text, ' ')))[1] AS min_word,
       CASE WHEN list_contains(string_split(text, ' '), 'spark')
            THEN 1 ELSE 0 END AS has_spark
FROM documents
""")
def array_functions(spark, sf_dir):
    """Array function coverage: distinct/sort/index/contains over token
    arrays (all JVM-side, no UDF)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(words)).cast("long").alias("n_unique_words"),
        words.getItem(0).alias("first_word"),
        F.array_sort(F.array_distinct(words)).getItem(0).alias("min_word"),
        F.when(F.array_contains(words, "spark"), 1).otherwise(0)
        .cast("int").alias("has_spark"))


@query("join_null_safe", """
WITH a AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 5 END AS k
  FROM documents
),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE doc_id % 5 END AS k
  FROM documents
)
SELECT a.k AS k, COUNT(*) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
""")
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics ordinary equi-joins silently drop.
    Catalyst plans eqNullSafe as a hash join on a null-wrapped key, so it
    stays shuffle-partitioned like any equi-join (no NLJ fallback)."""
    d = t(spark, sf_dir, "documents")
    a = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("doc_id") % 5).alias("k"))
    b = a.select(
        F.col("doc_id").alias("doc_id_b"),
        F.when(F.col("doc_id") % 11 == 0, None)
        .otherwise(F.col("doc_id") % 5).alias("kb"))
    return (a.join(b, F.col("k").eqNullSafe(F.col("kb")))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_pairs")))
