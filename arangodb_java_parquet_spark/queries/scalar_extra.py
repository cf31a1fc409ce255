"""Extended scalar/function coverage: string manipulation batch 2
(trim/pad/initcap/translate/repeat/reverse/left-right), bitwise operators,
nth_value windows, LATERAL correlated subqueries.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t


@query("scalar_string_funcs2", """
SELECT p_partkey,
       trim('  ' || p_name || ' ') AS trimmed,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       upper(left(p_name, 1)) || substring(p_name, 2) AS name_capitalized,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_upper,
       repeat('-', p_size % 5) AS dashes,
       reverse(p_brand) AS brand_rev,
       left(p_type, 3) AS type3,
       right(p_name, 4) AS name_tail
FROM part
""")
def scalar_string_funcs2(spark, sf_dir):
    """String batch 2: trim/lpad/capitalize/translate/repeat/reverse/
    left/right — all JVM expressions with identical semantics in DuckDB
    (initcap avoided: not in DuckDB's function catalog)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" ")))
        .alias("trimmed"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat(F.upper(F.substring("p_name", 1, 1)),
                 F.expr("substring(p_name, 2)")).alias("name_capitalized"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_upper"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.substring(F.col("p_name"), -4, 4).alias("name_tail"))


@query("scalar_bitwise_ops", """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
       CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
       CAST(o_orderkey << 2 AS BIGINT) AS shifted_l,
       CAST(o_orderkey >> 3 AS BIGINT) AS shifted_r
FROM orders WHERE o_orderkey < 1000
""")
def scalar_bitwise_ops(spark, sf_dir):
    """Bitwise AND/OR/XOR/shifts (hash-partitioning and flag-field
    arithmetic primitives)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ 21845").alias("xored"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shifted_l"),
        F.expr("shiftright(o_orderkey, 3)").alias("shifted_r"))


@query("window_nth_value", """
SELECT o_custkey, o_orderkey,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
       NTH_VALUE(o_orderkey, 3) OVER w AS third_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def window_nth_value(spark, sf_dir):
    """NTH_VALUE over a full-partition frame."""
    o = t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return o.select(
        "o_custkey", "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"))


@query("map_functions", """
WITH m AS (
  SELECT p_partkey, map(['brand', 'type'], [p_brand, p_type]) AS attrs
  FROM part
)
SELECT p_partkey,
       (attrs['brand'])[1] AS brand_val,
       (attrs['type'])[1] AS type_val,
       array_to_string(map_keys(attrs), ',') AS attr_keys,
       CAST(len(map_keys(attrs)) AS INT) AS n_attrs
FROM m
""")
def map_functions(spark, sf_dir):
    """Map-type coverage: construct, extract, keys, size (DuckDB's map
    extraction returns a single-element list — unwrapped in the oracle so
    both sides yield scalars). Keys are emitted comma-joined: the external
    driver's canonicalizer cannot hash top-level ARRAY columns."""
    p = t(spark, sf_dir, "part")
    attrs = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")))
    return p.select(
        "p_partkey",
        F.element_at(attrs, "brand").alias("brand_val"),
        F.element_at(attrs, "type").alias("type_val"),
        F.array_join(F.map_keys(attrs), ",").alias("attr_keys"),
        F.size(F.map_keys(attrs)).alias("n_attrs"))


@query("agg_median_abs_deviation", """
WITH med AS (
  SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS med_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment,
       round(quantile_cont(abs(c.c_acctbal - m.med_bal), 0.5), 6) AS mad_bal,
       round(MIN(m.med_bal), 6) AS median_bal
FROM customer c JOIN med m ON c.c_mktsegment = m.c_mktsegment
GROUP BY c.c_mktsegment
""")
def agg_median_abs_deviation(spark, sf_dir):
    """Median absolute deviation per segment: two-level exact percentile
    (median of |x - median|) — the robust dispersion metric; medians
    broadcast back onto the fact rows."""
    c = t(spark, sf_dir, "customer")
    med = (c.groupBy("c_mktsegment")
           .agg(F.expr("percentile(c_acctbal, 0.5)").alias("med_bal")))
    joined = c.join(F.broadcast(med), "c_mktsegment")
    return (joined.groupBy("c_mktsegment")
            .agg(F.round(F.expr(
                "percentile(abs(c_acctbal - med_bal), 0.5)"), 6)
                .alias("mad_bal"),
                F.round(F.min("med_bal"), 6).alias("median_bal")))


@query("join_lateral_topn", """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
WHERE c.c_mktsegment = 'BUILDING'
""")
def join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (top-2 orders per customer) through the
    SQL surface — Catalyst decorrelates to a ranked join, the same plan the
    window idiom produces, but exercising the LateralJoin path."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
    """)


@query("udtf_tokenize_lateral", """
SELECT doc_id,
       UNNEST(range(0, len(string_split(text, ' ')))) AS pos,
       UNNEST(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 50
""")
def udtf_tokenize_lateral(spark, sf_dir):
    """SQL UDTF exercised in the lateral position: a Python table function
    (functions/udtfs.py TokenizeUDTF) expanding each document into
    (position, token) rows via ``FROM d, LATERAL ajps_tokenize(d.text)``,
    value-checked against DuckDB's zipped-UNNEST oracle. Input bounded to
    50 docs — Python UDTFs are deliberately not a hot-path operator here
    (tokenization at scale runs through the JVM split/posexplode twin in
    text_pipeline.py)."""
    from arangodb_java_parquet_spark.functions.udtfs import register_udtfs
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(spark)
    register_udtfs(spark)
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, tk.pos, tk.token
        FROM __udtf_docs d, LATERAL ajps_tokenize(d.text) tk
    """)


@query("udaf_geomean_pandas", """
SELECT o_orderpriority,
       ROUND(EXP(SUM(LN(o_totalprice)) / COUNT(*)), 6) AS geomean_price
FROM orders
GROUP BY o_orderpriority
""")
def udaf_geomean_pandas(spark, sf_dir):
    """Custom UDAF surface: a grouped-aggregate pandas UDF (Arrow-batched
    Series -> scalar) computing the per-group geometric mean — the one
    member of the UDF/UDAF/UDTF triple not expressible as a converter or
    table function.

    Determinism: the python side sums the logs with math.fsum (exact);
    DuckDB sums naively but with per-group n in the hundreds both land
    within ~1e-11 of the true sum, so rounding the final geomean to 6
    decimals (magnitude ~1e5) is engine-stable. A production hot path
    would use the pure-JVM EXP(AVG(LN(x))) twin; this entry exists to
    exercise the pandas-UDAF contract."""
    from arangodb_java_parquet_spark.functions.udafs import geomean
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(spark)

    o = t(spark, sf_dir, "orders")
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg
    return (o.groupBy("o_orderpriority")
            .agg(F.round(geomean("o_totalprice"), 6)
                 .alias("geomean_price")))


@query("array_hof_functions", """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       len(list_filter(ws, x -> len(x) > 4)) AS n_long_words,
       CASE WHEN len(list_filter(ws, x -> len(x) = 1)) > 0
            THEN 1 ELSE 0 END AS has_single_char,
       CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT)
         AS total_chars,
       array_to_string(flatten([ws[1:2], ws[3:4]]), ',') AS first4_flat,
       array_to_string(list_transform(range(1, least(len(ws), 5) + 1),
                                      i -> CAST(i AS VARCHAR)), ',')
         AS seq_to_5,
       array_to_string(
         list_transform(range(1, least(len(ws), 5) + 1),
                        i -> ws[i] || '-' || ws[least(len(ws), 5) + 1 - i]),
         ',') AS zipped_mirror
FROM w
""")
def array_hof_functions(spark, sf_dir):
    """Higher-order array functions — filter / exists / aggregate(fold) /
    flatten / sequence / zip_with — the expression-level surface that
    keeps per-row array logic JVM-side instead of in UDFs. Single-param
    lambdas only (a two-param Spark HOF lambda silently binds (element,
    index) — a documented repo-convention gotcha); the DuckDB oracle mirrors zip_with via an
    index transform."""
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    w5 = F.slice(ws, 1, F.least(F.size(ws), F.lit(5)))
    return d.select(
        "doc_id",
        F.size(F.filter(ws, lambda x: F.length(x) > 4)).cast("long")
        .alias("n_long_words"),
        F.when(F.exists(ws, lambda x: F.length(x) == 1), 1).otherwise(0)
        .cast("int").alias("has_single_char"),
        F.aggregate(ws, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x))
        .alias("total_chars"),
        F.array_join(
            F.flatten(F.array(F.slice(ws, 1, 2), F.slice(ws, 3, 2))), ",")
        .alias("first4_flat"),
        F.array_join(
            F.sequence(F.lit(1).cast("long"),
                       F.least(F.size(ws), F.lit(5)).cast("long"))
            .cast("array<string>"), ",")
        .alias("seq_to_5"),
        F.array_join(
            F.zip_with(w5, F.reverse(w5),
                       lambda x, y: F.concat(x, F.lit("-"), y)), ",")
        .alias("zipped_mirror"))


@query("scalar_try_functions", """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN NULL
            ELSE o_totalprice / (o_orderkey % 10) END AS safe_div,
       TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
       TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS good_cast
FROM orders
""")
def scalar_try_functions(spark, sf_dir):
    """Error-safe expression surface (Spark try_divide / try_cast vs ANSI
    mode's exceptions): malformed input degrades to NULL instead of
    failing the job — the posture a 100 TB pipeline needs, where one bad
    row must not kill a stage. The oracle states the same semantics with
    CASE + TRY_CAST."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"),
                     F.col("o_orderkey") % 10).alias("safe_div"),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.expr("try_cast(CAST(o_orderkey AS STRING) AS BIGINT)")
        .alias("good_cast"))


@query("agg_grouping_id", """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority) AS g_prio,
       GROUPING(o_orderstatus) AS g_status,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""")
def agg_grouping_id(spark, sf_dir):
    """GROUPING() indicator columns on a ROLLUP — how consumers tell a
    real NULL from a subtotal row (the reason GROUPING exists). Spark's
    grouping() maps 1:1 to the SQL standard form DuckDB runs."""
    o = t(spark, sf_dir, "orders")
    return (o.rollup("o_orderpriority", "o_orderstatus")
            .agg(F.grouping("o_orderpriority").cast("long").alias("g_prio"),
                 F.grouping("o_orderstatus").cast("long").alias("g_status"),
                 F.count(F.lit(1)).alias("n")))


@query("map_hof_functions", """
WITH m AS (
  SELECT p_partkey,
         map(['brand', 'type'], [p_brand, p_type]) AS attrs
  FROM part
)
SELECT p_partkey,
       upper((attrs['brand'])[1]) AS brand_upper,
       CAST(len(list_filter(map_entries(attrs),
                            e -> len(e.value) > 10)) AS INT)
         AS n_long_vals,
       array_to_string(list_sort(list_transform(map_entries(attrs),
                                                e -> e.key || '=' || e.value)),
                       ',')
         AS entries_sorted
FROM m
""")
def map_hof_functions(spark, sf_dir):
    """Map higher-order functions: transform_values, map_filter (the
    (k, v) two-param lambda is the CORRECT map signature — the
    element/index trap is an ARRAY-lambda hazard), and a sorted
    entries-as-strings projection so the output stays repr-portable
    (raw map/struct values render differently across engine clients).
    DuckDB mirrors via list ops over map_entries."""
    p = t(spark, sf_dir, "part")
    attrs = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")))
    upper_vals = F.transform_values(attrs, lambda k, v: F.upper(v))
    long_vals = F.map_filter(attrs, lambda k, v: F.length(v) > 10)
    entries = F.array_sort(F.transform(
        F.map_entries(attrs),
        lambda e: F.concat(e["key"], F.lit("="), e["value"])))
    return p.select(
        "p_partkey",
        F.element_at(upper_vals, "brand").alias("brand_upper"),
        F.size(long_vals).cast("int").alias("n_long_vals"),
        F.array_join(entries, ",").alias("entries_sorted"))


@query("scalar_conditional_funcs", """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT')
         AS seg_defaulted,
       CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL
            THEN 'has_seg' ELSE 'no_seg' END AS nvl2_equiv,
       GREATEST(c_acctbal, 0.0) AS bal_floor0,
       LEAST(c_acctbal, 5000.0) AS bal_cap5k,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band
FROM customer
""")
def scalar_conditional_funcs(spark, sf_dir):
    """Conditional-expression surface: NULLIF / COALESCE chains, the
    NVL2 pattern, GREATEST/LEAST clamps, and multi-arm CASE banding —
    the null-discipline toolkit (DuckDB mirrors NVL2 with CASE; both
    engines propagate NULL identically through these)."""
    c = t(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("DEFAULT")).alias("seg_defaulted"),
        F.when(seg_null.isNotNull(), "has_seg").otherwise("no_seg")
        .alias("nvl2_equiv"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high").alias("bal_band"))
