"""Data-profiling / dataset-management operators: column profiles,
z-score anomaly flagging, deterministic hash-based train/test splits,
fixed-width histograms. The dataset-curation utilities around a training
corpus, all exact and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.materialize import materialize
from arangodb_java_parquet_spark.queries.common import (
    dsum, exact_percentiles, query, t)


@query("profile_orders_columns", """
SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_non_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
       COUNT(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
""")
def profile_orders_columns(spark, sf_dir):
    """Column profile (null/distinct counts) in long format — the
    data-quality report every ingestion job emits. One scan per column
    group via unioned aggregates (Spark computes them in parallel jobs of
    one plan)."""
    o = t(spark, sf_dir, "orders")

    def prof(col):
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.countDistinct(col).alias("n_distinct"))

    out = prof("o_orderkey")
    for c in ("o_custkey", "o_orderstatus", "o_orderpriority"):
        out = out.unionByName(prof(c))
    return out


@query("anomaly_zscore_days", """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS day_total
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(day_total AS DECIMAL(30,8))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(day_total * day_total AS DECIMAL(38,8))) AS DOUBLE) AS sxx
  FROM daily GROUP BY event_type
)
SELECT d.day, d.event_type, d.day_total,
       round((d.day_total - s.sx / s.n)
             / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 6) AS zscore
FROM daily d JOIN stats s ON d.event_type = s.event_type
WHERE abs((d.day_total - s.sx / s.n)
          / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1))) > 1.5
""")
def anomaly_zscore_days(spark, sf_dir):
    """Daily-volume anomaly flagging: days whose total deviates >1.5σ from
    their event-type mean (exact decimal moments, rounded z-scores)."""
    e = t(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"),
                       "event_type")
             .agg(F.sum(F.col("value").cast("decimal(30,8)")).cast("double")
                  .alias("day_total")))
    stats = (daily.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("day_total").cast("decimal(30,8)"))
                  .cast("double").alias("sx"),
                  F.sum((F.col("day_total") * F.col("day_total"))
                        .cast("decimal(38,8)")).cast("double").alias("sxx")))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = ((F.col("day_total") - sx / n)
         / F.sqrt((sxx - sx * sx / n) / (n - 1)))
    return (daily.join(F.broadcast(stats), "event_type")
            .filter(F.abs(z) > 1.5)
            .select("day", "event_type", "day_total",
                    F.round(z, 6).alias("zscore")))


@query("train_test_split_hash", """
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN instr('0123456789abcdef',
                         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
              THEN 'train'
              WHEN instr('0123456789abcdef',
                         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 14
              THEN 'valid'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM assigned GROUP BY split
""")
def train_test_split_hash(spark, sf_dir):
    """Deterministic hash-based train/valid/test split (~81/6/13 via md5
    first hex digit) — stable under reshuffles, engine-portable, and
    leakage-free by construction (membership depends only on the id). The
    canonical dataset-splitting op for training pipelines."""
    d = t(spark, sf_dir, "documents")
    digit = (F.instr(F.lit("0123456789abcdef"),
                     F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
             - 1)
    split = (F.when(digit < 13, "train")
             .when(digit < 14, "valid")
             .otherwise("test"))
    return (d.select("doc_id", split.alias("split"))
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id")))


@query("histogram_fixed_width", """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS bucket_min,
       CAST(MAX(o_totalprice) AS DOUBLE) AS bucket_max
FROM orders
GROUP BY 1
""")
def histogram_fixed_width(spark, sf_dir):
    """Fixed-width histogram (50k buckets over order value) — floor
    bucketing is deterministic double arithmetic in both engines."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(F.floor(F.col("o_totalprice") / 50000.0)
                      .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_totalprice").cast("double").alias("bucket_min"),
                 F.max("o_totalprice").cast("double").alias("bucket_max")))


@query("rfm_segmentation", """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
           AS monetary
  FROM orders
  GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, last_order, frequency, monetary,
         NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
  FROM per_cust
)
SELECT o_custkey, last_order, frequency, monetary,
       r_quartile, f_quartile, m_quartile,
       CASE WHEN r_quartile = 1 AND f_quartile = 1 THEN 'champion'
            WHEN r_quartile <= 2 AND m_quartile <= 2 THEN 'loyal'
            WHEN r_quartile = 4 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
""")
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency/frequency/monetary quartiles
    (NTILE with unique tiebreaks) composed into segment labels — the
    canonical mart query a document-store user runs after loading orders.
    The quartile windows are global rank windows; at 100 TB you'd ntile
    within a hash-bucketed stratum or use approx quantile cutpoints —
    the aggregation below them is the heavy part and shuffles only
    per-customer rows."""
    from arangodb_java_parquet_spark.queries.common import dsum
    o = t(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count(F.lit(1)).alias("frequency"),
                     dsum("o_totalprice").alias("monetary")))
    wr = Window.orderBy(F.desc("last_order"), "o_custkey")
    wf = Window.orderBy(F.desc("frequency"), "o_custkey")
    wm = Window.orderBy(F.desc("monetary"), "o_custkey")
    scored = per_cust.select(
        "*",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"))
    seg = (F.when((F.col("r_quartile") == 1) & (F.col("f_quartile") == 1),
                  "champion")
           .when((F.col("r_quartile") <= 2) & (F.col("m_quartile") <= 2),
                 "loyal")
           .when(F.col("r_quartile") == 4, "at_risk")
           .otherwise("regular"))
    return scored.withColumn("segment", seg)


@query("agg_hll_mergeable_sketches")
def agg_hll_mergeable_sketches(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark): per-day user sketches are built ONCE, then unioned into
    per-event-type totals — the architecture that makes distinct counts
    cheap at 100 TB: daily sketches are tiny, re-aggregations (weekly,
    monthly, all-time, any type subset) union sketches instead of
    re-scanning raw events. Estimates are sketch-seed-specific, so this
    entry is rows-only; tests/test_curation.py bounds the estimate
    against the exact distinct count (HLL lgK=12 keeps relative error
    ~1.6%)."""
    e = t(spark, sf_dir, "events")
    daily = (e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"),
                       "event_type")
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    return (daily.groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("approx_users"),
                 F.count(F.lit(1)).alias("n_days")))


@query("scalar_json_typed", """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
            THEN 1 ELSE 0 END AS has_k
FROM events
""")
def scalar_json_typed(spark, sf_dir):
    """Schema-declared JSON parsing with from_json (vs the path-extract
    variant in scalar_json_funcs): the JSON column is parsed ONCE into a
    typed struct — at scale the single parse replaces N path extractions
    and gives real types/nullability to Catalyst."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select("event_id",
                    parsed.getField("k").alias("k_typed"),
                    F.when(parsed.getField("k").isNotNull(), 1)
                    .otherwise(0).alias("has_k"))


@query("emb_zscore_grouped_pandas")
def emb_zscore_grouped_pandas(spark, sf_dir):
    """Grouped-map applyInPandas (the remaining pandas-API surface next to
    the scalar UDF, grouped-agg UDAF and mapInPandas entries): per-label
    z-scores of the first embedding coordinate, computed with an Arrow-
    batched pandas function over each label group. Rows-only: numpy's
    pairwise summation order differs from any SQL engine's, so values are
    tolerance-tested against the JVM formulation in tests instead of
    hash-matched. Rows are sorted by vec_id inside the group so the
    python-side result is at least partitioning-independent."""
    import pandas as pd

    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(spark)
    e = t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "label",
                    F.col("embedding").getItem(0).cast("double")
                    .alias("x"))

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mu = pdf["x"].mean()
        sd = pdf["x"].std(ddof=0)
        pdf["z"] = (pdf["x"] - mu) / (sd if sd > 0 else 1.0)
        return pdf[["vec_id", "label", "z"]]

    return base.groupBy("label").applyInPandas(
        zscore, "vec_id long, label int, z double")


_DQ_SQL = """
SELECT 'orders_pk_duplicates' AS check_name,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
UNION ALL
SELECT 'lineitem_fk_orphans',
       COUNT(*) FROM lineitem
       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'customer_key_nulls',
       COUNT(*) FROM customer WHERE c_custkey IS NULL
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       COUNT(*) FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'lineitem_negative_price',
       COUNT(*) FROM lineitem WHERE l_extendedprice < 0
UNION ALL
SELECT 'orders_date_out_of_range',
       COUNT(*) FROM orders
       WHERE o_orderdate <  DATE '1992-01-01'
          OR o_orderdate >= DATE '1999-01-01'
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
"""


@query("dq_constraint_report", _DQ_SQL)
def dq_constraint_report(spark, sf_dir):
    """Deequ-style declarative data-quality report: primary-key
    uniqueness, foreign-key orphans (anti-join — never a NOT IN shuffle
    of the big side), null checks, domain/range rules — one row per
    constraint with its violation count. Each check is an independent
    aggregate, so Spark runs them as parallel jobs over shared scans; at
    100 TB this is the nightly gate that catches a bad upstream delivery
    before it poisons downstream aggregates."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")

    def one(name, df_agg):
        return df_agg.select(F.lit(name).alias("check_name"),
                             F.col("n").cast("long").alias("n_violations"))

    checks = [
        one("orders_pk_duplicates",
            o.agg((F.count(F.lit(1))
                   - F.countDistinct("o_orderkey")).alias("n"))),
        one("lineitem_fk_orphans",
            li.join(o.select("o_orderkey"),
                    li["l_orderkey"] == o["o_orderkey"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))),
        one("customer_key_nulls",
            c.filter(F.col("c_custkey").isNull())
            .agg(F.count(F.lit(1)).alias("n"))),
        one("lineitem_nonpositive_qty",
            li.filter(F.col("l_quantity") <= 0)
            .agg(F.count(F.lit(1)).alias("n"))),
        one("lineitem_negative_price",
            li.filter(F.col("l_extendedprice") < 0)
            .agg(F.count(F.lit(1)).alias("n"))),
        one("orders_date_out_of_range",
            o.filter((F.col("o_orderdate") < "1992-01-01")
                     | (F.col("o_orderdate") >= "1999-01-01"))
            .agg(F.count(F.lit(1)).alias("n"))),
        one("lineitem_discount_out_of_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1))
            .agg(F.count(F.lit(1)).alias("n"))),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


# ---------------------------------------------------------------------------
# skew diagnostics and winsorized statistics
# ---------------------------------------------------------------------------

@query("skew_key_report", """
WITH k AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
s AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM k),
ranked AS (
  SELECT o_custkey, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey) AS rnk
  FROM k
)
SELECT r.o_custkey, r.n, r.rnk, s.total, s.n_keys,
       r.n / CAST(s.total AS DOUBLE) AS share,
       (r.n * CAST(s.n_keys AS DOUBLE)) / s.total AS skew_ratio
FROM ranked r CROSS JOIN s
WHERE r.rnk <= 20
""")
def skew_key_report(spark, sf_dir):
    """Join/aggregation-key skew diagnostic: top-20 heaviest keys with
    their share of all rows and their ratio to the mean key weight — the
    report that tells you whether a shuffle needs salting BEFORE you run
    it at full scale. Per-key counts are combinable; the global ranking
    window runs over the key-count table (keys, not rows) and only to
    report depth 20 — at 100 TB swap the window for an orderBy(n).limit
    TakeOrdered if the key table itself is huge."""
    o = t(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    s = k.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys"))
    w = Window.orderBy(F.desc("n"), "o_custkey")
    return (k.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 20)
            .crossJoin(F.broadcast(s))
            .select("o_custkey", "n", "rnk", "total", "n_keys",
                    (F.col("n") / F.col("total").cast("double"))
                    .alias("share"),
                    ((F.col("n") * F.col("n_keys").cast("double"))
                     / F.col("total")).alias("skew_ratio")))


@query("winsorize_stats", """
WITH q AS (
  SELECT ROUND(quantile_cont(o_totalprice, 0.01), 9) AS lo,
         ROUND(quantile_cont(o_totalprice, 0.99), 9) AS hi
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(LEAST(GREATEST(o_totalprice, lo), hi)
                     AS DECIMAL(30,8))) AS DOUBLE) AS sum_clipped,
       CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM orders CROSS JOIN q
GROUP BY 1
""")
def winsorize_stats(spark, sf_dir):
    """Winsorized aggregation: clip order values at the exact global
    1st/99th percentiles, then aggregate per priority — outlier-robust
    metrics without dropping rows. The percentile pair comes from ONE
    distributed ranked pass (exact_percentiles, r16 — bit-identical to
    percentile() but without its O(distinct) single-reducer
    ObjectHashAggregate buffer) broadcast to the clip pass; round-9 pins
    the interpolated cutpoints across engines."""
    o = t(spark, sf_dir, "orders")
    q = exact_percentiles(
        o, "o_totalprice", [0.01, 0.99], ["_lo", "_hi"]).select(
        F.round("_lo", 9).alias("lo"), F.round("_hi", 9).alias("hi"))
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")),
                      F.col("hi"))
    out_of_range = ((F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi"))).cast("long")
    return (o.crossJoin(F.broadcast(q))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(clipped.cast("decimal(30,8)")).cast("double")
                 .alias("sum_clipped"),
                 F.sum(out_of_range).alias("n_clipped")))


@query("histogram_equidepth", """
WITH r AS (
  SELECT o_orderkey, o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
         AS sum_price
FROM r GROUP BY bucket
""")
def histogram_equidepth(spark, sf_dir):
    """Equi-depth (quantile-bucket) histogram via NTILE — the complement
    of the fixed-width histogram: every bucket holds the same row count,
    exposing the distribution's shape where mass concentrates. NTILE
    needs a total order (single-partition window) — fine for a report; at
    100 TB cut on approx_percentile boundaries instead and keep the
    bucketing a map-side CASE (the fixed-width histogram entry shows that
    shape)."""
    o = t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    r = o.select("o_orderkey", "o_totalprice",
                 F.ntile(10).over(w).alias("bucket"))
    return (r.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"),
                 F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                 .cast("double").alias("sum_price")))


@query("pareto_revenue_share", """
WITH rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
           AS cust_rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cust_rev DESC, o_custkey) AS rnk,
         CAST(SUM(CAST(cust_rev AS DECIMAL(30,8))) OVER (
           PARTITION BY segment ORDER BY cust_rev DESC, o_custkey
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev,
         CAST(SUM(CAST(cust_rev AS DECIMAL(30,8))) OVER (
           PARTITION BY segment) AS DOUBLE) AS seg_rev,
         COUNT(*) OVER (PARTITION BY segment) AS n_cust
  FROM rev
)
SELECT segment, rnk, n_cust, cum_rev, seg_rev,
       cum_rev / seg_rev AS cum_share
FROM ranked
WHERE rnk <= 10
""")
def pareto_revenue_share(spark, sf_dir):
    """Pareto concentration: per segment, the cumulative revenue share of
    the top customers (does 20% of the base drive 80% of revenue?).
    Exact-decimal running and total sums inside the window keep the
    cumulative shares bit-stable; windows partition by segment. Report
    depth 10 bounds the output."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rev = (o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
                  F.col("o_custkey") == F.col("c_custkey"))
           .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                .cast("double").alias("cust_rev")))
    w_ord = Window.partitionBy("segment").orderBy(
        F.desc("cust_rev"), "o_custkey")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("segment")
    ranked = (rev
              .withColumn("rnk", F.row_number().over(w_ord))
              .withColumn("cum_rev",
                          F.sum(F.col("cust_rev").cast("decimal(30,8)"))
                          .over(w_cum).cast("double"))
              .withColumn("seg_rev",
                          F.sum(F.col("cust_rev").cast("decimal(30,8)"))
                          .over(w_all).cast("double"))
              .withColumn("n_cust", F.count(F.lit(1)).over(w_all)))
    return (ranked.filter(F.col("rnk") <= 10)
            .select("segment", "rnk", "n_cust", "cum_rev", "seg_rev",
                    (F.col("cum_rev") / F.col("seg_rev"))
                    .alias("cum_share")))


@query("histogram_2d", """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS price_bin,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year_bin,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY 1, 2
""")
def histogram_2d(spark, sf_dir):
    """2-D histogram (price band × order year) — the heatmap aggregation:
    one combinable groupBy over two map-side bucketings (integer floor
    division and a date-part), output bounded by bins² regardless of
    corpus size."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
        .alias("price_bin"),
        F.year("o_orderdate").alias("year_bin"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
             .cast("double").alias("sum_price")))


@query("boxplot_stats", """
WITH q AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         ROUND(quantile_cont(o_totalprice, 0.25), 9) AS q1,
         ROUND(quantile_cont(o_totalprice, 0.5), 9) AS med,
         ROUND(quantile_cont(o_totalprice, 0.75), 9) AS q3,
         ROUND(quantile_cont(o_totalprice, 0.75)
           + 1.5 * (quantile_cont(o_totalprice, 0.75)
                    - quantile_cont(o_totalprice, 0.25)), 9) AS fence
  FROM orders GROUP BY o_orderpriority
)
SELECT q.o_orderpriority, q.n, q.q1, q.med, q.q3,
       CAST(SUM(CASE WHEN o.o_totalprice > q.fence THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_outliers
FROM q JOIN orders o USING (o_orderpriority)
GROUP BY 1, 2, 3, 4, 5
""")
def boxplot_stats(spark, sf_dir):
    """Box-plot profile per group: exact quartiles + the count of
    high-fence (Q3 + 1.5·IQR) outliers — the distribution summary every
    data-quality dashboard draws. All three quartiles AND the fence come
    from ONE distributed ranked pass per group (exact_percentiles, r16 —
    the r15 shape ran TWO independent percentile ObjectHashAggregate
    lineages, 5 percentile evaluations; the builtin also buffers
    O(distinct) boxed values on one reducer, guide §5), rejoined
    broadcast for the fence count; round-9 pins the interpolated
    cutpoints AND the fence itself (an unrounded fence could flip the
    count for a row within an ulp of a divergently-interpolated
    quantile — same rule as winsorize)."""
    o = t(spark, sf_dir, "orders")
    # materialize: the quartile table feeds both the output row and the
    # broadcast fence join — without it the ranked pass runs twice
    pct = exact_percentiles(
        o, "o_totalprice", [0.25, 0.5, 0.75], ["_p25", "_p50", "_p75"],
        group_cols=("o_orderpriority",)).transform(materialize)
    q = pct.select(
        "o_orderpriority",
        F.round("_p25", 9).alias("q1"),
        F.round("_p50", 9).alias("med"),
        F.round("_p75", 9).alias("q3"))
    fence = (pct.select(
        "o_orderpriority",
        F.round(F.col("_p75")
                + 1.5 * (F.col("_p75") - F.col("_p25")), 9)
        .alias("_fence")))
    joined = o.join(F.broadcast(fence), "o_orderpriority")
    n_out = (joined.groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(F.col("o_totalprice") > F.col("_fence"), 1)
                        .otherwise(0)).alias("n_high_outliers")))
    return (q.join(n_out, "o_orderpriority")
            .select("o_orderpriority", "n", "q1", "med", "q3",
                    "n_high_outliers"))


@query("categorical_chi2_independence", """
WITH obs AS (
  SELECT p_brand, p_type, COUNT(*) AS o
  FROM part GROUP BY 1, 2
),
marg AS (
  SELECT b.p_brand, c.p_type, b.nb, c.nc, tot.n
  FROM (SELECT p_brand, CAST(SUM(o) AS BIGINT) AS nb
        FROM obs GROUP BY 1) b
  CROSS JOIN (SELECT p_type, CAST(SUM(o) AS BIGINT) AS nc
              FROM obs GROUP BY 1) c
  CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs) tot
)
SELECT COUNT(*) AS n_cells,
       CAST(SUM(CAST(ROUND(
         (COALESCE(obs.o, 0) - (marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n)
         * (COALESCE(obs.o, 0) - (marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n)
         / ((marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n), 9)
         AS DECIMAL(30,9))) AS DOUBLE) AS chi2
FROM marg
LEFT JOIN obs ON obs.p_brand = marg.p_brand
             AND obs.p_type = marg.p_type
""")
def categorical_chi2_independence(spark, sf_dir):
    """Chi-square independence test between two categorical columns
    (brand × type) over the FULL contingency grid including empty
    cells (the marginals cross join supplies them; observed defaults to
    0) — the categorical-association profile for schema understanding.
    Three combinable aggregations; the grid is |brands|×|types|,
    report-sized; per-cell round-9 then exact sum."""
    p = t(spark, sf_dir, "part")
    obs = p.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("o"))
    nb = obs.groupBy("p_brand").agg(F.sum("o").alias("nb"))
    nc = obs.groupBy("p_type").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("n"))
    marg = nb.crossJoin(nc).crossJoin(F.broadcast(tot))
    grid = marg.join(obs, ["p_brand", "p_type"], "left")
    exp = (F.col("nb") * F.col("nc").cast("double")) / F.col("n")
    dev = F.coalesce(F.col("o"), F.lit(0)) - exp
    cell = F.round(dev * dev / exp, 9)
    return grid.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(cell.cast("decimal(30,9)")).cast("double").alias("chi2"))


@query("dq_unit_price_consistency", """
WITH up AS (
  SELECT l_partkey,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem WHERE l_quantity > 0
),
stats AS (
  SELECT l_partkey, COUNT(*) AS n,
         ROUND(MIN(unit_price), 9) AS min_up,
         ROUND(MAX(unit_price), 9) AS max_up
  FROM up GROUP BY l_partkey
)
SELECT l_partkey, n, min_up, max_up,
       ROUND(max_up / min_up, 9) AS spread_ratio,
       CASE WHEN max_up / min_up > 1.5 THEN 1 ELSE 0 END AS inconsistent
FROM stats
WHERE n >= 3
""")
def dq_unit_price_consistency(spark, sf_dir):
    """Data-quality consistency rule on a DERIVED metric: per part, the
    spread of unit price (extendedprice/quantity) across line items —
    ratios above 1.5x flag pricing errors or unit mismatches upstream.
    The division is IEEE-identical cross-engine; min/max are order-free;
    only the report needs round-9. One combinable aggregation keyed by
    part."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    up = li.select("l_partkey",
                   (F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_price"))
    stats = (up.groupBy("l_partkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.min("unit_price"), 9).alias("min_up"),
                  F.round(F.max("unit_price"), 9).alias("max_up")))
    return (stats.filter(F.col("n") >= 3)
            .select("l_partkey", "n", "min_up", "max_up",
                    F.round(F.col("max_up") / F.col("min_up"), 9)
                    .alias("spread_ratio"),
                    F.when(F.col("max_up") / F.col("min_up") > 1.5, 1)
                    .otherwise(0).alias("inconsistent")))


@query("dq_referential_orphans", """
SELECT 'orders->customer' AS fk_edge,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
       (SELECT COUNT(*) FROM orders) AS n_rows
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'events->customer',
       (SELECT COUNT(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id)),
       (SELECT COUNT(*) FROM events)
""")
def dq_referential_orphans(spark, sf_dir):
    """Referential-integrity sweep across the WHOLE star schema in one
    result: orphan counts for every fact→dimension edge via LEFT ANTI
    joins (the scalable NOT EXISTS — dimension keys broadcast, facts
    never shuffle). The cross-table complement of dq_constraint_report's
    single-edge check; a non-zero row fails the ingest gate.

    One LAZY plan (r15): the old shape ran 2 eager driver actions per
    edge (anti-join .count() + fact .count() feeding createDataFrame) —
    8 sequential jobs of pure latency. Now each edge is a 1-row
    crossJoin of its two lazy aggregates and the 4 edges union into a
    single job whose 8 aggregate subtrees schedule concurrently; counts
    are computed by the identical anti-join, so values are unchanged."""
    def orphans(fact, fact_key, dim, dim_key, label):
        f = t(spark, sf_dir, fact)
        d = t(spark, sf_dir, dim).select(dim_key)
        n_orphans = (f.join(F.broadcast(d),
                            F.col(fact_key) == F.col(dim_key), "left_anti")
                     .agg(F.count(F.lit(1)).cast("bigint")
                          .alias("n_orphans")))
        n_rows = f.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        return (n_orphans.crossJoin(n_rows)
                .select(F.lit(label).alias("fk_edge"),
                        "n_orphans", "n_rows"))

    out = orphans("orders", "o_custkey", "customer", "c_custkey",
                  "orders->customer")
    for args in (("lineitem", "l_orderkey", "orders", "o_orderkey",
                  "lineitem->orders"),
                 ("lineitem", "l_partkey", "part", "p_partkey",
                  "lineitem->part"),
                 ("events", "user_id", "customer", "c_custkey",
                  "events->customer")):
        out = out.unionAll(orphans(*args))
    return out


@query("brand_concentration_hhi", """
WITH counts AS (
  SELECT p_type, p_brand, COUNT(*) AS n
  FROM part GROUP BY 1, 2
),
tot AS (
  SELECT p_type, CAST(SUM(n) AS BIGINT) AS type_n FROM counts GROUP BY 1
)
SELECT c.p_type, tot.type_n,
       COUNT(*) AS n_brands,
       CAST(SUM(CAST(ROUND((c.n / CAST(tot.type_n AS DOUBLE))
                           * (c.n / CAST(tot.type_n AS DOUBLE)), 9)
                     AS DECIMAL(20,9))) AS DOUBLE) AS hhi
FROM counts c JOIN tot USING (p_type)
GROUP BY c.p_type, tot.type_n
""")
def brand_concentration_hhi(spark, sf_dir):
    """Herfindahl–Hirschman concentration index per part type (sum of
    squared brand shares; 1/n_brands = even market, 1.0 = monopoly) —
    the same statistic that flags SOURCE concentration risk in a
    training-corpus mixture. Integer shares squared, per-term round-9
    then exact decimal sum; all aggregations combinable."""
    p = t(spark, sf_dir, "part")
    counts = p.groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("p_type").agg(F.sum("n").alias("type_n"))
    share = F.col("n") / F.col("type_n").cast("double")
    return (counts.join(F.broadcast(tot), "p_type")
            .groupBy("p_type", "type_n")
            .agg(F.count(F.lit(1)).alias("n_brands"),
                 F.sum(F.round(share * share, 9).cast("decimal(20,9)"))
                 .cast("double").alias("hhi")))


@query("customer_revenue_deciles", """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
           AS cust_rev
  FROM orders GROUP BY 1
),
banded AS (
  SELECT o_custkey, cust_rev,
         NTILE(10) OVER (ORDER BY cust_rev DESC, o_custkey) AS decile
  FROM rev
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(CAST(cust_rev AS DECIMAL(30,8))) AS DOUBLE) AS decile_rev,
       ROUND(MIN(cust_rev), 9) AS min_rev,
       ROUND(MAX(cust_rev), 9) AS max_rev
FROM banded GROUP BY decile
""")
def customer_revenue_deciles(spark, sf_dir):
    """Decile analysis: customers ranked into revenue tenths with each
    band's total and boundaries — the classic value-segmentation report
    (the top decile's share IS the Pareto number). NTILE over the
    per-customer aggregate (customer-count-sized, not order-sized);
    exact-decimal totals."""
    o = t(spark, sf_dir, "orders")
    rev = (o.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                .cast("double").alias("cust_rev")))
    w = Window.orderBy(F.desc("cust_rev"), "o_custkey")
    banded = rev.withColumn("decile", F.ntile(10).over(w))
    return (banded.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum(F.col("cust_rev").cast("decimal(30,8)"))
                 .cast("double").alias("decile_rev"),
                 F.round(F.min("cust_rev"), 9).alias("min_rev"),
                 F.round(F.max("cust_rev"), 9).alias("max_rev")))


# ---------------------------------------------------------------------------
# trimmed mean per group (drop the tails, don't clip them)
# ---------------------------------------------------------------------------


@query("agg_trimmed_mean", """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         PERCENT_RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice, l_orderkey,
                                       l_linenumber) AS pr
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
         / COUNT(*) AS trimmed_mean
FROM ranked
WHERE pr >= 0.1 AND pr <= 0.9
GROUP BY l_returnflag
""")
def agg_trimmed_mean(spark, sf_dir):
    """10% TRIMMED MEAN per group — the robust location estimate that
    DROPS the tails instead of clipping them (winsorize_stats' sibling;
    trimming is what rating aggregation and robust benchmarks use).
    Membership comes from PERCENT_RANK with a fully deterministic
    (value, orderkey, linenumber) tiebreak so the kept set is identical
    cross-engine; the mean is an exact decimal sum over the kept rows
    with the plain IEEE division emitted unrounded (decimal-sum/count
    rule). One window partitioned by the group key + one combinable
    aggregation."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select("l_returnflag", "l_extendedprice",
                       F.percent_rank().over(w).alias("pr"))
    return (ranked.filter((F.col("pr") >= 0.1) & (F.col("pr") <= 0.9))
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 (F.sum(F.col("l_extendedprice").cast("decimal(30,8)"))
                  .cast("double") / F.count(F.lit(1)))
                 .alias("trimmed_mean")))


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov drift statistic
# ---------------------------------------------------------------------------


@query("drift_ks_statistic", """
WITH tagged AS (
  SELECT o_totalprice AS v,
         CASE WHEN CAST(date_trunc('month', o_orderdate) AS DATE)
                   = DATE '1995-03-01' THEN 1 ELSE 0 END AS in_a,
         CASE WHEN CAST(date_trunc('month', o_orderdate) AS DATE)
                   = DATE '1995-09-01' THEN 1 ELSE 0 END AS in_b
  FROM orders
  WHERE CAST(date_trunc('month', o_orderdate) AS DATE)
        IN (DATE '1995-03-01', DATE '1995-09-01')
),
tot AS (SELECT CAST(SUM(in_a) AS DOUBLE) AS na,
               CAST(SUM(in_b) AS DOUBLE) AS nb FROM tagged),
cdf AS (
  SELECT v,
         SUM(SUM(in_a)) OVER (ORDER BY v) AS ca,
         SUM(SUM(in_b)) OVER (ORDER BY v) AS cb
  FROM tagged GROUP BY v
)
SELECT CAST(t.na AS BIGINT) AS n_sample_a,
       CAST(t.nb AS BIGINT) AS n_sample_b,
       ROUND(MAX(ABS(CAST(c.ca AS DOUBLE) / t.na
                     - CAST(c.cb AS DOUBLE) / t.nb)), 9) AS ks_stat
FROM cdf c CROSS JOIN tot t
GROUP BY t.na, t.nb
""")
def drift_ks_statistic(spark, sf_dir):
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV drift statistic: sup |F_A - F_B|
    between the March and September 1995 order-value distributions —
    the binning-free companion to psi_distribution_stability (PSI needs
    bucket choices; KS doesn't). Empirical CDFs from one grouped count
    + a running-sum window over the pooled distinct values; the sup is
    a plain MAX over exact-count ratios, so the statistic is
    deterministic with no rounding anywhere before the final fence.
    Scale: the window runs over DISTINCT values of the metric (bounded
    support), not rows; everything upstream is combinable counts."""
    o = t(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date")
    tagged = (o.filter(month.isin("1995-03-01", "1995-09-01"))
              .select(F.col("o_totalprice").alias("v"),
                      F.when(month == "1995-03-01", 1).otherwise(0)
                      .alias("in_a"),
                      F.when(month == "1995-09-01", 1).otherwise(0)
                      .alias("in_b")))
    tot = tagged.agg(F.sum("in_a").cast("double").alias("na"),
                     F.sum("in_b").cast("double").alias("nb"))
    cdf = (tagged.groupBy("v")
           .agg(F.sum("in_a").alias("ga"), F.sum("in_b").alias("gb"))
           .select("v",
                   F.sum("ga").over(Window.orderBy("v")).alias("ca"),
                   F.sum("gb").over(Window.orderBy("v")).alias("cb")))
    return (cdf.crossJoin(F.broadcast(tot))
            .groupBy("na", "nb")
            .agg(F.round(F.max(F.abs(
                F.col("ca").cast("double") / F.col("na")
                - F.col("cb").cast("double") / F.col("nb"))), 9)
                 .alias("ks_stat"))
            .select(F.col("na").cast("bigint").alias("n_sample_a"),
                    F.col("nb").cast("bigint").alias("n_sample_b"),
                    "ks_stat"))


# ---------------------------------------------------------------------------
# schema-drift / profile-diff between two snapshots
# ---------------------------------------------------------------------------


@query("dq_schema_drift", """
WITH old_half AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
new_half AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1),
po AS (
  SELECT COUNT(*) AS n,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS k_prio,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS nulls_price,
         MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
           / COUNT(*) AS mean_price
  FROM old_half
),
pn AS (
  SELECT COUNT(*) AS n,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS k_prio,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS nulls_price,
         MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
           / COUNT(*) AS mean_price
  FROM new_half
)
SELECT po.n AS n_old, pn.n AS n_new,
       po.k_prio AS k_prio_old, pn.k_prio AS k_prio_new,
       po.nulls_price AS nulls_old, pn.nulls_price AS nulls_new,
       ROUND(pn.min_price - po.min_price, 9) AS min_shift,
       ROUND(pn.max_price - po.max_price, 9) AS max_shift,
       ROUND(pn.mean_price - po.mean_price, 9) AS mean_shift,
       (pn.k_prio != po.k_prio
        OR pn.nulls_price != po.nulls_price
        OR ABS(pn.mean_price - po.mean_price)
           > 0.05 * ABS(po.mean_price)) AS drift_flag
FROM po CROSS JOIN pn
""")
def dq_schema_drift(spark, sf_dir):
    """PROFILE-DIFF between two snapshots (the data-contract check a
    pipeline runs before promoting a new partition): cardinality, null
    counts, min/max and exact-decimal means of the key metric column in
    OLD vs NEW, with shift deltas and a composite drift flag (category
    cardinality change, null-rate change, or >5% mean shift). Two
    combinable profile aggregations + a 1-row join; every published
    delta is a round-9 difference of deterministic values. Snapshots
    are synthesized as the even/odd orderkey halves so the comparison
    value-checks."""
    o = t(spark, sf_dir, "orders")

    def prof(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderpriority").alias("k_prio"),
            F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
            .cast("bigint").alias("nulls_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
             .cast("double") / F.count(F.lit(1))).alias("mean_price"))

    po = prof(o.filter(F.col("o_orderkey") % 2 == 0)).alias("po")
    pn = prof(o.filter(F.col("o_orderkey") % 2 == 1)).alias("pn")
    return (po.crossJoin(pn)
            .select(F.col("po.n").alias("n_old"),
                    F.col("pn.n").alias("n_new"),
                    F.col("po.k_prio").alias("k_prio_old"),
                    F.col("pn.k_prio").alias("k_prio_new"),
                    F.col("po.nulls_price").alias("nulls_old"),
                    F.col("pn.nulls_price").alias("nulls_new"),
                    F.round(F.col("pn.min_price")
                            - F.col("po.min_price"), 9).alias("min_shift"),
                    F.round(F.col("pn.max_price")
                            - F.col("po.max_price"), 9).alias("max_shift"),
                    F.round(F.col("pn.mean_price")
                            - F.col("po.mean_price"), 9)
                    .alias("mean_shift"),
                    ((F.col("pn.k_prio") != F.col("po.k_prio"))
                     | (F.col("pn.nulls_price") != F.col("po.nulls_price"))
                     | (F.abs(F.col("pn.mean_price")
                              - F.col("po.mean_price"))
                        > 0.05 * F.abs(F.col("po.mean_price"))))
                    .alias("drift_flag")))


# ---------------------------------------------------------------------------
# sequence-contiguity audit (round 7)
# ---------------------------------------------------------------------------

@query("dq_sequence_gap_audit", """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_lines,
         COUNT(DISTINCT l_linenumber) AS n_distinct,
         MIN(l_linenumber) AS lo,
         MAX(l_linenumber) AS hi
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, n_lines, lo, hi,
       CAST(hi - lo + 1 - n_distinct AS BIGINT) AS n_missing,
       CAST(n_lines - n_distinct AS BIGINT) AS n_dup,
       CAST(CASE WHEN lo != 1 THEN 1 ELSE 0 END AS INT)
         AS starts_late
FROM per_order
WHERE hi - lo + 1 != n_distinct OR n_lines != n_distinct OR lo != 1
""")
def dq_sequence_gap_audit(spark, sf_dir):
    """SEQUENCE-CONTIGUITY audit: per order, its line numbers should be
    a dense 1..n run — gaps mean dropped records, duplicates mean
    double-delivery, a late start means a lost head. The classic
    ingestion-completeness check for any per-entity sequence column
    (line numbers, kafka offsets per key, page numbers), computed with
    ONE combinable aggregation (count, distinct-count, min, max) per
    key — no window, no sort, no self-join; the dense-run invariant
    hi-lo+1 == n_distinct does all the work arithmetically."""
    li = t(spark, sf_dir, "lineitem")
    per = (li.groupBy("l_orderkey")
           .agg(F.count(F.lit(1)).alias("n_lines"),
                F.countDistinct("l_linenumber").alias("n_distinct"),
                F.min("l_linenumber").alias("lo"),
                F.max("l_linenumber").alias("hi")))
    span = F.col("hi") - F.col("lo") + 1
    return (per.filter((span != F.col("n_distinct"))
                       | (F.col("n_lines") != F.col("n_distinct"))
                       | (F.col("lo") != 1))
            .select("l_orderkey", "n_lines", "lo", "hi",
                    (span - F.col("n_distinct")).cast("bigint")
                    .alias("n_missing"),
                    (F.col("n_lines") - F.col("n_distinct")).cast("bigint")
                    .alias("n_dup"),
                    F.when(F.col("lo") != 1, 1).otherwise(0).cast("int")
                    .alias("starts_late")))


# ---------------------------------------------------------------------------
# header-detail reconciliation report (round 7)
# ---------------------------------------------------------------------------

@query("dq_header_detail_reconcile", """
WITH detail AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax), 9) AS DECIMAL(30,9)))
              AS DOUBLE) AS detail_total
  FROM lineitem GROUP BY l_orderkey
),
joined AS (
  SELECT o.o_orderkey, o.o_totalprice, d.detail_total,
         CASE
           WHEN d.detail_total IS NULL THEN 'no_detail'
           WHEN (d.detail_total - o.o_totalprice) / o.o_totalprice < -0.5
             THEN 'under_50pct'
           WHEN (d.detail_total - o.o_totalprice) / o.o_totalprice < -0.1
             THEN 'under_10pct'
           WHEN (d.detail_total - o.o_totalprice) / o.o_totalprice <= 0.1
             THEN 'within_10pct'
           WHEN (d.detail_total - o.o_totalprice) / o.o_totalprice <= 0.5
             THEN 'over_10pct'
           ELSE 'over_50pct'
         END AS band
  FROM orders o LEFT JOIN detail d ON d.l_orderkey = o.o_orderkey
),
bands AS (
  SELECT band, COUNT(*) AS n_orders FROM joined GROUP BY band
),
orphan AS (
  SELECT 'detail_without_header' AS band, COUNT(*) AS n_orders
  FROM (SELECT DISTINCT l.l_orderkey FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
)
SELECT band, CAST(n_orders AS BIGINT) AS n_orders FROM bands
UNION ALL
SELECT band, CAST(n_orders AS BIGINT) FROM orphan
""")
def dq_header_detail_reconcile(spark, sf_dir):
    """HEADER-DETAIL RECONCILIATION: the classic financial-DQ control —
    does each order header's total match the sum of its lines? Output is
    the banded mismatch distribution (within 10%, over/under by 10/50%),
    headers with NO detail rows, and orphan details with no header (the
    anti-join leg) — the daily report a billing pipeline alarms on.
    Detail sums are round-9 exact-decimal (combinable); band edges
    compare identically-derived doubles, so banding is engine-exact;
    every output is an integer count."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    line_total = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax")))
    detail = (li.groupBy("l_orderkey")
              .agg(F.sum(F.round(line_total, 9).cast("decimal(30,9)"))
                   .cast("double").alias("detail_total")))
    rel = ((F.col("detail_total") - F.col("o_totalprice"))
           / F.col("o_totalprice"))
    band = (F.when(F.col("detail_total").isNull(), "no_detail")
            .when(rel < -0.5, "under_50pct")
            .when(rel < -0.1, "under_10pct")
            .when(rel <= 0.1, "within_10pct")
            .when(rel <= 0.5, "over_10pct")
            .otherwise("over_50pct"))
    joined = (o.join(detail, o["o_orderkey"] == detail["l_orderkey"],
                     "left")
              .select(band.alias("band")))
    bands = (joined.groupBy("band")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    orphan = (li.select("l_orderkey").distinct()
              .join(o.select("o_orderkey"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                    "left_anti")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
              .select(F.lit("detail_without_header").alias("band"),
                      "n_orders"))
    return bands.unionAll(orphan)


# ---------------------------------------------------------------------------
# Mann-Whitney AUC of a ranking signal (round 7)
# ---------------------------------------------------------------------------

@query("eval_auc_mann_whitney", """
WITH scores AS (
  SELECT n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
byv AS (
  SELECT s, COUNT(*) AS c, CAST(SUM(y) AS BIGINT) AS cpos
  FROM scores GROUP BY s
),
w AS (
  SELECT s, c, cpos,
         SUM(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - c AS below
  FROM byv
),
sums AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(cpos) AS BIGINT) AS n_pos,
         SUM(cpos * (below + (c + 1) / 2.0e0)) AS rank_sum_pos
  FROM w
)
SELECT n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
       (rank_sum_pos - n_pos * (n_pos + 1) / 2.0e0)
         / (CAST(n_pos AS DOUBLE) * (n - n_pos)) AS auc
FROM sums
""")
def eval_auc_mann_whitney(spark, sf_dir):
    """AUC-ROC of a ranking signal via the Mann-Whitney U statistic with
    proper MIDRANKS for ties: AUC = (R1 - n1(n1+1)/2) / (n1*n0), where
    R1 is the positives' tie-adjusted rank sum — the model-evaluation
    primitive, computed here for document length as an English-language
    discriminator. No per-row window: ranks come from ONE cumulative sum
    over the DISTINCT-score table (avg rank of a tied value = #below +
    (count+1)/2), so the shuffle is bounded by score cardinality, not
    row count. Every quantity is an integer or an exact half — AUC is a
    single division of bit-identical operands."""
    d = t(spark, sf_dir, "documents")
    scores = d.select(F.col("n_chars").alias("s"),
                      F.when(F.col("lang") == "en", 1).otherwise(0)
                      .alias("y"))
    byv = scores.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("y").cast("bigint").alias("cpos"))
    wcum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w = byv.withColumn("below", F.sum("c").over(wcum) - F.col("c"))
    sums = w.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("cpos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cpos")
              * (F.col("below") + (F.col("c") + 1) / F.lit(2.0)))
        .alias("rank_sum_pos"))
    return sums.select(
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        ((F.col("rank_sum_pos")
          - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0))
         / (F.col("n_pos").cast("double") * (F.col("n") - F.col("n_pos"))))
        .alias("auc"))


# ---------------------------------------------------------------------------
# area under the precision-recall curve (round 9f)
# ---------------------------------------------------------------------------

@query("eval_auc_pr", """
WITH scores AS (
  SELECT n_chars AS s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
byv AS (
  SELECT s, COUNT(*) AS c, CAST(SUM(y) AS BIGINT) AS cpos
  FROM scores GROUP BY s
),
cum AS (
  SELECT s,
         CAST(SUM(c) OVER (ORDER BY s DESC
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp,
         CAST(SUM(cpos) OVER (ORDER BY s DESC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         CAST(COALESCE(SUM(cpos) OVER (ORDER BY s DESC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS BIGINT)
           AS tp_prev
  FROM byv
),
tot AS (
  SELECT CAST(SUM(cpos) AS BIGINT) AS n_pos,
         CAST(SUM(c) AS BIGINT) AS n_total
  FROM byv
)
SELECT n_pos, n_total,
       n_pos / CAST(n_total AS DOUBLE) AS prevalence,
       CAST(SUM(CAST(ROUND(((tp - tp_prev) / CAST(n_pos AS DOUBLE))
                           * (tp / CAST(pp AS DOUBLE)), 9)
                     AS DECIMAL(20,9))) AS DOUBLE) AS auprc
FROM cum CROSS JOIN tot
GROUP BY n_pos, n_total
""")
def eval_auc_pr(spark, sf_dir):
    """Average precision (AUPRC, the step-wise interpolation sklearn
    calls average_precision_score): AP = sum_k (R_k - R_(k-1)) * P_k
    over thresholds descending — the imbalance-robust companion to the
    Mann-Whitney AUROC entry, on the same length-predicts-English
    classifier. Always compare against `prevalence` (the random-
    classifier AUPRC), not 0.5.

    Same scale shape as eval_pr_threshold_sweep: one reverse cumulative
    sum over the DISTINCT-score table (recall deltas come from a LAG-
    style shifted frame in the same window order — no self-join), so
    shuffle volume is score cardinality. Each AP term is a product of
    two integer-ratio divisions, round-9 fenced into one exact decimal
    sum."""
    d = t(spark, sf_dir, "documents")
    scores = d.select(F.col("n_chars").alias("s"),
                      F.when(F.col("lang") == "en", 1).otherwise(0)
                      .alias("y"))
    byv = scores.groupBy("s").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("y").cast("bigint").alias("cpos"))
    wrev = (Window.orderBy(F.desc("s"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wprev = (Window.orderBy(F.desc("s"))
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = byv.select(
        "s",
        F.sum("c").over(wrev).cast("bigint").alias("pp"),
        F.sum("cpos").over(wrev).cast("bigint").alias("tp"),
        F.coalesce(F.sum("cpos").over(wprev), F.lit(0)).cast("bigint")
        .alias("tp_prev"))
    tot = byv.agg(F.sum("cpos").cast("bigint").alias("n_pos"),
                  F.sum("c").cast("bigint").alias("n_total"))
    term = (((F.col("tp") - F.col("tp_prev"))
             / F.col("n_pos").cast("double"))
            * (F.col("tp") / F.col("pp").cast("double")))
    return (cum.crossJoin(F.broadcast(tot))
            .groupBy("n_pos", "n_total")
            .agg(F.sum(F.round(term, 9).cast("decimal(20,9)"))
                 .cast("double").alias("auprc"))
            .select("n_pos", "n_total",
                    (F.col("n_pos") / F.col("n_total").cast("double"))
                    .alias("prevalence"),
                    "auprc"))


# ---------------------------------------------------------------------------
# RFM segment migration matrix (round 9f)
# ---------------------------------------------------------------------------

@query("rfm_migration_matrix", """
WITH spend AS (
  SELECT o_custkey,
         CASE WHEN CAST(o_orderdate AS DATE) < CAST('1998-07-01' AS DATE)
              THEN 1 ELSE 2 END AS period,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS m
  FROM orders GROUP BY 1, 2
),
seg AS (
  SELECT o_custkey, period,
         NTILE(5) OVER (PARTITION BY period
                        ORDER BY m DESC, o_custkey ASC) AS quintile
  FROM spend
),
mig AS (
  SELECT a.quintile AS seg_p1, b.quintile AS seg_p2,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM seg a JOIN seg b ON b.o_custkey = a.o_custkey
  WHERE a.period = 1 AND b.period = 2
  GROUP BY 1, 2
),
rowtot AS (
  SELECT seg_p1, CAST(SUM(n_customers) AS BIGINT) AS row_n
  FROM mig GROUP BY seg_p1
)
SELECT m.seg_p1, m.seg_p2, m.n_customers,
       m.n_customers / CAST(r.row_n AS DOUBLE) AS row_share
FROM mig m JOIN rowtot r ON r.seg_p1 = m.seg_p1
""")
def rfm_migration_matrix(spark, sf_dir):
    """Customer-value MIGRATION matrix: spend-quintile segment in the
    early period (orders before 1995) vs the late period, for customers
    active in both — the segment-transition table behind churn/upsell
    playbooks (diagonal = stable value, below-diagonal = upgrades).
    Complements the static rfm_segmentation snapshot with dynamics.

    NTILE is partitioned per period with a (spend desc, custkey)
    tiebreak so quintile boundaries are engine-exact; per-customer
    spend is an exact decimal sum; the matrix is at most 25 rows and
    row_share is one integer-ratio division. The self-join matches on
    customer id (period filters on each side) — both sides are the
    per-customer aggregate, never raw orders."""
    o = t(spark, sf_dir, "orders")
    period = F.when(F.col("o_orderdate").cast("date")
                    < F.lit("1998-07-01").cast("date"), 1).otherwise(2)
    spend = (o.groupBy("o_custkey", period.alias("period"))
             .agg(dsum("o_totalprice").alias("m")))
    wq = Window.partitionBy("period").orderBy(F.desc("m"),
                                              F.asc("o_custkey"))
    # both join sides and the row totals read the segment table —
    # materialize it once (lazy localCheckpoint) so the spend rollup +
    # NTILE window don't re-run per consumer
    seg = (spend.select("o_custkey", "period",
                        F.ntile(5).over(wq).alias("quintile"))
           .transform(materialize))
    a = (seg.filter(F.col("period") == 1)
         .select("o_custkey", F.col("quintile").alias("seg_p1")))
    b = (seg.filter(F.col("period") == 2)
         .select(F.col("o_custkey").alias("ck2"),
                 F.col("quintile").alias("seg_p2")))
    mig = (a.join(b, F.col("o_custkey") == F.col("ck2"))
           .groupBy("seg_p1", "seg_p2")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers")))
    rowtot = mig.groupBy("seg_p1").agg(
        F.sum("n_customers").cast("bigint").alias("row_n"))
    return (mig.join(F.broadcast(rowtot), "seg_p1")
            .select("seg_p1", "seg_p2", "n_customers",
                    (F.col("n_customers") / F.col("row_n").cast("double"))
                    .alias("row_share")))


# ---------------------------------------------------------------------------
# functional-dependency violation report (round 9g)
# ---------------------------------------------------------------------------

def _fd_sql(fd_name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
  SELECT '{fd_name}' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS violating_groups,
         CAST(SUM(total - mx) AS BIGINT) AS g3_rows_to_remove,
         CAST(SUM(total - mx) AS DOUBLE) / SUM(total) AS g3_error
  FROM (
    SELECT {lhs}, COUNT(*) AS n_rhs,
           CAST(SUM(c) AS BIGINT) AS total, MAX(c) AS mx
    FROM (SELECT {lhs}, {rhs}, COUNT(*) AS c FROM {table}
          GROUP BY {lhs}, {rhs})
    GROUP BY {lhs}
  )"""


_FD_CHECKS = [
    ("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("lineitem.l_orderkey->l_shipdate", "lineitem", "l_orderkey",
     "l_shipdate"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey",
     "l_suppkey"),
]


@query("dq_functional_dependencies", "\nUNION ALL\n".join(
    _fd_sql(*c) for c in _FD_CHECKS))
def dq_functional_dependencies(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY violation report: for each declared
    candidate FD X -> Y, the number of X-groups with more than one Y
    value and the g3 error (minimum rows to remove for the FD to hold,
    Kivinen & Mannila 1995) — the schema-normalization / dirty-data
    check that dq_constraint_report's null/FK/range rules don't cover.
    A PK-backed FD (o_orderkey -> o_custkey) must report zero; the
    deliberately-false candidates quantify HOW non-functional the
    relationship is, which is what you triage after a bad upstream
    merge.

    Each FD is a two-level combinable aggregation ((X, Y) counts, then
    per-X total/max/distinct) — shuffles keyed by the FD's own columns;
    g3_error is one integer-ratio division. Report-sized union output.

    Exchange discipline (VERDICT r10 #4): each FD pre-partitions its
    table by the FD's LHS, which satisfies the clustering requirement
    of BOTH aggregation levels ((X, Y) and X groupings co-locate under
    hash(X)), so the two-level rollup rides ONE exchange per FD; the
    four 1-row finals then fuse into a single groupBy(fd) over the
    unioned per-X reports — 5 exchanges total instead of the naive 12
    (per-FD shuffle + per-FD regroup + per-FD global)."""
    parts = []
    for fd_name, table, lhs, rhs in _FD_CHECKS:
        df = t(spark, sf_dir, table).repartition(F.col(lhs))
        inner = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("c"))
        per_l = (inner.groupBy(lhs).agg(
            F.count(F.lit(1)).alias("n_rhs"),
            F.sum("c").cast("bigint").alias("total"),
            F.max("c").alias("mx"))
            .select(F.lit(fd_name).alias("fd"), "n_rhs", "total", "mx"))
        parts.append(per_l)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return (u.groupBy("fd")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                 F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                 .cast("bigint").alias("violating_groups"),
                 F.sum(F.col("total") - F.col("mx")).cast("bigint")
                 .alias("g3_rows_to_remove"),
                 (F.sum(F.col("total") - F.col("mx")).cast("double")
                  / F.sum("total")).alias("g3_error")))


# ---------------------------------------------------------------------------
# distributional audits (round 10): Cramér's V effect size
# (a Benford first-digit audit already exists: trend.py:benford_first_digit)
# ---------------------------------------------------------------------------

@query("categorical_cramers_v", """
WITH obs AS (
  SELECT p_brand, p_size, COUNT(*) AS o
  FROM part GROUP BY 1, 2
),
marg AS (
  SELECT b.p_brand, c.p_size, b.nb, c.nc, tot.n
  FROM (SELECT p_brand, CAST(SUM(o) AS BIGINT) AS nb
        FROM obs GROUP BY 1) b
  CROSS JOIN (SELECT p_size, CAST(SUM(o) AS BIGINT) AS nc
              FROM obs GROUP BY 1) c
  CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs) tot
),
chi AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT marg.p_brand) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT marg.p_size) AS BIGINT) AS n_cols,
         CAST(SUM(CAST(ROUND(
           (COALESCE(obs.o, 0) - (marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n)
           * (COALESCE(obs.o, 0) - (marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n)
           / ((marg.nb * CAST(marg.nc AS DOUBLE)) / marg.n), 9)
           AS DECIMAL(30,9))) AS DOUBLE) AS chi2
  FROM marg
  LEFT JOIN obs ON obs.p_brand = marg.p_brand
               AND obs.p_size = marg.p_size
)
SELECT n, n_rows, n_cols, chi2,
       sqrt((chi2 / n) / LEAST(n_rows - 1, n_cols - 1)) AS cramers_v
FROM chi
""")
def categorical_cramers_v(spark, sf_dir):
    """CRAMÉR'S V effect size (Cramér 1946) for the brand × size
    association: V = sqrt((chi2/n) / min(r-1, c-1)) — the normalized
    [0,1] companion the raw chi-square statistic
    (categorical_chi2_independence) lacks, comparable across tables of
    different shapes. Same full-grid chi-square recipe (marginal cross
    join supplies empty cells, per-cell round-9, exact decimal sum);
    the final V is a plain composition of already-identical doubles and
    exact integers, emitted unrounded per the repo's derived-ratio
    discipline."""
    p = t(spark, sf_dir, "part")
    # obs is the (brands x sizes)-bounded contingency table with FOUR
    # consumers (both marginals, the total, the grid join) — checkpoint
    # it, and broadcast it into the full-grid left join (r11 exchange
    # discipline: 9 -> 5 exchanges)
    obs = (p.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).alias("o")).transform(materialize))
    nb = obs.groupBy("p_brand").agg(F.sum("o").alias("nb"))
    nc = obs.groupBy("p_size").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    marg = nb.crossJoin(nc).crossJoin(F.broadcast(tot))
    grid = marg.join(F.broadcast(obs), ["p_brand", "p_size"], "left")
    exp = (F.col("nb") * F.col("nc").cast("double")) / F.col("n")
    dev = F.coalesce(F.col("o"), F.lit(0)) - exp
    cell = F.round(dev * dev / exp, 9)
    chi = grid.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("p_brand").cast("bigint").alias("n_rows"),
        F.countDistinct("p_size").cast("bigint").alias("n_cols"),
        F.sum(cell.cast("decimal(30,9)")).cast("double").alias("chi2"))
    return chi.select(
        "n", "n_rows", "n_cols", "chi2",
        F.sqrt((F.col("chi2") / F.col("n"))
               / F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
               .cast("double")).alias("cramers_v"))


@query("drift_psi_report", """
WITH days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
ranked AS (
  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS nd
  FROM days
),
cutoff AS (SELECT day AS cut FROM ranked WHERE rn = (nd + 1) // 2),
lab AS (
  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
         CASE WHEN CAST(o_orderdate AS DATE) <= c.cut
              THEN 1 ELSE 0 END AS is_before
  FROM orders CROSS JOIN cutoff c
),
cells AS (
  SELECT bucket,
         CAST(SUM(is_before) AS BIGINT) AS n_before,
         CAST(SUM(1 - is_before) AS BIGINT) AS n_after
  FROM lab GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(n_before) AS BIGINT) AS np,
         CAST(SUM(n_after) AS BIGINT) AS nq,
         CAST(COUNT(*) AS BIGINT) AS b
  FROM cells
)
SELECT c.bucket, c.n_before, c.n_after,
       (c.n_before + 1) / CAST(t.np + t.b AS DOUBLE) AS p_before,
       (c.n_after + 1) / CAST(t.nq + t.b AS DOUBLE) AS p_after,
       ROUND(((c.n_after + 1) / CAST(t.nq + t.b AS DOUBLE)
              - (c.n_before + 1) / CAST(t.np + t.b AS DOUBLE))
             * LN(CAST((c.n_after + 1) * (t.np + t.b) AS DOUBLE)
                  / CAST((c.n_before + 1) * (t.nq + t.b) AS DOUBLE)),
             9) AS psi_term
FROM cells c CROSS JOIN tot t
""")
def drift_psi_report(spark, sf_dir):
    """POPULATION STABILITY INDEX between the first and second half of
    the order history (split at the median distinct day, integer-rank
    arithmetic so both engines pick the identical cutoff) over the
    standard fixed-width value buckets — the model-monitoring drift
    metric production scorecards run beside the KS statistic
    (drift_ks_statistic): PSI = Σ (q-p)·ln(q/p), < 0.1 stable / > 0.25
    action. Empty-on-one-side buckets are handled by add-one (Laplace)
    smoothing with INTEGER counts — the usual epsilon hack is a float
    literal that poisons cross-engine hashes; (c+1)/(n+B) keeps every
    probability an integer ratio and every log a ratio of integer
    products. Per-bucket contributions round-9; the report is
    bucket-grid-sized; two combinable passes."""
    o = t(spark, sf_dir, "orders")
    days = o.select(F.col("o_orderdate").cast("date").alias("day")
                    ).distinct()
    from pyspark.sql import Window as W
    ranked = days.select(
        "day", F.row_number().over(W.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nd"))
    cutoff = (ranked.filter(F.col("rn") == F.expr("(nd + 1) div 2"))
              .select(F.col("day").alias("cut")))
    lab = (o.crossJoin(F.broadcast(cutoff))
           .select(F.floor(F.col("o_totalprice") / 50000.0)
                   .cast("bigint").alias("bucket"),
                   F.when(F.col("o_orderdate").cast("date")
                          <= F.col("cut"), 1).otherwise(0)
                   .alias("is_before")))
    cells = (lab.groupBy("bucket")
             .agg(F.sum("is_before").cast("bigint").alias("n_before"),
                  F.sum(1 - F.col("is_before")).cast("bigint")
                  .alias("n_after"))
             .transform(materialize))  # feeds totals + report
    tot = cells.agg(F.sum("n_before").cast("bigint").alias("np"),
                    F.sum("n_after").cast("bigint").alias("nq"),
                    F.count(F.lit(1)).cast("bigint").alias("b"))
    p = (F.col("n_before") + 1) / (F.col("np") + F.col("b")).cast("double")
    q = (F.col("n_after") + 1) / (F.col("nq") + F.col("b")).cast("double")
    lr = F.log(((F.col("n_after") + 1) * (F.col("np") + F.col("b")))
               .cast("double")
               / ((F.col("n_before") + 1) * (F.col("nq") + F.col("b")))
               .cast("double"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("bucket", "n_before", "n_after",
                    p.alias("p_before"), q.alias("p_after"),
                    F.round((q - p) * lr, 9).alias("psi_term")))


# ---------------------------------------------------------------------------
# Benford first-digit conformance audit (round 12)
# ---------------------------------------------------------------------------

@query("dq_benford_law", """
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
digits AS (
  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cents WHERE c > 0
),
obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
  GROUP BY digit
),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
scored AS (
  SELECT digit, n_obs, n,
         ROUND(LN(1 + 1.0 / CAST(digit AS DOUBLE))
               / LN(CAST(10 AS DOUBLE)), 9) AS expected_share
  FROM obs CROSS JOIN tot
)
SELECT digit, n_obs,
       n_obs / CAST(n AS DOUBLE) AS obs_share,
       expected_share,
       ROUND((n_obs - n * expected_share) * (n_obs - n * expected_share)
             / (n * expected_share), 9) AS chi2_contrib,
       CAST(SUM(CAST(ROUND((n_obs - n * expected_share)
                           * (n_obs - n * expected_share)
                           / (n * expected_share), 9) AS DECIMAL(20,9)))
            OVER () AS DOUBLE) AS chi2_total
FROM scored
""")
def dq_benford_law(spark, sf_dir):
    """BENFORD'S LAW first-digit audit (Benford 1938; Nigrini's fraud
    test) on order totals: observed first-significant-digit shares vs
    the log10(1 + 1/d) expectation, with per-digit chi-square
    contributions and the pooled chi-square — the classic
    fabricated-data detector a data-quality layer runs over money and
    count columns (synthetic uniform-ish generators fail it loudly,
    which is itself the signal here). First digits come from the exact
    integer cents (the PSI recipe's round-then-cast), so digit
    extraction is engine-portable string arithmetic on BIGINTs; the
    expectation is a round-9 ln-ratio from integer literals;
    chi-square terms are round-9 arithmetic on identical doubles,
    decimal-summed by ONE window over the 9-row digit table. Corpus
    work is a single combinable digit count."""
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"))
    digits = (cents.filter(F.col("c") > 0)
              .select(F.substring(F.col("c").cast("string"), 1, 1)
                      .cast("bigint").alias("digit")))
    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    exp_share = F.round(
        F.log(1 + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10).cast("double")), 9)
    scored = (obs.crossJoin(F.broadcast(tot))
              .select("digit", "n_obs", "n",
                      exp_share.alias("expected_share")))
    dev = F.col("n_obs") - F.col("n") * F.col("expected_share")
    contrib = F.round(dev * dev / (F.col("n") * F.col("expected_share")),
                      9)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    return scored.select(
        "digit", "n_obs",
        (F.col("n_obs") / F.col("n").cast("double")).alias("obs_share"),
        "expected_share",
        contrib.alias("chi2_contrib"),
        F.sum(contrib.cast("decimal(20,9)")).over(wall).cast("double")
        .alias("chi2_total"))
