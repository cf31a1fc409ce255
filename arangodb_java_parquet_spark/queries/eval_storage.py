"""Cascade-model ranking metric + storage encodability audit (r12l).

EXPECTED RECIPROCAL RANK (Chapelle et al., CIKM 2009) completes the
retrieval-eval family (nDCG/MRR/AP measure position; ERR models a USER
who stops at the first satisfying result — the metric that actually
tracks abandonment in cascade click models), and an RLE/DICTIONARY
encodability audit measures, per low-cardinality column, exactly the
statistics (distinct count, run count in key order, average run length)
that decide parquet encoding choices — at 100 TB the difference between
a dictionary-RLE column and a plain one is the scan bill.

Determinism: ERR under binary relevance is a sum of exact dyadic
rationals rel/(r * 2^(c+1)) (the cascade survival product is a power of
1/2), round-9 fenced into a per-query decimal sum; the audit is pure
integer counting over an explicit total order (the primary key — never
file order, which no two engines share).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t
from arangodb_java_parquet_spark.queries.evaluation4 import (
    _RANKED_SQL, _ranked)

# ---------------------------------------------------------------------------
# expected reciprocal rank at 10 (cascade model, binary relevance)
# ---------------------------------------------------------------------------

_ERR_K = 10

_ERR_SQL = _RANKED_SQL + f""",
topk AS (
  SELECT qid, rn, rel,
         CAST(COALESCE(SUM(rel) OVER (PARTITION BY qid ORDER BY rn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS c
  FROM ranked WHERE rn <= {_ERR_K}
),
terms AS (
  SELECT qid, rel,
         ROUND(rel / (rn * power(CAST(2 AS DOUBLE), c + 1)), 9) AS term
  FROM topk
)
SELECT qid,
       CAST(SUM(rel) AS BIGINT) AS n_rel_at10,
       CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE) AS err_at10
FROM terms GROUP BY qid
"""


@query("eval_expected_reciprocal_rank", _ERR_SQL)
def eval_expected_reciprocal_rank(spark, sf_dir):
    """EXPECTED RECIPROCAL RANK at 10 (Chapelle et al. 2009): the
    cascade-model metric ERR = sum_r (1/r) R_r prod_(i<r) (1 - R_i)
    with binary relevance R = 1/2 — it models a user who examines
    results top-down and STOPS at the first satisfying one, so a
    relevant result buried under other relevant results earns almost
    nothing (nDCG would still pay it); the metric that tracks
    abandonment. Under R = 1/2 the survival product is exactly
    2^-(count of relevant above), so each term is the exact dyadic
    rational rel/(r * 2^(c+1)) — computed from one cumulative-rel
    window over the shared label-as-relevance ranking base
    (evaluation4._ranked), round-9 fenced into a 10-term decimal sum
    per query. The corpus work is the shared broadcast-query scoring
    scan."""
    ranked = _ranked(spark, sf_dir)
    wq = W.partitionBy("qid").orderBy("rn")
    topk = (ranked.filter(F.col("rn") <= _ERR_K)
            .select("qid", "rn", "rel",
                    F.coalesce(
                        F.sum("rel").over(wq.rowsBetween(
                            W.unboundedPreceding, -1)), F.lit(0))
                    .cast("bigint").alias("c")))
    term = F.round(
        F.col("rel") / (F.col("rn")
                        * F.pow(F.lit(2.0), F.col("c") + 1)), 9)
    return (topk.select("qid", "rel", term.alias("term"))
            .groupBy("qid")
            .agg(F.sum("rel").cast("bigint").alias("n_rel_at10"),
                 F.sum(F.col("term").cast("decimal(20,9)"))
                 .cast("double").alias("err_at10")))


# ---------------------------------------------------------------------------
# RLE / dictionary encodability audit over low-cardinality order columns
# ---------------------------------------------------------------------------

def _audit_leg_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(SUM(new_run) AS BIGINT) AS n_runs,
       COUNT(*) / CAST(SUM(new_run) AS DOUBLE) AS avg_run_len,
       CAST(CASE WHEN COUNT(DISTINCT {col}) <= 1 THEN 0
                 ELSE length(bin(COUNT(DISTINCT {col}) - 1)) END
            AS BIGINT) AS dict_bits
FROM (
  SELECT {col},
         CASE WHEN LAG({col}) OVER (ORDER BY o_orderkey) IS NULL
                OR {col} != LAG({col}) OVER (ORDER BY o_orderkey)
              THEN 1 ELSE 0 END AS new_run
  FROM orders
)"""


# o_orderdate is the deliberate high-cardinality contrast: near-random in
# key order, so runs ~ n and the audit correctly says "plain encoding".
_AUDIT_COLS = ("o_orderstatus", "o_orderpriority", "o_orderdate")

_AUDIT_SQL = "\nUNION ALL\n".join(_audit_leg_sql(c) for c in _AUDIT_COLS)


@query("dq_rle_dictionary_audit", _AUDIT_SQL)
def dq_rle_dictionary_audit(spark, sf_dir):
    """RLE/DICTIONARY ENCODABILITY audit: for each low-cardinality
    orders column, the distinct count, the number of VALUE RUNS in
    primary-key order, the average run length, and the dictionary
    index width ceil(log2(distinct)) — precisely the inputs to the
    parquet encoding decision (long runs in write order -> RLE wins;
    small dictionaries -> dictionary wins; both fail -> plain), i.e.
    the audit a 100 TB pipeline runs before choosing a sort/cluster
    key, complementing the zonemap and z-order entries which audit
    PRUNING the same way. Run boundaries come from one LAG window over
    the EXPLICIT primary-key order (file order is not a cross-engine
    notion); the bit width is exact integer arithmetic via the binary
    representation's length — every output is an exact integer or
    exact rational."""
    o = t(spark, sf_dir, "orders")
    out = None
    for col in _AUDIT_COLS:
        lagc = F.lag(col).over(W.orderBy("o_orderkey"))
        runs = o.select(
            F.col(col).alias("v"),
            F.when(lagc.isNull() | (F.col(col) != lagc), 1)
            .otherwise(0).alias("new_run"))
        leg = runs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum("new_run").cast("bigint").alias("n_runs")).select(
            F.lit(col).alias("col_name"), "n_rows", "n_distinct",
            "n_runs",
            (F.col("n_rows") / F.col("n_runs").cast("double"))
            .alias("avg_run_len"),
            F.when(F.col("n_distinct") <= 1, F.lit(0))
            .otherwise(F.length(F.bin(F.col("n_distinct") - 1)))
            .cast("bigint").alias("dict_bits"))
        out = leg if out is None else out.unionAll(leg)
    return out
