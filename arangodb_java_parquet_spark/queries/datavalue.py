"""KNN-SHAPLEY DATA VALUATION (Jia, Dao et al., VLDB 2019,
"Efficient Task-Specific Data Valuation for Nearest Neighbor
Algorithms") — the per-EXAMPLE valuation leg of the curation family
beside the per-SOURCE weights (DSIR, DoReMi) and the per-sample
selection scores (`select_rho_loss`, `active_margin_sampling`):
the exact Shapley value of each training point for a K-NN utility is
computable in closed form, and it is THE standard cheap data-value
baseline a pretraining-data market/cleaning pipeline runs.

For one validation point, with training points sorted by distance
(pos 1 = nearest, N total, ind_j = [label_j = label_val]):

    s_N = ind_N / N
    s_j = s_{j+1} + (ind_j − ind_{j+1})/K · min(K, j)/j

so s_j = ind_N/N + Σ_{u ≥ j} t_u with t_u = (ind_u − ind_{u+1})/K ·
min(K,u)/u — a pure SUFFIX SUM. The implementation exploits exactly
that: NO sequential fold, just a distance rank window and a
descending-ordered running sum per validation point — the shape that
scales (the rank is the same top-k machinery as `sim_topk_*`; the
suffix sum is one bounded window per query).

Setup: validation = vec_id < 5 (their labels are the targets),
training = the rest; distance = round-9 squared L2 (the `_DOT`
accumulation pairing) with vid tiebreak; K = 5. Output: the top-10
most valuable training points per validation point plus each point's
ind/pos, with the efficiency identity Σ_j s_j = (#correct among the
K nearest)/K pinned in pytest.

Determinism: t_u is a product of small integer-ratio doubles
(bit-identical), round-9'd then DECIMAL(20,9)-summed in the ordered
window (windowed double sums may associate differently per engine —
segment trees — so the decimal fence is load-bearing); s = seed +
exact-sum, emitted UNROUNDED.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries.common import query, t

_K = 5
_TOPN = 10

_DOT = ("list_sum(list_transform(range(1, len({a}) + 1),"
        " i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
        " * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))")

_KS_SQL = f"""WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec, label AS qlab
  FROM embeddings WHERE vec_id < 5
),
tr AS (
  SELECT vec_id AS vid, embedding AS tvec, label AS tlab
  FROM embeddings WHERE vec_id >= 5
),
pairs AS (
  SELECT q.qid, tr.vid,
         round({_DOT.format(a='q.qvec', b='tr.tvec')}, 9) AS d2,
         CASE WHEN tr.tlab = q.qlab THEN 1 ELSE 0 END AS ind
  FROM tr CROSS JOIN q
),
ranked AS (
  SELECT qid, vid, d2, ind,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, vid) AS pos,
         COUNT(*) OVER (PARTITION BY qid) AS n
  FROM pairs
),
terms AS (
  SELECT qid, vid, d2, ind, pos, n,
         MAX(CASE WHEN pos = n THEN ind END)
           OVER (PARTITION BY qid) AS ind_n,
         CASE WHEN pos < n THEN
           round((CAST(ind - LEAD(ind) OVER (PARTITION BY qid
                                             ORDER BY pos)
                       AS DOUBLE) / {_K})
                 * (CAST(least({_K}, pos) AS DOUBLE) / pos), 9)
         ELSE CAST(0 AS DOUBLE) END AS tt
  FROM ranked
),
sval AS (
  SELECT qid, vid, d2, ind, pos,
         (CAST(ind_n AS DOUBLE) / n)
         + CAST(SUM(CAST(tt AS DECIMAL(20,9)))
                OVER (PARTITION BY qid ORDER BY pos DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS DOUBLE) AS s
  FROM terms
)
SELECT qid, vid, CAST(pos AS BIGINT) AS pos,
       CAST(ind AS BIGINT) AS ind, s AS shapley_value, rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY s DESC, vid) AS rn
      FROM sval)
WHERE rn <= {_TOPN}
ORDER BY qid, rn
"""


@query("knn_shapley_valuation", _KS_SQL)
def knn_shapley_valuation(spark, sf_dir):
    """Exact KNN-Shapley per training point: broadcast validation
    side, distance rank window, descending decimal suffix sum — the
    closed-form recurrence with no sequential fold."""
    e = t(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec"),
                 F.col("label").alias("qlab")))
    tr = (e.filter(F.col("vec_id") >= 5)
          .select(F.col("vec_id").alias("vid"),
                  F.col("embedding").alias("tvec"),
                  F.col("label").alias("tlab")))
    diffs = F.zip_with("qvec", "tvec",
                       lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double")))
    pairs = (tr.crossJoin(F.broadcast(q))
             .select("qid", "vid",
                     F.round(F.aggregate(diffs, F.lit(0.0),
                                         lambda a, v: a + v), 9)
                     .alias("d2"),
                     F.when(F.col("tlab") == F.col("qlab"), 1)
                     .otherwise(0).alias("ind")))
    wrank = W.partitionBy("qid").orderBy("d2", "vid")
    wpart = W.partitionBy("qid")
    ranked = pairs.select(
        "qid", "vid", "d2", "ind",
        F.row_number().over(wrank).alias("pos"),
        F.count(F.lit(1)).over(wpart).alias("n"))
    wpos = W.partitionBy("qid").orderBy("pos")
    terms = ranked.select(
        "qid", "vid", "d2", "ind", "pos", "n",
        F.max(F.when(F.col("pos") == F.col("n"), F.col("ind")))
        .over(wpart).alias("ind_n"),
        F.when(
            F.col("pos") < F.col("n"),
            F.round((
                (F.col("ind") - F.lead("ind").over(wpos))
                .cast("double") / F.lit(_K))
                * (F.least(F.lit(_K), F.col("pos")).cast("double")
                   / F.col("pos")), 9))
        .otherwise(F.lit(0.0)).alias("tt"))
    wsuf = (W.partitionBy("qid").orderBy(F.desc("pos"))
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    sval = terms.select(
        "qid", "vid", "d2", "ind", "pos",
        ((F.col("ind_n").cast("double") / F.col("n"))
         + F.sum(F.col("tt").cast("decimal(20,9)")).over(wsuf)
         .cast("double")).alias("s"))
    wtop = W.partitionBy("qid").orderBy(F.desc("s"), "vid")
    return (sval.withColumn("rn", F.row_number().over(wtop))
            .filter(F.col("rn") <= _TOPN)
            .select("qid", "vid",
                    F.col("pos").cast("bigint").alias("pos"),
                    F.col("ind").cast("bigint").alias("ind"),
                    F.col("s").alias("shapley_value"), "rn")
            .orderBy("qid", "rn"))
