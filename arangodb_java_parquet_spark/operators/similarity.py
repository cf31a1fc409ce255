"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(sign-random-projection buckets) is the approximate scale path that avoids
the full cross product.

Determinism: dot products accumulate LEFT-TO-RIGHT in double via
``F.aggregate`` (elements cast to double first — float*float widened to
double is exact), which is bit-identical to the DuckDB oracle's
``list_sum(list_transform(...))`` evaluation. Ranking uses the value rounded
to 9 decimals with an id tiebreak so ordering can't flip on last-ulp noise.

Scale: the query side is broadcast (top-k for a bounded query set); the
corpus side never shuffles. For corpus×corpus all-pairs use the LSH variant:
bucket first, then brute-force within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two array<float> columns."""
    prods = F.zip_with(a, b, lambda x, y:
                       x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine_bruteforce(queries: DataFrame, corpus: DataFrame, *,
                           id_col: str, vec_col: str, k: int) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus.

    Output: (qid, vid, cos_sim) with cos_sim rounded to 9 decimals and
    deterministic (rounded value, vid) ranking.
    """
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("vid"),
                      F.col(vec_col).alias("cvec"))
    pairs = (c.crossJoin(F.broadcast(q))
             .filter(F.col("qid") != F.col("vid"))
             .select("qid", "vid",
                     F.round(cosine(F.col("qvec"), F.col("cvec")), 9)
                     .alias("cos_sim")))
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vid")
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", "vid", "cos_sim", "rn"))


def srp_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Sign-random-projection LSH bucket id using the first ``n_bits``
    coordinate axes as (deterministic, engine-portable) hyperplanes:
    bit_i = 1 if vec[i] > 0. Real deployments draw random hyperplanes; axes
    keep the oracle portable while exercising the identical plan shape."""
    bits = [F.when(vec.getItem(i) > 0, F.lit(1)).otherwise(F.lit(0))
            for i in range(n_bits)]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def topk_cosine_lsh(queries: DataFrame, corpus: DataFrame, *,
                    id_col: str, vec_col: str, k: int,
                    n_bits: int = 4) -> DataFrame:
    """Approximate top-k: equi-join on the SRP bucket, then exact cosine
    within the bucket. Replaces the O(|Q|·|C|) cross product with
    O(|Q|·|C| / 2^n_bits) expected comparisons and a shuffle on bucket id."""
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec"),
                       srp_bucket(F.col(vec_col), n_bits).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("vid"),
                      F.col(vec_col).alias("cvec"),
                      srp_bucket(F.col(vec_col), n_bits).alias("bucket"))
    pairs = (c.join(F.broadcast(q), "bucket")
             .filter(F.col("qid") != F.col("vid"))
             .select("qid", "vid",
                     F.round(cosine(F.col("qvec"), F.col("cvec")), 9)
                     .alias("cos_sim")))
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vid")
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", "vid", "cos_sim", "rn"))
