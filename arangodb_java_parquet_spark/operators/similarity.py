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


def ivf_topk_cosine(queries: DataFrame, corpus: DataFrame, *,
                    id_col: str, vec_col: str, k: int,
                    n_centroids: int = 16, n_probe: int = 4,
                    seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-lite centroids
    partition the corpus into cells; each query probes only its ``n_probe``
    nearest cells.

    Centroid construction is one sampled KMeans iteration computed on the
    driver from a bounded sample — the first 2000 vectors BY ID via a
    distributed top-k (TakeOrderedAndProject), which is deterministic
    under any partitioning / file layout (a bare LIMIT would return
    whichever partitions scan first; a Bernoulli sample's per-partition
    seeding also shifts with layout). At 100 TB the sample stays bounded
    while cell assignment/probing remain fully distributed (a broadcast of
    n_centroids × dim floats and one shuffle-free filter-join).

    Recall/speed trade: n_probe/n_centroids of the corpus is scanned per
    query instead of all of it.
    """
    import numpy as np

    sample = (corpus.select(id_col, vec_col)
              .orderBy(id_col).limit(2000).collect())
    X = np.array([list(r[1]) for r in sample], dtype="float64")
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)),
                        replace=False)]
    for _ in range(5):  # fixed Lloyd iterations, deterministic
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = X[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    centroids = [[float(v) for v in c] for c in cent]

    cent_arr = F.array(*[
        F.array(*[F.lit(v) for v in c]) for c in centroids])

    def nearest_cells(vec: Column, n: int) -> Column:
        # distances to each centroid via transform over the literal array,
        # then take indices of the n smallest — all JVM expressions
        dists = F.transform(
            cent_arr,
            lambda c: F.aggregate(
                F.zip_with(c, vec, lambda x, y: (x - y.cast("double")) ** 2),
                F.lit(0.0), lambda a, v: a + v))
        idx = F.transform(dists, lambda d, i: F.struct(d.alias("d"),
                                                      i.alias("i")))
        return F.slice(F.transform(F.array_sort(idx), lambda s: s["i"]),
                       1, n)

    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec"),
                       F.explode(nearest_cells(F.col(vec_col), n_probe))
                       .alias("cell"))
    c = corpus.select(F.col(id_col).alias("vid"),
                      F.col(vec_col).alias("cvec"),
                      nearest_cells(F.col(vec_col), 1).getItem(0)
                      .alias("cell"))
    pairs = (c.join(F.broadcast(q), "cell")
             .filter(F.col("qid") != F.col("vid"))
             .select("qid", "vid",
                     F.round(cosine(F.col("qvec"), F.col("cvec")), 9)
                     .alias("cos_sim")))
    # a (qid, vid) pair can appear once per probed cell — dedup before rank
    return (pairs.groupBy("qid", "vid")
            .agg(F.first("cos_sim").alias("cos_sim"))
            .withColumn("rn", F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vid")))
            .filter(F.col("rn") <= k)
            .select("qid", "vid", "cos_sim", "rn"))


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


def centroid_d2(vec: Column, cvec: Column) -> Column:
    """Rounded squared-L2 distance between two array<float> columns (same
    left-to-right double accumulation as the oracle's list_transform)."""
    return F.round(F.aggregate(
        F.zip_with(vec, cvec, lambda x, y:
                   (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda a, v: a + v), 9)


def centroid_scores(cents: DataFrame, vec_col: str) -> "tuple":
    """Build the broadcast-scalar centroid array and the per-row scored
    expression: a 1-row DataFrame holding collect_list(struct(cid, cvec))
    to crossJoin(broadcast(...)), and a Column of
    array<struct<d2, cid>> distances for ``vec_col``. Downstream argmin /
    top-n is then array_min / slice(array_sort(...)) — pure codegen
    expressions, NO per-(vector, centroid) intermediate rows and NO
    shuffle, versus the crossJoin+window formulation that materializes
    n_vectors x n_centroids rows and sorts them. Centroid count is a
    bounded constant in IVF, so the scalar array stays broadcast-sized at
    any corpus scale.
    """
    cents_arr = cents.agg(
        F.collect_list(F.struct("cid", "cvec")).alias("__cs"))
    scored = F.transform(
        F.col("__cs"), lambda c: F.struct(
            centroid_d2(F.col(vec_col), c["cvec"]).alias("d2"),
            c["cid"].alias("cid")))
    return cents_arr, scored


def assign_cells(emb: DataFrame, cents: DataFrame, *, id_col: str,
                 vec_col: str) -> DataFrame:
    """Assign every vector to its nearest centroid — argmin over the
    broadcast centroid array via array_min on (d2, cid) structs, which is
    exactly ROW_NUMBER() OVER (ORDER BY d2, cid) = 1 but with zero extra
    rows or shuffles. Output: (id, vec, cell)."""
    cents_arr, scored = centroid_scores(cents, vec_col)
    # coalesce makes the cell expression NON-nullable: otherwise a later
    # equi-join on cell infers an isnotnull(cell) constraint that gets
    # pushed into this join's CONDITION, evaluating the whole centroid
    # argmin a second time per row (visible as the array_min expression
    # duplicated into the BroadcastNestedLoopJoin condition in the plan)
    return (emb.crossJoin(F.broadcast(cents_arr))
            .select(F.col(id_col), F.col(vec_col),
                    F.coalesce(F.array_min(scored)["cid"], F.lit(-1))
                    .alias("cell")))


def semdedup_prune(emb: DataFrame, *, id_col: str, vec_col: str,
                   cent_mod: int = 37, tau: float = 0.4) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then compare pairs only
    WITHIN a cluster and drop every vector that has a higher-similarity
    "representative" with a smaller id. The clustering bounds the pairwise
    stage to O(sum k_c^2) over cell sizes instead of O(n^2) — exactly the
    published design, which is what makes semantic dedup feasible at
    corpus scale (cells are capped in practice by the centroid count).

    Centroids here are a deterministic rule (every ``cent_mod``-th vector)
    rather than fitted k-means so the whole operator — assignment, in-cell
    pairs, prune verdicts — value-checks against a SQL oracle; the fitted
    variant would swap in KMeans centroids with the identical plan shape
    (broadcast centroids -> map-side argmin -> cell equi-join).

    Output: one row per DROPPED vector: (id, cell, n_dups, max_cos) where
    n_dups counts its >= tau in-cell partners with smaller id.
    """
    cents = (emb.filter(F.col(id_col) % cent_mod == 0)
             .select(F.col(id_col).alias("cid"),
                     F.col(vec_col).alias("cvec")))
    # norm precomputed per VECTOR (identical left-to-right sum as a
    # per-pair norm, so cosine values are bit-equal) -> the in-cell pair
    # stage runs one dot product instead of three. The explicit
    # repartition on the join key materializes assignment+norm in ONE
    # Exchange that Catalyst reuses for both sides of the self-join
    # (ReusedExchange) — without it each side re-evaluates the centroid
    # argmin projection — and the join is then co-partitioned (no further
    # shuffle).
    cells = (assign_cells(emb, cents, id_col=id_col, vec_col=vec_col)
             .withColumn("__nrm", norm(F.col(vec_col)))
             .repartition("cell"))
    a = cells.alias("a")
    b = (cells.withColumnRenamed(id_col, "__idb")
         .withColumnRenamed(vec_col, "__vecb")
         .withColumnRenamed("__nrm", "__nrmb").alias("b"))
    cos = F.round(dot(F.col(f"a.{vec_col}"), F.col("b.__vecb"))
                  / (F.col("a.__nrm") * F.col("b.__nrmb")), 9)
    return (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                   & (F.col(f"a.{id_col}") < F.col("b.__idb")))
            .select(F.col("b.__idb").alias(id_col),
                    F.col("a.cell").alias("cell"),
                    cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= tau)
            .groupBy(id_col, "cell")
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.max("cos_sim").alias("max_cos")))
