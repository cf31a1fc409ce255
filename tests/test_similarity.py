"""Similarity-search quality tests: IVF and LSH approximate top-k measured
against the exact brute-force baseline (recall), plus determinism."""

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.operators.similarity import (
    ivf_topk_cosine, topk_cosine_bruteforce, topk_cosine_lsh)
from arangodb_java_parquet_spark.queries.common import t


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.vid)
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = _topk_sets(topk_cosine_bruteforce(
        q, e, id_col="vec_id", vec_col="embedding", k=5))
    approx = _topk_sets(ivf_topk_cosine(
        q, e, id_col="vec_id", vec_col="embedding", k=5,
        n_centroids=8, n_probe=4))
    hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # probing half the cells of random data should recover a majority
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_deterministic(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in ivf_topk_cosine(
        q, e, id_col="vec_id", vec_col="embedding", k=5).collect())
    b = sorted(tuple(r) for r in ivf_topk_cosine(
        q, e, id_col="vec_id", vec_col="embedding", k=5).collect())
    assert a == b


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = _topk_sets(topk_cosine_bruteforce(
        q, e, id_col="vec_id", vec_col="embedding", k=5))
    approx = _topk_sets(topk_cosine_lsh(
        q, e, id_col="vec_id", vec_col="embedding", k=5, n_bits=2))
    hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.3, f"LSH recall too low: {recall:.2f}"


def test_pandas_udf_cosine_matches_jvm(spark, sf_dir):
    """An Arrow-batched pandas UDF cosine agrees with the JVM expression
    within float tolerance on every pair. The JVM formulation stays the
    hot path: it runs inside whole-stage codegen with zero Arrow transfer,
    while the UDF pays serialization both ways — same answer, strictly
    more data movement. This test pins the equivalence so either
    implementation can verify the other."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    from arangodb_java_parquet_spark.operators.similarity import cosine

    @pandas_udf("double")
    def cos_pd(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            xv = np.asarray(x, dtype="float64")
            yv = np.asarray(y, dtype="float64")
            out.append(float(xv @ yv)
                       / (float(np.sqrt(xv @ xv)) * float(np.sqrt(yv @ yv))))
        return pd.Series(out)

    e = t(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec")))
    pairs = (e.limit(200).crossJoin(F.broadcast(q))
             .select("qid", "vec_id",
                     cosine(F.col("qvec"), F.col("embedding")).alias("jvm"),
                     cos_pd("qvec", "embedding").alias("pd")))
    rows = pairs.collect()
    assert len(rows) == 600
    assert all(abs(r.jvm - r.pd) < 1e-9 for r in rows)
