"""Focused pins for the r15 optimization-round operator changes:

* ``symmetric_edges`` (operators/dedup.py) — the one-Generate
  symmetrization that replaced the self-UNION at every graph_* edge
  site must emit exactly the union form's row SET (both directions of
  every pair, nothing else), on plain frames and on the real LSH
  candidate pairs.
* NN-descent init (operators/similarity.nndescent_knn_graph) — the
  unordered-pair init scoring (one dot per unordered pair, both
  directions emitted after) must reproduce the directed init graph the
  unrolled oracle pins; the recall entry's stage-0 row set is the
  cheapest full-value probe of that.
"""

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.operators.dedup import symmetric_edges


def _union_form(pairs):
    return (pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
            .unionAll(pairs.select(F.col("doc_b").alias("src"),
                                   F.col("doc_a").alias("dst"))))


def test_symmetric_edges_matches_union_rowset(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (7, 9)], "doc_a LONG, doc_b LONG")
    got = symmetric_edges(pairs)
    want = _union_form(pairs)
    assert got.columns == ["src", "dst"]
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # duplicates in the input stay duplicated (unionAll semantics)
    dup = spark.createDataFrame(
        [(1, 2), (1, 2)], "doc_a LONG, doc_b LONG")
    assert symmetric_edges(dup).count() == 4


def test_symmetric_edges_on_lsh_candidates(spark, sf_dir):
    from arangodb_java_parquet_spark.operators.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_signatures)
    from arangodb_java_parquet_spark.queries.common import t

    d = t(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        minhash_signatures(
            char_shingles(d, "text", "doc_id", k=5, distinct=False),
        "doc_id"), "doc_id")
    got = symmetric_edges(cand)
    want = _union_form(cand)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_nndescent_init_stage_rowcount_and_symmetry(spark, sf_dir):
    from arangodb_java_parquet_spark.operators.similarity import (
        nndescent_knn_graph)
    from arangodb_java_parquet_spark.queries.common import t

    e = t(spark, sf_dir, "embeddings")
    g = nndescent_knn_graph(
        e, id_col="vec_id", vec_col="embedding",
        k=8, init_window=8, init_bits=6, rounds=0, stages=True)
    init = g.filter(F.col("stage") == 0).select("qid", "vid", "cos_sim")
    rows = init.collect()
    assert len(rows) > 0
    by_pair = {(r["qid"], r["vid"]): r["cos_sim"] for r in rows}
    # the scored graph is rank-truncated, so not every reverse edge
    # survives top-k — but where both directions survive, the one dot
    # shared by the unordered pair must give the identical cosine
    both = [(k, v) for k, v in by_pair.items() if (k[1], k[0]) in by_pair]
    assert both, "expected at least one mutual init edge"
    for (q, v), cos in both:
        assert by_pair[(v, q)] == cos
