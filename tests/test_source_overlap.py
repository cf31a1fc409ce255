"""Pins for the r12p wave: source vocabulary Jaccard matrix and Gwet's
AC1 agreement."""

from collections import defaultdict

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_source_vocab_jaccard_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for r in d:
        vocab[r["source"]].update(r["text"].split(" "))
    srcs = sorted(vocab)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                expect[(a, b)] = inter
    rows = {(r["src_a"], r["src_b"]): r for r in
            QUERIES["source_vocab_jaccard"](spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for (a, b), inter in expect.items():
        r = rows[(a, b)]
        assert (r["vocab_a"], r["vocab_b"]) == (len(vocab[a]),
                                                len(vocab[b]))
        assert r["n_common"] == inter
        union = len(vocab[a]) + len(vocab[b]) - inter
        assert r["jaccard"] == inter / float(union)
        assert 0.0 < r["jaccard"] <= 1.0


def test_gwets_ac1_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("n_chars", "text").collect()
    n = agree = k1 = k2 = 0
    for r in d:
        r1 = 1 if r["n_chars"] >= 300 else 0
        r2 = 1 if len(r["text"].split(" ")) >= 60 else 0
        n += 1
        agree += 1 if r1 == r2 else 0
        k1 += r1
        k2 += r2
    po = agree / float(n)
    pi = (k1 / float(n) + k2 / float(n)) / 2
    pe = 2 * pi * (1 - pi)
    ac1 = (po - pe) / (1 - pe)
    row = QUERIES["eval_gwets_ac1"](spark, sf_dir).collect()[0]
    assert (row["n_docs"], row["n_agree"]) == (n, agree)
    assert row["p_observed"] == po
    assert row["pe_gwet"] == pe
    assert row["gwets_ac1"] == ac1
    # AC1 resists the kappa paradox: with these correlated gates it
    # must be positive and bounded by 1
    assert 0.0 < row["gwets_ac1"] <= 1.0
