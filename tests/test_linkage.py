"""Property tests for the round-7 record-linkage / retrieval operators —
the oracle pins cross-engine value equality; these pin the SEMANTICS
(windowing, capping, scoring, diversification) against independent
python recomputation.
"""

import math

from pyspark.sql import functions as F

from arangodb_java_parquet_spark.queries import QUERIES
from arangodb_java_parquet_spark.queries.common import t


def _token_sets(spark, sf_dir):
    rows = (t(spark, sf_dir, "documents")
            .select("doc_id", "text").collect())
    return {r.doc_id: set(r.text.split(" ")) for r in rows}


def test_snm_pairs_meet_threshold_and_share_block(spark, sf_dir):
    toks = _token_sets(spark, sf_dir)
    blk = {r.doc_id: r.text[:4] for r in
           t(spark, sf_dir, "documents").select("doc_id", "text").collect()}
    out = QUERIES["dedup_sorted_neighborhood"](spark, sf_dir).collect()
    assert out, "SNM emitted no pairs on the smoke corpus"
    for r in out:
        a, b = toks[r.doc_a], toks[r.doc_b]
        jac = len(a & b) / len(a | b)
        assert abs(jac - r.jaccard) < 1e-12, (r.doc_a, r.doc_b)
        assert jac >= 0.30
        # blocked SNM: pairs can only form inside a 4-char lead block
        assert blk[r.doc_a] == blk[r.doc_b]


def test_ppjoin_pairs_are_exact_jaccard_subset(spark, sf_dir):
    """Every emitted pair's (overlap, jaccard) must equal the exact
    python recomputation and clear t = 7/10; the cap may FORFEIT pairs
    (bounded-evidence contract) but must never fabricate or mis-score
    one."""
    toks = _token_sets(spark, sf_dir)
    out = QUERIES["dedup_ppjoin_prefix"](spark, sf_dir).collect()
    assert out, "PPJoin emitted no pairs on the smoke corpus"
    for r in out:
        a, b = toks[r.doc_a], toks[r.doc_b]
        inter, union = len(a & b), len(a | b)
        assert r.overlap == inter
        assert r.sa == len(a) and r.sb == len(b)
        assert abs(r.jaccard - inter / union) < 1e-12
        assert 10 * inter >= 7 * union


def test_fellegi_sunter_score_matches_python_log_weights(spark, sf_dir):
    out = QUERIES["linkage_fellegi_sunter"](spark, sf_dir).limit(50).collect()
    assert out
    W = {"brand": (90, 20), "noun": (85, 10), "price": (80, 30)}
    for r in out:
        expect = 0.0
        for name, flag in (("brand", r.agree_brand), ("noun", r.agree_noun),
                           ("price", r.agree_price)):
            m, u = W[name]
            expect += (math.log(m / u) if flag == 1
                       else math.log((100 - m) / (100 - u)))
        assert abs(r.fs_score - expect) < 1e-9
        assert r.agree_brand + r.agree_noun + r.agree_price >= 2


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR's picks must (a) lead with the most-relevant item and
    (b) never be MORE redundant than plain top-3 by max pairwise
    cosine."""
    import numpy as np
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in t(spark, sf_dir, "embeddings").collect()}

    def cos(x, y):
        return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))

    q = emb[0]
    rel = sorted(((cos(q, v), -vid) for vid, v in emb.items() if vid != 0),
                 reverse=True)
    plain = [-x[1] for x in rel[:3]]
    out = sorted(QUERIES["sim_mmr_diversified_topk"](spark, sf_dir)
                 .collect(), key=lambda r: r.rank)
    picks = [r.vid for r in out]
    assert len(picks) == 3 and len(set(picks)) == 3
    assert picks[0] == plain[0]  # rank 1 is pure relevance

    def max_pair(ids):
        return max(cos(emb[a], emb[b])
                   for i, a in enumerate(ids) for b in ids[i + 1:])

    assert max_pair(picks) <= max_pair(plain) + 1e-9


def test_dsir_weights_favor_target_sources(spark, sf_dir):
    """The importance weight is ln(p_target/p_raw) summed over tokens —
    documents FROM the target domain should average higher than the
    rest (they are what the target LM was fit on)."""
    df = QUERIES["quality_dsir_weights"](spark, sf_dir)
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    j = (df.join(src, "doc_id")
         .withColumn("is_tgt",
                     F.col("source").isin("src0", "src1").cast("int"))
         .groupBy("is_tgt")
         .agg((F.sum(F.col("log_importance"))
               / F.sum("n_tokens")).alias("per_token"))
         .collect())
    per = {r.is_tgt: r.per_token for r in j}
    assert per[1] > per[0]


def test_luhn_validation_matches_python(spark, sf_dir):
    def luhn_ok(ds):
        s = 0
        n = len(ds)
        for i, ch in enumerate(ds):
            d = int(ch)
            if (n - 1 - i) % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        return s % 10 == 0

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    expect = {}
    for r in o:
        shard = r.o_orderkey % 5
        digits = str(r.o_custkey * 100 + r.o_orderkey % 100)
        k = expect.setdefault(shard, [0, 0])
        k[0] += 1
        k[1] += luhn_ok(digits)
    out = QUERIES["pii_luhn_validate"](spark, sf_dir).collect()
    for r in out:
        assert [r.n_ids, r.n_luhn_valid] == expect[r.shard]
