"""Hand-computed ground-truth tests for the evaluation-metric queries
(eval_rank_metrics, eval_pr_threshold_sweep) and RAKE keyword extraction.

Each test writes a small crafted parquet corpus into a temp sf_dir so the
expected metric values are derivable by hand, then runs the registered
query callable against it — the same entry the driver runs.
"""

import math
import random

import pytest

from arangodb_java_parquet_spark.queries.common import QUERIES


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_rank_metrics_perfect_retrieval(spark, tmp_path):
    """Tightly clustered labels => every top-10 hit shares the query's
    label => all four macro metrics are exactly 1.0."""
    rng = random.Random(7)
    rows = []
    # queries at vec_id 0 and 37 (vec_id % 37 == 0); 12 corpus vectors per
    # label, clustered around orthogonal bases so within-label cosine ~1
    # and cross-label cosine ~0.
    bases = {0: [10.0, 0.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0, 0.0]}
    rows.append((0, [float(x + rng.uniform(-.01, .01)) for x in bases[0]], 0))
    rows.append((37, [float(x + rng.uniform(-.01, .01)) for x in bases[1]], 1))
    nid = 1
    for lbl in (0, 1):
        for _ in range(12):
            if nid % 37 == 0:
                nid += 1
            rows.append((nid, [float(x + rng.uniform(-.01, .01))
                               for x in bases[lbl]], lbl))
            nid += 1
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["n_queries"]: r for r in
           QUERIES["eval_rank_metrics"](spark, sf).collect()}
    row = out[2]
    assert row["mrr"] == pytest.approx(1.0, abs=1e-9)
    assert row["map_at_10"] == pytest.approx(1.0, abs=1e-9)
    assert row["ndcg_at_10"] == pytest.approx(1.0, abs=1e-9)
    assert row["p_at_10"] == pytest.approx(1.0, abs=1e-9)


def test_rank_metrics_known_mixed_ranking(spark, tmp_path):
    """One query, rigged geometry: ranks 1 and 3 relevant, n_rel=2.
    MRR=1, P@10=0.2, AP=(1/1 + 2/3)/2, nDCG=(1/ln2 + 1/ln4)/(1/ln2+1/ln3)."""
    # query label 0; corpus: 2 label-0 vectors at cosine ~.99 and ~.90,
    # one label-1 vector between them (~.95), 7 fillers far away.
    def vec(angle):
        return [float(math.cos(angle)), float(math.sin(angle)), 0.0, 0.0]
    rows = [(0, vec(0.0), 0),
            (1, vec(0.05), 0),      # rank 1, rel
            (2, vec(0.20), 1),      # rank 2, not rel
            (3, vec(0.40), 0),      # rank 3, rel
            ]
    for i in range(7):
        rows.append((4 + i, vec(1.2 + 0.05 * i), 2))
    sf = _write_embeddings(spark, tmp_path, rows)
    row = QUERIES["eval_rank_metrics"](spark, sf).collect()[0]
    assert row["n_queries"] == 1
    assert row["mrr"] == pytest.approx(1.0, abs=1e-9)
    assert row["p_at_10"] == pytest.approx(0.2, abs=1e-9)
    assert row["map_at_10"] == pytest.approx((1.0 + 2.0 / 3.0) / 2, abs=1e-8)
    exp_ndcg = ((1 / math.log(2) + 1 / math.log(4))
                / (1 / math.log(2) + 1 / math.log(3)))
    assert row["ndcg_at_10"] == pytest.approx(exp_ndcg, abs=1e-8)


def test_pr_threshold_sweep_hand_counts(spark, tmp_path):
    """Scores 1..4, positives at 3 and 4: threshold 3 is a perfect
    classifier; threshold 1 predicts everything positive."""
    rows = [(1, "a", "de", "s", 1), (2, "b", "fr", "s", 2),
            (3, "c", "en", "s", 3), (4, "d", "en", "s", 4)]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["threshold"]: r for r in
           QUERIES["eval_pr_threshold_sweep"](spark, sf).collect()}
    assert set(out) == {1, 2, 3, 4}
    t3 = out[3]
    assert (t3["tp"], t3["fp"], t3["fn"]) == (2, 0, 0)
    assert t3["prec"] == 1.0 and t3["rec"] == 1.0 and t3["f1"] == 1.0
    t1 = out[1]
    assert (t1["tp"], t1["fp"], t1["fn"]) == (2, 2, 0)
    assert t1["prec"] == 0.5 and t1["rec"] == 1.0
    assert t1["f1"] == pytest.approx(4.0 / 6.0, abs=1e-12)


def test_keywords_rake_hand_scores(spark, tmp_path):
    """Classic RAKE arithmetic on a three-word corpus: freq(red)=2,
    freq(apple)=2, freq(pie)=1; deg(red)=5, deg(apple)=5, deg(pie)=3;
    score(red apple pie) = 2.5+2.5+3 = 8, score(red apple) = 5."""
    rows = [(1, "Red apple, and red apple pie!", "en", "s", 29)]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["phrase"]: r for r in
           QUERIES["keywords_rake"](spark, sf).collect()}
    assert set(out) == {"red apple", "red apple pie"}
    assert out["red apple pie"]["score_e9"] == 8_000_000_000
    assert out["red apple"]["score_e9"] == 5_000_000_000
    assert out["red apple pie"]["n_words"] == 3
    assert out["red apple"]["phrase_freq"] == 1
    assert out["red apple pie"]["score"] == pytest.approx(8.0, abs=1e-12)


def test_kcenter_exact_cover_when_k_equals_n(spark, tmp_path):
    """With exactly K=8 distinct points, greedy k-center must select all
    of them: every cell has one point and radius 0."""
    rows = [(i, [float(i), float(i * i % 7), 0.0, 0.0], 0)
            for i in range(8)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = QUERIES["coreset_kcenter_greedy"](spark, sf).collect()
    assert len(out) == 8
    assert sorted(r["sel_id"] for r in out) == list(range(8))
    assert all(r["n_assigned"] == 1 and r["radius_sq"] == 0.0 for r in out)


def test_kcenter_separation_invariant(spark, sf_dir):
    """Gonzalez greedy invariant: every pair of selected centers is at
    least as far apart as the final covering radius (this is what makes
    it a 2-approximation)."""
    out = QUERIES["coreset_kcenter_greedy"](spark, sf_dir).collect()
    assert len(out) == 8
    radius_sq = max(r["radius_sq"] for r in out)
    cents = [(r["sx"], r["sy"]) for r in out]
    for i in range(len(cents)):
        for j in range(i + 1, len(cents)):
            d2 = ((cents[i][0] - cents[j][0]) ** 2
                  + (cents[i][1] - cents[j][1]) ** 2)
            assert d2 >= radius_sq - 1e-6


def test_rrf_fusion_identical_runs_doubles_scores(spark, tmp_path):
    """All-positive vectors land in one SRP bucket, so the LSH run equals
    the exact run and every fused score is exactly 2 * (1e9 // (60+rank))."""
    rng = random.Random(3)
    rows = [(i, [float(rng.uniform(0.5, 2.0)) for _ in range(8)], 0)
            for i in range(12)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = QUERIES["sim_rrf_fusion"](spark, sf).collect()
    assert {r["qid"] for r in out} == {0, 1, 2, 3, 4}
    for r in out:
        assert r["rrf_e9"] == 2 * (1_000_000_000 // (60 + r["fused_rank"]))
    for qid in range(5):
        ranks = sorted(r["fused_rank"] for r in out if r["qid"] == qid)
        assert ranks == list(range(1, 11))


def test_split_leakage_naive_count_matches_hash(spark, sf_dir):
    """naive_test_docs must equal the python-side count of doc_ids whose
    md5 hex is lexicographically below '20' (the 1/8 split rule)."""
    import hashlib
    from arangodb_java_parquet_spark.queries.common import t as read_t
    ids = [r["doc_id"] for r in
           read_t(spark, sf_dir, "documents").select("doc_id").collect()]
    expect = sum(1 for i in ids
                 if hashlib.md5(str(i).encode()).hexdigest() < "20")
    row = QUERIES["split_leakage_safe_report"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == len(ids)
    assert row["naive_test_docs"] == expect
    assert row["docs_in_leaky"] >= 2 * row["leaky_clusters"]
    assert row["n_clusters"] <= row["n_docs"]


def test_brier_decomposition_hand_values(spark, tmp_path):
    """Scores 1..4, positives at 3,4: midrank probs .25/.5/.75/1.0 land in
    singleton bins, so the Murphy identity holds exactly (gap 0) and
    brier = 0.09375, resolution = 0.25, uncertainty = 0.25."""
    rows = [(1, "a", "de", "s", 1), (2, "b", "fr", "s", 2),
            (3, "c", "en", "s", 3), (4, "d", "en", "s", 4)]
    sf = _write_documents(spark, tmp_path, rows)
    row = QUERIES["eval_brier_decomposition"](spark, sf).collect()[0]
    assert row["n_docs"] == 4
    assert row["base_rate"] == 0.5
    assert row["brier"] == pytest.approx(0.09375, abs=1e-9)
    assert row["reliability"] == pytest.approx(0.09375, abs=1e-9)
    assert row["resolution"] == pytest.approx(0.25, abs=1e-9)
    assert row["uncertainty"] == pytest.approx(0.25, abs=1e-9)
    assert row["decomp_gap"] == pytest.approx(0.0, abs=1e-9)


def test_unimax_waterfill_hand_values(spark, tmp_path):
    """Langs with 10/20/70 docs, budget 100, caps x3 = 30/60/210:
    waterline theta = 35 -> allocations 30/35/35, epochs 3/1.75/0.5."""
    rows = []
    did = 0
    for lang, n in (("aa", 10), ("bb", 20), ("cc", 70)):
        for _ in range(n):
            rows.append((did, "x", lang, "s", 1))
            did += 1
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["lang"]: r for r in
           QUERIES["mixture_unimax_allocation"](spark, sf).collect()}
    assert out["aa"]["allocated"] == 30.0
    assert out["bb"]["allocated"] == 35.0
    assert out["cc"]["allocated"] == 35.0
    assert sum(r["allocated"] for r in out.values()) == 100.0
    assert out["aa"]["epochs_used"] == 3.0
    assert out["bb"]["epochs_used"] == 1.75
    assert out["cc"]["epochs_used"] == 0.5


def test_code_detect_flags_code_not_prose(spark, tmp_path):
    """A snippet with keywords+symbols is code-like; plain prose is not."""
    code = "def f(x): return x; import os; var y = f(1);"
    prose = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, code, "en", "codesrc", len(code)),
            (2, prose, "en", "prosesrc", len(prose))]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["source"]: r for r in
           QUERIES["text_code_detect"](spark, sf).collect()}
    assert out["codesrc"]["n_code_like"] == 1
    assert out["prosesrc"]["n_code_like"] == 0
    assert out["codesrc"]["total_kw_hits"] >= 3
    assert out["prosesrc"]["avg_symbol_density"] == 0.0


def test_forecast_accuracy_hand_values(spark, tmp_path):
    """Revenue 100*t over days 1..9: the trailing-7 mean forecasts 400
    and 500 for days 8 and 9 (both errors exactly 400), so MAE = RMSE =
    bias = 400, pinball@0.9 = 360, MAPE = (0.5 + 4/9)/2."""
    import datetime
    rows = [(datetime.date(1995, 1, d), float(100 * d))
            for d in range(1, 10)]
    df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    row = QUERIES["eval_forecast_accuracy"](spark, str(tmp_path)).collect()[0]
    assert row["n_days_scored"] == 2
    assert row["mae"] == pytest.approx(400.0, abs=1e-6)
    assert row["rmse"] == pytest.approx(400.0, abs=1e-6)
    assert row["bias"] == pytest.approx(400.0, abs=1e-6)
    assert row["pinball_90"] == pytest.approx(360.0, abs=1e-6)
    assert row["mape"] == pytest.approx((0.5 + 4.0 / 9.0) / 2, abs=1e-9)
