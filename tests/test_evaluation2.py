"""Hand-computed ground-truth and invariant tests for the round-9c wave:
BLEU/ROUGE pairs, Fleiss' kappa, split-conformal coverage, Matryoshka
recall, Kneser-Ney scoring, kNN hubness, centroid silhouette, LPA
modularity, clustering coefficient.

Crafted corpora are written as parquet sf_dirs so each test runs the SAME
registered callable the driver runs; metric expectations are derived by
hand in the comments.
"""

import math

import pytest

from arangodb_java_parquet_spark.queries.common import QUERIES

SF0001 = "/root/testdata/sf0.001"


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# eval_bleu_rouge_pairs
# ---------------------------------------------------------------------------

def test_bleu_identical_pairs_score_one(spark, tmp_path):
    """Every document in a source shares one text => every md5-ranked
    consecutive pair is (x, x) => clipped precision/recall 1 at both
    orders, BP 1, BLEU-2 exactly 1. A 5-doc source exercises the
    odd-row drop (5 docs -> 2 pairs)."""
    rows = [(i, "the quick brown fox", "en", "s1", 19) for i in range(4)]
    rows += [(10 + i, "lorem ipsum dolor", "xx", "s2", 17) for i in range(5)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_bleu_rouge_pairs"](spark, sf).collect()[0]
    assert r["n_pairs"] == 4  # 2 from s1 + 2 from s2 (one s2 doc dropped)
    assert r["prec1"] == 1.0 and r["prec2"] == 1.0
    assert r["rouge1_recall"] == 1.0 and r["rouge2_recall"] == 1.0
    assert r["brevity_penalty"] == 1.0
    assert r["bleu2"] == 1.0


def test_bleu_zero_bigram_overlap_guard(spark, tmp_path):
    """Two docs with the same token multiset but reversed order: unigram
    precision 1, bigram overlap 0 => the m2=0 guard pins BLEU-2 to 0
    (instead of ln(0))."""
    rows = [(0, "a b", "en", "s1", 3), (1, "b a", "en", "s1", 3)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_bleu_rouge_pairs"](spark, sf).collect()[0]
    assert r["n_pairs"] == 1
    assert r["prec1"] == 1.0
    assert r["clipped2"] == 0
    assert r["bleu2"] == 0.0
    assert r["rouge2_recall"] == 0.0


# ---------------------------------------------------------------------------
# eval_fleiss_kappa
# ---------------------------------------------------------------------------

def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """All three raters say 'en' on every item => Pe = 1 => the guard
    returns kappa = 1."""
    rows = [(i, "x the y", "en", "s", 900) for i in range(6)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_fleiss_kappa"](spark, sf).collect()[0]
    assert r["pbar"] == 1.0
    assert r["fleiss_kappa"] == 1.0


def test_fleiss_kappa_hand_computed(spark, tmp_path):
    """Rater votes per item: [3, 1, 1, 0] positives.
    Pbar = sum(n1^2 + n0^2 - 3) / (n*6) = (6+2+2+6)/24 = 2/3;
    p_pos = 5/12; Pe = (25+49)/144 = 37/72;
    kappa = (2/3 - 37/72) / (1 - 37/72) = 11/35."""
    rows = [
        (0, "x the y", "en", "s", 900),   # all 3 raters: yes
        (1, "xxxx", "en", "s", 10),       # lang only
        (2, "x the y", "fr", "s", 10),    # stopword only
        (3, "xxxx", "fr", "s", 900),      # length only... n1=1
    ]
    # fix item 3 to 0 positives: short n_chars, no ' the ', not en
    rows[3] = (3, "xxxx", "fr", "s", 10)
    # and add one all-negative replaced by length-only to match [3,1,1,0]:
    # item 1 => n1=1 (lang), item 2 => n1=1 (stopword), item 3 => n1=0.
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_fleiss_kappa"](spark, sf).collect()[0]
    # votes: [3,1,1,0] => S = 6+2+2+6 = 16; Pbar = 16/24
    assert r["pbar"] == pytest.approx(16 / 24, abs=1e-12)
    assert r["fleiss_kappa"] == pytest.approx(
        (16 / 24 - 37 / 72) / (1 - 37 / 72), abs=1e-12)


# ---------------------------------------------------------------------------
# eval_conformal_coverage
# ---------------------------------------------------------------------------

def test_conformal_internal_consistency(spark):
    """On real data: the rank index matches ceil(0.9*(n_cal+1)) clamped
    to n_cal, splits partition the table, and coverage is a valid
    fraction near-or-above the target (finite-sample)."""
    r = QUERIES["eval_conformal_coverage"](spark, SF0001).collect()[0]
    n_cal = r["n_cal"]
    assert r["k_rank"] == min(math.ceil(0.9 * (n_cal + 1)), n_cal)
    assert r["q_hat"] >= 0
    assert r["interval_width"] == 2 * r["q_hat"]
    assert 0.0 <= r["coverage"] <= 1.0
    # split-conformal guarantee is in expectation; allow finite-sample slack
    assert r["coverage"] >= 0.8
    assert r["target_coverage"] == 0.9


# ---------------------------------------------------------------------------
# emb_matryoshka_recall
# ---------------------------------------------------------------------------

def test_matryoshka_recall_one_when_info_in_prefix(spark, tmp_path):
    """All signal in the first 4 dims, zeros elsewhere => truncated and
    full rankings are identical => recall@10 is exactly 1 at both
    truncations."""
    import random
    rng = random.Random(3)
    rows = []
    for vid in range(0, 40):
        v = [rng.uniform(-1, 1) for _ in range(4)] + [0.0] * 60
        rows.append((vid, [float(x) for x in v], 0))
    sf = _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["emb_matryoshka_recall"](spark, sf).collect()[0]
    assert r["n_queries"] >= 1
    assert r["recall_at10_dim16"] == 1.0
    assert r["recall_at10_dim32"] == 1.0


# ---------------------------------------------------------------------------
# quality_kneser_ney_logprob
# ---------------------------------------------------------------------------

def test_kneser_ney_hand_computed(spark, tmp_path):
    """Corpus = {"a b", "a c"}: for each doc the single bigram scores
    P = max(1-3/4,0)/2 + (3/4 * 2/2) * (1/2) = 1/8 + 3/8 = 1/2,
    so avg_logprob_kn = round(ln(0.5), 9). KN probabilities over the
    context 'a' sum to exactly 1 (0.5 + 0.5) — the normalization
    property that distinguishes KN from stupid backoff."""
    rows = [(0, "a b", "en", "s", 3), (1, "a c", "en", "s", 3)]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in
           QUERIES["quality_kneser_ney_logprob"](spark, sf).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_bigrams"] == 1
        assert r["avg_logprob_kn"] == pytest.approx(
            round(math.log(0.5), 9), abs=1e-12)


def test_kneser_ney_seen_everywhere_scores_zero(spark, tmp_path):
    """A single repeated bigram gets ALL the probability mass:
    P = (4*2-3)/8 + (3*1/8)*(1/1) = 5/8 + 3/8 = 1 => logp = 0."""
    rows = [(0, "a b", "en", "s", 3), (1, "a b", "en", "s", 3)]
    sf = _write_documents(spark, tmp_path, rows)
    for r in QUERIES["quality_kneser_ney_logprob"](spark, sf).collect():
        assert r["avg_logprob_kn"] == 0.0


# ---------------------------------------------------------------------------
# emb_knn_hubness / cluster_silhouette_centroid / graph entries
# ---------------------------------------------------------------------------

def test_hubness_mean_is_exactly_k(spark):
    """Every vector retrieves exactly k neighbors, so the mean
    k-occurrence is exactly k = 5 by double-counting; variance is
    non-negative and antihubs are a valid count."""
    r = QUERIES["emb_knn_hubness"](spark, SF0001).collect()[0]
    assert r["mean_kocc"] == 5.0
    assert r["var_kocc"] >= 0
    assert 0 <= r["n_antihubs"] <= r["n_vectors"]
    assert r["max_kocc"] >= 5  # some vector is at least averagely popular


def test_silhouette_bounds_and_partition(spark):
    rows = QUERIES["cluster_silhouette_centroid"](spark, SF0001).collect()
    emb_count = spark.read.parquet(f"{SF0001}/embeddings.parquet").count()
    assert sum(r["n_points"] for r in rows) == emb_count
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_modularity_bounds(spark):
    rows = QUERIES["graph_modularity_lpa"](spark, SF0001).collect()
    q = sum(r["q_contrib"] for r in rows)
    assert -0.5 <= q <= 1.0
    for r in rows:
        assert r["n_members"] >= 1
        assert r["intra_edges"] >= 0
        # a community's intra-edge endpoints cannot exceed its degree sum
        assert 2 * r["intra_edges"] <= r["deg_sum"]


def test_clustering_coefficient_bounds(spark):
    r = QUERIES["graph_clustering_coefficient"](spark, SF0001).collect()[0]
    assert 0.0 <= r["global_clustering_coeff"] <= 1.0
    assert r["n_wedges"] >= 3 * r["n_triangles"]
    assert r["n_edges"] >= 0 and r["n_nodes"] >= 0


# ---------------------------------------------------------------------------
# round 9d: t-closeness, anisotropy, margin sampling
# ---------------------------------------------------------------------------

def test_t_closeness_zero_when_class_matches_global(spark):
    """TVD is in [0, 1); a class whose sensitive distribution equals the
    global one scores 0; every class's k matches the k-anonymity entry."""
    rows = QUERIES["privacy_t_closeness"](spark, SF0001).collect()
    kan = {(r["c_mktsegment"], r["c_nationkey"]): r["k_size"] for r in
           QUERIES["privacy_k_anonymity"](spark, SF0001).collect()}
    assert rows
    for r in rows:
        assert 0.0 <= r["t_closeness_tvd"] < 1.0
        assert kan[(r["c_mktsegment"], r["c_nationkey"])] == r["k_size"]


def test_anisotropy_identical_vectors_score_one(spark, tmp_path):
    """All vectors identical => every pairwise cosine is exactly 1 =>
    mean_pairwise_cosine = 1 and the mean unit vector has norm 1."""
    rows = [(i, [3.0, 4.0] + [0.0] * 62, 0) for i in range(20)]
    sf = _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["emb_anisotropy_score"](spark, sf).collect()[0]
    assert r["n_vectors"] == 20
    assert r["mean_vec_norm"] == pytest.approx(1.0, abs=1e-8)
    assert r["mean_pairwise_cosine"] == pytest.approx(1.0, abs=1e-7)


def test_anisotropy_symmetric_vectors_score_negative(spark, tmp_path):
    """Ten +e1 and ten -e1 unit vectors: sum u = 0, so mean pairwise
    cosine = (0 - n) / (n(n-1)) = -1/(n-1)."""
    rows = [(i, [1.0] + [0.0] * 63, 0) for i in range(10)]
    rows += [(10 + i, [-1.0] + [0.0] * 63, 0) for i in range(10)]
    sf = _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["emb_anisotropy_score"](spark, sf).collect()[0]
    assert r["mean_pairwise_cosine"] == pytest.approx(-1 / 19, abs=1e-9)


def test_margin_sampling_is_most_uncertain(spark):
    """The selected batch's margins are a prefix of the global margin
    ranking: no unselected document has a strictly smaller margin."""
    sel = QUERIES["active_margin_sampling"](spark, SF0001).collect()
    assert len(sel) == 25
    margins = [r["margin"] for r in sel]
    assert margins == sorted(margins)
    assert all(0.0 <= m <= 0.5 for m in margins)
    # mu inherits the fitted model: probabilities in (0, 1)
    assert all(0.0 < r["mu"] < 1.0 for r in sel)


# ---------------------------------------------------------------------------
# round 9e: TextRank, Dirichlet-LM, b-bit minhash, Krippendorff alpha
# ---------------------------------------------------------------------------

def test_textrank_hub_word_ranks_first(spark, tmp_path):
    """A star-shaped co-occurrence graph: the hub word is adjacent to
    every other content word, so damped PageRank must rank it first."""
    text = "alpha hubword beta hubword gamma hubword delta"
    rows = [(0, text, "en", "s", len(text))]
    sf = _write_documents(spark, tmp_path, rows)
    out = QUERIES["keywords_textrank"](spark, sf).collect()
    assert out[0]["rank"] == 1
    assert out[0]["token"] == "hubword"
    scores = [r["textrank_score"] for r in sorted(out,
                                                  key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_dirichlet_lm_prefers_matching_doc(spark, tmp_path):
    """Two docs of identical length, one containing a query term: the
    matching doc must outscore the non-matching one (the correction term
    ln(1 + c|C|/(mu*cf)) is strictly positive); equal-length non-matching
    docs tie exactly (background-only score)."""
    rows = [(0, "spark alpha beta", "en", "s", 16),
            (1, "gamma delta epsi", "en", "s", 16),
            (2, "zeta keppa omega", "en", "s", 16)]
    sf = _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r["score"] for r in
           QUERIES["ir_dirichlet_lm_score"](spark, sf).collect()}
    assert out[0] > out[1]
    assert out[1] == out[2]


def test_bbit_identical_docs_estimate_one(spark, tmp_path):
    """Identical texts share every MinHash component, so both the 1-bit
    and full-width estimators return exactly 1."""
    rows = [(0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
            (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43)]
    sf = _write_documents(spark, tmp_path, rows)
    out = QUERIES["dedup_minhash_bbit"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["agree_bits"] == 8
    assert r["est_jaccard_1bit"] == 1.0
    assert r["est_jaccard_full"] == 1.0


def test_krippendorff_hand_computed_zero(spark, tmp_path):
    """Item A: m=3 ratings all positive (no disagreement); item B: the
    length rater abstains (m=2) and the two voters split (o=1).
    S = 0 + 2*1*1/1 = 2; M = 5; n1 = 4; n0 = 1;
    alpha = 1 - S(M-1)/(2*n1*n0) = 1 - 2*4/8 = 0 exactly."""
    rows = [(0, "x the y", "en", "s", 900),
            (1, "xxxx", "en", "s", 500)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_krippendorff_alpha"](spark, sf).collect()[0]
    assert r["n_ratings"] == 5
    assert r["do_rate"] == pytest.approx(2 / 5, abs=1e-12)
    assert r["de_rate"] == pytest.approx(0.4, abs=1e-12)
    assert r["krippendorff_alpha"] == 0.0


def test_krippendorff_perfect_agreement_with_abstentions(spark, tmp_path):
    """All voters agree everywhere (abstainers included): n1 == M pins
    alpha at 1 via the degenerate guard."""
    rows = [(0, "x the y", "en", "s", 900),
            (1, "z the w", "en", "s", 500)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_krippendorff_alpha"](spark, sf).collect()[0]
    assert r["krippendorff_alpha"] == 1.0


# ---------------------------------------------------------------------------
# round 9f: AUPRC, RFM migration, cohort LTV, effective rank
# ---------------------------------------------------------------------------

def test_auprc_perfect_classifier(spark, tmp_path):
    """Scores perfectly separate the classes => AP = 1 exactly."""
    rows = [(i, "x", "en", "s", 1000 + i) for i in range(5)]
    rows += [(10 + i, "x", "fr", "s", 10 + i) for i in range(5)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_auc_pr"](spark, sf).collect()[0]
    assert r["auprc"] == pytest.approx(1.0, abs=1e-9)
    assert r["prevalence"] == 0.5


def test_auprc_valid_range(spark):
    """AP is a weighted mean of precisions, so it lives in (0, 1]; a
    weak scorer may fall below prevalence (prevalence is the EXPECTED
    random AP, not a lower bound), so only the hard range is asserted."""
    r = QUERIES["eval_auc_pr"](spark, SF0001).collect()[0]
    assert 0.0 < r["auprc"] <= 1.0
    assert 0.0 < r["prevalence"] < 1.0


def test_rfm_migration_rows_partition_customers(spark):
    """Row shares sum to 1 per origin segment; quintiles in 1..5."""
    rows = QUERIES["rfm_migration_matrix"](spark, SF0001).collect()
    assert rows
    bys = {}
    for r in rows:
        assert 1 <= r["seg_p1"] <= 5 and 1 <= r["seg_p2"] <= 5
        bys.setdefault(r["seg_p1"], 0.0)
        bys[r["seg_p1"]] += r["row_share"]
    for s, tot in bys.items():
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_cohort_ltv_monotone_per_cohort(spark):
    """Cumulative revenue is non-decreasing in age within every cohort,
    and ltv_per_customer = cum_revenue / cohort_size."""
    rows = QUERIES["cohort_ltv_curve"](spark, SF0001).collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cohort_month"], []).append(r)
        assert r["ltv_per_customer"] == pytest.approx(
            r["cum_revenue"] / r["cohort_size"], rel=1e-12)
    for c, rs in by_c.items():
        rs.sort(key=lambda r: r["age_months"])
        vals = [r["cum_revenue"] for r in rs]
        assert vals == sorted(vals)


def test_effective_rank_uniform_variance(spark, tmp_path):
    """Vectors = +/- the all-ones direction scaled per dim equally:
    every dimension has identical variance => participation ratio and
    entropy effective rank both equal n_dims (64)."""
    rows = [(i, [1.0] * 64 if i % 2 == 0 else [-1.0] * 64, 0)
            for i in range(10)]
    sf = _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["emb_effective_rank"](spark, sf).collect()[0]
    assert r["participation_ratio"] == pytest.approx(64.0, rel=1e-9)
    assert r["effective_rank"] == pytest.approx(64.0, rel=1e-6)
    assert r["top_dim_share"] == pytest.approx(1 / 64, rel=1e-9)


def test_effective_rank_single_dimension(spark, tmp_path):
    """All variance in dimension 1 => participation ratio = 1, top dim
    share = 1, effective rank = 1."""
    rows = [(i, [float(i)] + [0.0] * 63, 0) for i in range(10)]
    sf = _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["emb_effective_rank"](spark, sf).collect()[0]
    assert r["participation_ratio"] == pytest.approx(1.0, rel=1e-9)
    assert r["effective_rank"] == pytest.approx(1.0, rel=1e-6)
    assert r["top_dim_share"] == pytest.approx(1.0, rel=1e-9)


# ---------------------------------------------------------------------------
# round 9g: time-decay attribution, markov accuracy, FD report
# ---------------------------------------------------------------------------

def test_time_decay_credits_sum_to_purchases(spark):
    """Per-purchase shares are normalized, so total credit across touch
    types equals the number of attributed purchases (those with >= 1
    prior touch) up to round-9 slack."""
    rows = QUERIES["attribution_time_decay"](spark, SF0001).collect()
    lin = QUERIES["attribution_linear"](spark, SF0001).collect()
    assert rows
    total = sum(r["decayed_credit"] for r in rows)
    total_lin = sum(r["linear_credit"] for r in lin)
    # both models distribute exactly one unit per attributed purchase
    assert total == pytest.approx(total_lin, abs=1e-5)


def test_markov_accuracy_bounds_and_majority(spark):
    """Top-1 accuracy is at least 1/n_states (predicting the modal
    successor can't do worse than uniform over observed successors on
    the fitting data) and at most 1."""
    r = QUERIES["markov_next_event_accuracy"](spark, SF0001).collect()[0]
    assert 0.0 < r["top1_accuracy"] <= 1.0
    assert r["n_correct"] <= r["n_transitions"]
    assert r["top1_accuracy"] >= 1.0 / r["n_states"] - 1e-12


def test_fd_primary_key_holds(spark):
    out = {r["fd"]: r for r in
           QUERIES["dq_functional_dependencies"](spark, SF0001).collect()}
    pk = out["orders.o_orderkey->o_custkey"]
    assert pk["violating_groups"] == 0
    assert pk["g3_rows_to_remove"] == 0
    assert pk["g3_error"] == 0.0
    # the deliberately-false candidates must register violations
    assert out["lineitem.l_orderkey->l_shipdate"]["violating_groups"] > 0
    for r in out.values():
        assert 0.0 <= r["g3_error"] < 1.0


# ---------------------------------------------------------------------------
# round 9h: McNemar paired test, Cohen's d
# ---------------------------------------------------------------------------

def test_mcnemar_hand_computed(spark, tmp_path):
    """4 docs: A right/B wrong twice (b=2), A wrong/B right once (c=1),
    both right once => chi2 = (2-1)^2/3 = 1/3; continuity-corrected
    (|1|-1)^2/3 = 0."""
    rows = [
        # A = length>=800, B = contains ' the ', gold = lang='en'
        (0, "xxxx", "en", "s", 900),     # A right, B wrong  (b)
        (1, "xxxx", "en", "s", 850),     # A right, B wrong  (b)
        (2, "x the y", "en", "s", 100),  # A wrong, B right  (c)
        (3, "x the y", "en", "s", 900),  # both right
    ]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_mcnemar_paired"](spark, sf).collect()[0]
    assert (r["disc_b"], r["disc_c"]) == (2, 1)
    assert r["mcnemar_chi2"] == pytest.approx(1 / 3, abs=1e-12)
    assert r["mcnemar_chi2_cc"] == 0.0
    assert r["acc_a"] == pytest.approx(3 / 4)
    assert r["acc_b"] == pytest.approx(2 / 4)


def test_cohens_d_known_groups(spark, tmp_path):
    """en lengths {10, 14}: mean 12, var 8; other {2, 6}: mean 4, var 8.
    pooled sd = sqrt(8) => d = 8/sqrt(8) = 2*sqrt(2); hedges factor
    1 - 3/(4*4-9) = 4/7."""
    rows = [(0, "x", "en", "s", 10), (1, "x", "en", "s", 14),
            (2, "x", "fr", "s", 2), (3, "x", "fr", "s", 6)]
    sf = _write_documents(spark, tmp_path, rows)
    r = QUERIES["eval_cohens_d_effect_size"](spark, sf).collect()[0]
    assert r["mean_diff"] == pytest.approx(8.0, abs=1e-12)
    assert r["pooled_sd"] == pytest.approx(math.sqrt(8), rel=1e-12)
    assert r["cohens_d"] == pytest.approx(8 / math.sqrt(8), rel=1e-12)
    assert r["hedges_g"] == pytest.approx(8 / math.sqrt(8) * 4 / 7,
                                          rel=1e-12)


def test_kendall_spearman_handcomputed(spark, tmp_path):
    """Hand-computed tau-b and rho on a 5-point set with ties, fed
    through the registered queries via a miniature documents table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # x = token count, y = n_chars; rows built so x has one tie pair and
    # y has one tie pair:  (x, y) = (1,10) (2,20) (2,30) (3,30) (4,40)
    texts = ["t", "t t", "u u", "t t t", "t t t t"]
    ys = [10, 20, 30, 30, 40]
    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts), "lang": pa.array(["en"] * 5),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array(ys, pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from arangodb_java_parquet_spark.queries import QUERIES
    kt = QUERIES["eval_kendall_tau_b"](spark, str(tmp_path)).collect()[0]
    # pairs (i<j) of (x,y): 10 pairs; concordant: (1,2)(1,3)(1,4)(1,5)
    # (2,3: x tie)(2,4)(2,5)(3,4: y tie)(3,5)(4,5) -> C=8, D=0, tx=1, ty=1
    assert kt["n_pairs"] == 10 and kt["n_concordant"] == 8
    assert kt["n_discordant"] == 0
    assert kt["ties_x"] == 1 and kt["ties_y"] == 1
    assert abs(kt["tau_b"] - 8 / 9) < 1e-12  # 8 / sqrt(9*9)
    sp = QUERIES["eval_spearman_rho"](spark, str(tmp_path)).collect()[0]
    # avg ranks: rx = 1, 2.5, 2.5, 4, 5 ; ry = 1, 2, 3.5, 3.5, 5
    # moments: sxy=53.75 sxx=syy=54.5 -> rho = 43.75/47.5 = 0.92105...
    assert sp["n_docs"] == 5
    assert abs(sp["spearman_rho"] - 43.75 / 47.5) < 1e-8


def test_mattr_closed_form_handcomputed(spark, tmp_path):
    """The O(T) closed-form MATTR equals the direct per-window distinct
    count on hand-built docs (w is pinned to the registered 25, so the
    docs are built around it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arangodb_java_parquet_spark.queries.ir_analytics import _MATTR_W

    w = _MATTR_W

    def direct_mattr(tokens):
        n = len(tokens)
        wins = [tokens[s:s + w] for s in range(n - w + 1)]
        return sum(len(set(win)) for win in wins) / (w * len(wins))

    docs = [
        " ".join(["a", "b"] * w),                  # alternating, 2w toks
        " ".join(["x"] * (w + 5)),                 # constant
        " ".join(f"t{i}" for i in range(w + 3)),   # all distinct
        " ".join(f"t{i % 7}" for i in range(3 * w)),  # period 7
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs), "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(d) for d in docs], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from arangodb_java_parquet_spark.queries import QUERIES
    rows = {r["doc_id"]: r for r in
            QUERIES["quality_mattr"](spark, str(tmp_path)).collect()}
    for i, doc in enumerate(docs):
        toks = doc.split(" ")
        assert rows[i]["n_tokens"] == len(toks)
        assert rows[i]["n_windows"] == len(toks) - w + 1
        assert abs(rows[i]["mattr"] - direct_mattr(toks)) < 1e-12
