"""Hand-computed invariant tests for the round-10 operator waves:
divergences, agreement, effect sizes, entropy rate, collocations,
allocation, strength measures, and privacy — each against a miniature
table whose expected values are derivable by hand (or by a direct
python re-computation of the published formula)."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arangodb_java_parquet_spark.queries import QUERIES


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_js_divergence_identical_and_disjoint(spark, tmp_path):
    """JS(P, P) = 0; JS of token-disjoint sources = ln 2 (each side's
    every term is p·ln(2p / p) = p·ln 2)."""
    sf = _write_docs(tmp_path, [
        (0, "a b c a", "en", "s1"),
        (1, "a b c a", "en", "s2"),     # identical distribution to s1
        (2, "x y z x", "en", "s3"),     # disjoint vocabulary
    ])
    rows = {(r["source_a"], r["source_b"]): r["js_divergence"]
            for r in QUERIES["mixture_js_divergence"](spark, sf).collect()}
    assert abs(rows[("s1", "s2")]) < 1e-9
    assert abs(rows[("s1", "s3")] - math.log(2)) < 1e-6
    assert abs(rows[("s2", "s3")] - math.log(2)) < 1e-6


def test_simpson_and_good_turing_handcomputed(spark, tmp_path):
    """Source 'a a a b': N=4, counts {a:3, b:1} -> lambda = (6+0)/12;
    Good-Turing: N1=1 (b), N2=0, N3=1 (a), p0 = 1/4."""
    sf = _write_docs(tmp_path, [(0, "a a a b", "en", "s")])
    s = QUERIES["text_simpson_diversity"](spark, sf).collect()[0]
    assert s["n_tokens"] == 4 and s["vocab"] == 2
    assert abs(s["simpson_lambda"] - 6 / 12) < 1e-15
    assert abs(s["gini_simpson"] - 0.5) < 1e-15
    assert abs(s["inverse_simpson"] - 2.0) < 1e-15
    g = QUERIES["vocab_good_turing"](spark, sf).collect()[0]
    assert (g["n1"], g["n2"], g["n3"]) == (1, 0, 1)
    assert abs(g["p_unseen"] - 0.25) < 1e-15
    assert g["r1_star"] == 0.0          # 2*N2/N1 = 0
    assert g["r2_star"] is None         # N2 = 0 -> NULL-guarded


def test_gwet_ac1_matches_direct_formula(spark, tmp_path):
    """AC1 recomputed directly from the three deterministic rater rules
    must match the engine value."""
    rows = [
        (0, "the quick fox " + "x" * 900, "en", "s"),   # raters: 1,1,1
        (1, "foo bar", "fr", "s"),                      # 0,0,0
        (2, "the cat", "fr", "s"),                      # 0,1,0 (has ' the '?)
        (3, "y" * 850, "en", "s"),                      # 1,0,1
    ]
    sf = _write_docs(tmp_path, rows)
    out = QUERIES["eval_gwet_ac1"](spark, sf).collect()[0]
    n1s = []
    for _, text, lang, _s in rows:
        n1s.append((1 if lang == "en" else 0)
                   + (1 if " the " in text else 0)
                   + (1 if len(text) >= 800 else 0))
    n = len(n1s)
    pbar = sum(k * k + (3 - k) * (3 - k) - 3 for k in n1s) / (n * 6)
    pi = sum(n1s) / (n * 3)
    pe = 2 * pi * (1 - pi)
    assert out["n_items"] == n
    assert abs(out["pbar"] - pbar) < 1e-15
    assert abs(out["gwet_ac1"] - (pbar - pe) / (1 - pe)) < 1e-12


def test_bigram_entropy_rate_deterministic_chain(spark, tmp_path):
    """A strictly periodic token chain has H(W2|W1) = 0 — every token
    determines its successor; a chain where 'a' is followed by b/c
    equally has H = p(a-context) * ln 2."""
    sf = _write_docs(tmp_path, [
        (0, "a b a b a b a b", "en", "det"),
        (1, "a b a c a b a c", "en", "mix"),
    ])
    rows = {r["source"]: r for r in
            QUERIES["text_bigram_entropy_rate"](spark, sf).collect()}
    assert abs(rows["det"]["entropy_rate"]) < 1e-9
    # mix: bigrams (a,b)x2 (b,a)x2 (a,c)x2 (c,a)x1 -> N=7
    # H = -[2/7 ln(2/4) + 2/7 ln(2/4)] (b,a and c,a contexts are
    # deterministic) = (4/7) ln 2
    assert abs(rows["mix"]["entropy_rate"] - (4 / 7) * math.log(2)) < 1e-6


def test_llr_matches_direct_formula(spark, tmp_path):
    """G2 for every emitted bigram equals the direct four-cell Dunning
    computation on the same corpus."""
    text = " ".join(["u v"] * 6 + ["u w"] * 3 + ["z z"] * 4)
    sf = _write_docs(tmp_path, [(0, text, "en", "s")])
    out = {(r["w1"], r["w2"]): (r["n_bigram"], r["llr_g2"])
           for r in QUERIES["token_collocations_llr"](spark, sf).collect()}
    toks = text.split(" ")
    bigrams = list(zip(toks, toks[1:]))
    from collections import Counter
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    c2 = Counter(w2 for _, w2 in bigrams)
    n = len(bigrams)
    for (w1, w2), (k11_out, g2_out) in out.items():
        k11 = c12[(w1, w2)]
        assert k11 >= 5 and k11 == k11_out
        r1, s1 = c1[w1], c2[w2]
        k12, k21 = r1 - k11, s1 - k11
        k22 = n - r1 - s1 + k11

        def term(k, row, col):
            return k * math.log(k * n / (row * col)) if k > 0 else 0.0

        g2 = 2 * (term(k11, r1, s1) + term(k12, r1, n - s1)
                  + term(k21, n - r1, s1) + term(k22, n - r1, n - s1))
        assert abs(g2_out - g2) < 1e-5


def test_cliffs_delta_handcomputed(spark, tmp_path):
    """en lengths {10, 20}, other lengths {5, 15}: pairs (10,5)+
    (10,15)- (20,5)+ (20,15)+ -> delta = (3-1)/4."""
    sf = _write_docs(tmp_path, [
        (0, "x" * 10, "en", "s"), (1, "x" * 20, "en", "s"),
        (2, "x" * 5, "fr", "s"), (3, "x" * 15, "fr", "s"),
    ])
    out = QUERIES["eval_cliffs_delta"](spark, sf).collect()[0]
    assert out["n_pairs"] == 4
    assert (out["n_gt"], out["n_lt"], out["n_tied"]) == (3, 1, 0)
    assert abs(out["cliffs_delta"] - 0.5) < 1e-15


def test_neyman_allocation_two_strata(spark, tmp_path):
    """Stratum A: lengths 10/20 (sigma 5, N 2); stratum B: constant
    length (sigma 0) -> all weight to A."""
    sf = _write_docs(tmp_path, [
        (0, "x" * 10, "en", "A"), (1, "x" * 20, "en", "A"),
        (2, "x" * 7, "en", "B"), (3, "x" * 7, "en", "B"),
    ])
    rows = {r["source"]: r for r in
            QUERIES["sample_neyman_allocation"](spark, sf).collect()}
    assert abs(rows["A"]["sigma"] - 5.0) < 1e-9
    assert abs(rows["B"]["sigma"]) < 1e-9
    assert abs(rows["A"]["weight"] - 1.0) < 1e-9
    assert abs(rows["A"]["allocation"] - 1000.0) < 1e-6
    assert abs(rows["B"]["allocation"]) < 1e-6


def test_burrows_delta_identical_sources(spark, tmp_path):
    """Two sources with identical token distributions have Delta = 0;
    both are equidistant from the differing third source."""
    sf = _write_docs(tmp_path, [
        (0, "a a b c d e f g", "en", "s1"),
        (1, "a a b c d e f g", "en", "s2"),
        (2, "a b b b c d e h", "en", "s3"),
    ])
    rows = {(r["source_a"], r["source_b"]): r["burrows_delta"]
            for r in QUERIES["text_burrows_delta"](spark, sf).collect()}
    assert abs(rows[("s1", "s2")]) < 1e-9
    assert abs(rows[("s1", "s3")] - rows[("s2", "s3")]) < 1e-9
    assert rows[("s1", "s3")] > 0.1


def test_strength_measures_pure_trend_plus_seasonal(spark, tmp_path):
    """A series that is EXACTLY linear trend + zero-mean weekly seasonal
    decomposes with residual 0 -> F_T = F_S = 1."""
    import datetime

    seasonal = [300, -100, 200, -300, 100, -150, -50]  # sums to 0
    days, vals = [], []
    d0 = datetime.datetime(2024, 1, 1)
    for i in range(35):
        days.append(d0 + datetime.timedelta(days=i))
        vals.append(10000.0 + 13.0 * i + seasonal[i % 7])
    tbl = pa.table({
        "event_id": pa.array(range(len(days)), pa.int64()),
        "ts": pa.array(days, pa.timestamp("us")),
        "user_id": pa.array([1] * len(days), pa.int64()),
        "event_type": pa.array(["purchase"] * len(days)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(days))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = QUERIES["timeseries_strength_measures"](
        spark, str(tmp_path)).collect()[0]
    # seasonal index is aligned to day-of-week, and the weekly pattern
    # here repeats every 7 days regardless of phase, so the classical
    # decomposition recovers it exactly (up to round-9 fences)
    assert out["n_days"] == 35 - 6
    assert out["var_resid"] < 1e-12
    assert abs(out["f_trend"] - 1.0) < 1e-6
    assert abs(out["f_seasonal"] - 1.0) < 1e-6


def test_delta_presence_handbuilt(spark, tmp_path):
    """Two QI classes: one fully present in the published set, one half
    present."""
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"]),
        "c_nationkey": pa.array([7, 7, 8, 8], pa.int64()),
        "c_mktsegment": pa.array(["M"] * 4),
        "c_acctbal": pa.array([0.0] * 4, pa.float64())})
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([5.0, 6.0, 7.0], pa.float64()),
        "o_orderdate": pa.array(["1995-01-01"] * 3)})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    rows = {r["c_nationkey"]: r for r in
            QUERIES["privacy_delta_presence"](
                spark, str(tmp_path)).collect()}
    assert rows[7]["certain_presence"] and rows[7]["presence_rate"] == 1.0
    assert rows[8]["presence_rate"] == 0.5
    assert not rows[8]["certain_presence"]
    assert not rows[8]["certain_absence"]


def test_rich_club_monotone_and_confident_joint_sanity(spark, sf_dir):
    """Registry-level sanity on real data: rich-club membership shrinks
    monotonically with k; the confident joint never counts more docs
    than the held split."""
    rc = {r["k"]: r for r in
          QUERIES["graph_rich_club_coefficient"](spark, sf_dir).collect()}
    ks = sorted(rc)
    for a, b in zip(ks, ks[1:]):
        assert rc[b]["n_rich"] <= rc[a]["n_rich"]
        if rc[b]["rich_club_phi"] is not None:
            assert 0.0 <= rc[b]["rich_club_phi"] <= 1.0
    cj = QUERIES["label_confident_joint"](spark, sf_dir).collect()
    import pyspark.sql.functions as F
    from arangodb_java_parquet_spark.queries.common import t as _t
    held = (_t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 >= 8).count())
    assert sum(r["n_docs"] for r in cj) <= held
    for r in cj:
        assert r["is_label_issue"] == (
            r["given_label"] != r["confident_label"])
