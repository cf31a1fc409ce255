"""Hand-recomputed references for the round-13 waves (r13a/r13b).

Each test recomputes the statistic in plain python (mirroring the
engine's exact-sum formulation) from the smoke-scale tables and pins
the engine row, plus structural identities (ranges, cross-entry
relations like A(1) = 1 - exp(-Theil_L)).
"""

import math
from collections import Counter

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def _daily_counts(spark, sf_dir):
    rows = (t(spark, sf_dir, "orders")
            .selectExpr("CAST(o_orderdate AS DATE) AS day")
            .groupBy("day").count().orderBy("day").collect())
    return [int(r["count"]) for r in rows]


def test_pettitt_matches_python(spark, sf_dir):
    ys = _daily_counts(spark, sf_dir)
    n = len(ys)
    xs = sorted(ys)
    first = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    cnt = Counter(xs)
    r2 = {v: 2 * first[v] + (cnt[v] - 1) for v in cnt}  # doubled midrank
    s2, k = 0, 0
    for tt, y in enumerate(ys, start=1):
        s2 += r2[y]
        k = max(k, abs(s2 - tt * (n + 1)))
    row = QUERIES["changepoint_pettitt"](spark, sf_dir).first()
    assert row["n_days"] == n
    assert row["k_stat"] == k
    assert 0.0 <= row["p_approx"] <= 1.0


def test_turning_points_matches_python(spark, sf_dir):
    ys = _daily_counts(spark, sf_dir)
    tp = sum(1 for i in range(1, len(ys) - 1)
             if (ys[i] - ys[i - 1]) * (ys[i + 1] - ys[i]) < 0)
    row = QUERIES["timeseries_turning_points"](spark, sf_dir).first()
    assert row["n_days"] == len(ys)
    assert row["n_tp"] == tp
    e = 2 * (len(ys) - 2) / 3
    assert abs(row["expected_tp"] - e) < 1e-9


def test_theta_matches_python_fold(spark, sf_dir):
    rows = (t(spark, sf_dir, "events")
            .selectExpr("event_type",
                        "date_trunc('day', CAST(ts AS TIMESTAMP)) AS d")
            .groupBy("event_type", "d").count()
            .orderBy("event_type", "d").collect())
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(int(r["count"]))
    got = {r["event_type"]: r for r in
           QUERIES["forecast_theta_method"](spark, sf_dir).collect()}
    for et, ys in series.items():
        ntr = len(ys) // 2
        if ntr < 3 or len(ys) - ntr < 1:
            assert et not in got
            continue
        tr = ys[:ntr]
        n = ntr
        st = n * (n + 1) // 2
        stt = sum(i * i for i in range(1, n + 1))
        sy = sum(tr)
        sty = sum((i + 1) * y for i, y in enumerate(tr))
        b = (n * sty - st * sy) / (float(n) * stt - float(st) * st)
        a = sy / float(n) - b * (st / float(n))
        th = [2 * tr[k - 1] - (a + b * k) for k in range(1, n + 1)]
        l = th[0]
        for e in th[1:]:
            l = (e + l) / 2
        r = got[et]
        assert abs(r["a"] - a) < 1e-9 * max(1, abs(a))
        assert abs(r["ses_level"] - l) < 1e-9 * max(1, abs(l))
        # holdout MSE/MAE sanity
        assert r["n_test"] == len(ys) - ntr
        assert r["mse"] >= 0 and r["mae"] >= 0


def test_rbp_is_bounded_and_monotone_in_rel(spark, sf_dir):
    rows = QUERIES["eval_rank_biased_precision"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rbp"] <= 1.0
        if r["n_rel_topk"] == 0:
            assert r["rbp"] == 0.0


def test_exposure_shares_sum_to_one(spark, sf_dir):
    rows = QUERIES["eval_exposure_fairness"](spark, sf_dir).collect()
    assert abs(sum(r["exposure_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["item_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["disparity"]
                   - r["exposure_share"] / r["item_share"]) < 1e-12


def test_atkinson_relates_to_theil_l(spark, sf_dir):
    a = QUERIES["inequality_atkinson_index"](spark, sf_dir).first()
    th = QUERIES["inequality_theil_index"](spark, sf_dir).first()
    # A(1) = 1 - exp(-Theil_L) up to the round-9 fences on both paths
    assert abs(a["atkinson_e1"]
               - (1 - math.exp(-th["theil_l"]))) < 1e-6
    assert 0.0 <= a["atkinson_e1"] < 1.0
    assert 0.0 <= a["atkinson_e2"] < 1.0
    assert a["atkinson_e2"] >= a["atkinson_e1"] - 1e-9  # aversion monotone


def test_weibull_matches_python_ols(spark, sf_dir):
    ev = (t(spark, sf_dir, "events")
          .selectExpr("user_id",
                      "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
          .groupBy("user_id")
          .agg({"us": "min"}).collect())
    # structural check only (the censoring rule is pinned by the NA
    # tests): shape/scale positive, median consistent with shape/scale
    row = QUERIES["survival_weibull_medianrank"](spark, sf_dir).first()
    assert ev  # events exist
    assert row["n_events"] > 0
    assert row["shape_k"] > 0
    assert row["scale_days"] > 0
    lam, k = row["scale_days"], row["shape_k"]
    assert abs(row["median_days"]
               - lam * math.exp(math.log(math.log(2)) / k)) < 1e-6 * lam


def test_cooks_distance_properties(spark, sf_dir):
    rows = QUERIES["stats_cooks_distance"](spark, sf_dir).collect()
    assert len(rows) == 10
    ds = [r["cooks_d"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        assert r["cooks_d"] >= 0
        assert 0.0 < r["leverage"] < 1.0


def test_bartlett_matches_python(spark, sf_dir):
    rows = [(r["lang"], int(r["n_chars"])) for r in
            t(spark, sf_dir, "documents").select("lang",
                                                 "n_chars").collect()]
    groups = {}
    for lang, x in rows:
        groups.setdefault(lang, []).append(x)
    k = len(groups)
    nt = len(rows)
    vs = {}
    for lang, xs in groups.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        vs[lang] = (n * s2 - s1 * s1) / (n * (n - 1)) / (1 << 20)
    ssw = sum((len(groups[g]) - 1) * vs[g] for g in groups)
    sln = sum((len(groups[g]) - 1) * math.log(vs[g]) for g in groups)
    m = (nt - k) * math.log(ssw / (nt - k)) - sln
    c = 1 + (sum(1.0 / (len(groups[g]) - 1) for g in groups)
             - 1.0 / (nt - k)) / (3 * (k - 1))
    row = QUERIES["stats_bartlett"](spark, sf_dir).first()
    assert row["k_groups"] == k and row["n_total"] == nt
    # M is a small difference of ~(N-k)*ln terms, so the engine's
    # round-6 fences on the weighted-ln sums amplify to ~N*5e-7 here
    assert abs(row["bartlett_stat"] - m / c) < max(1e-5 * abs(m / c),
                                                   nt * 1e-6)


def test_welch_anova_matches_python(spark, sf_dir):
    rows = [(r["lang"], int(r["n_chars"])) for r in
            t(spark, sf_dir, "documents").select("lang",
                                                 "n_chars").collect()]
    groups = {}
    for lang, x in rows:
        groups.setdefault(lang, []).append(x)
    k = len(groups)
    stats = {}
    for g, xs in groups.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        v = (n * s2 - s1 * s1) / (n * (n - 1))
        stats[g] = (n, s1 / n, n / v)
    sw = sum(w for _, _, w in stats.values())
    mbar = sum(w * m for _, m, w in stats.values()) / sw
    sb = sum(w * (m - mbar) ** 2 for _, m, w in stats.values())
    sl = sum((1 - w / sw) ** 2 / (n - 1) for n, _, w in stats.values())
    f = (sb / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * sl)
    row = QUERIES["stats_welch_anova"](spark, sf_dir).first()
    assert row["k_groups"] == k
    assert abs(row["welch_f"] - f) < 1e-5 * max(1, abs(f))
    assert abs(row["df_denom"] - (k * k - 1) / (3 * sl)) \
        < 1e-5 * (k * k - 1) / (3 * sl)


def test_fisher_exact_matches_python(spark, sf_dir):
    rows = [(r["lang"], int(r["n_chars"])) for r in
            t(spark, sf_dir, "documents").select("lang",
                                                 "n_chars").collect()]
    n = len(rows)
    a = sum(1 for l, x in rows if l == "en" and x >= 300)
    r1 = sum(1 for l, _ in rows if l == "en")
    c1 = sum(1 for _, x in rows if x >= 300)
    lf = [0.0]
    for i in range(1, n + 1):
        lf.append(lf[-1] + math.log(i))

    def logp(kk):
        return (lf[r1] + lf[n - r1] + lf[c1] + lf[n - c1] - lf[n]
                - lf[kk] - lf[r1 - kk] - lf[c1 - kk]
                - lf[n - r1 - c1 + kk])

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    lpo = logp(a)
    p = sum(math.exp(logp(kk)) for kk in range(lo, hi + 1)
            if logp(kk) <= lpo + 1e-7)
    row = QUERIES["stats_fisher_exact_2x2"](spark, sf_dir).first()
    assert row["a_observed"] == a and row["n_total"] == n
    assert abs(row["p_two_sided"] - p) < 1e-5
    assert 0.0 < row["p_two_sided"] <= 1.0 + 1e-9


def test_sample_entropy_matches_python(spark, sf_dir):
    ys = _daily_counts(spark, sf_dir)
    n = len(ys)
    s1, s2 = sum(ys), sum(y * y for y in ys)
    sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
    r = max(int(sd / 5.0), 1)
    bc = ac = 0
    # Richman-Moorman: both A and B over the first N-m templates
    for i in range(n - 2):
        for j in range(i + 1, n - 2):
            if abs(ys[i] - ys[j]) <= r and abs(ys[i + 1] - ys[j + 1]) <= r:
                bc += 1
                if abs(ys[i + 2] - ys[j + 2]) <= r:
                    ac += 1
    row = QUERIES["timeseries_sample_entropy"](spark, sf_dir).first()
    assert row["n_days"] == n
    assert row["r_tolerance"] == r
    assert row["b_count"] == bc
    assert row["a_count"] == ac
    if ac and bc:
        assert abs(row["sampen"] - (-math.log(ac / bc))) < 1e-6


def test_hill_tail_index_matches_python(spark, sf_dir):
    revs = [float(r["rev"]) for r in
            t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg({"o_totalprice": "sum"})
            .withColumnRenamed("sum(o_totalprice)", "rev").collect()]
    k = 100
    row = QUERIES["stats_hill_tail_index"](spark, sf_dir).first()
    if len(revs) <= k:
        assert row is None
        return
    xs = sorted(revs, reverse=True)
    thr = xs[k]
    gamma = sum(math.log(x / thr) for x in xs[:k]) / k
    assert abs(row["threshold"] - thr) < 1e-6 * thr
    assert abs(row["hill_gamma"] - gamma) < 1e-5 * max(1, abs(gamma))
    assert row["tail_alpha"] > 0


def test_hosmer_lemeshow_properties(spark, sf_dir):
    row = QUERIES["eval_hosmer_lemeshow"](spark, sf_dir).first()
    assert 1 <= row["n_bins"] <= 10
    assert row["hl_stat"] >= 0


def test_dickey_fuller_matches_python(spark, sf_dir):
    ys = _daily_counts(spark, sf_dir)
    pairs = [(ys[i - 1], ys[i] - ys[i - 1]) for i in range(1, len(ys))]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(d for _, d in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * d for x, d in pairs)
    syy = sum(d * d for _, d in pairs)
    cov_n = n * sxy - sx * sy
    varx_n = float(n) * sxx - float(sx) * sx
    vary_n = float(n) * syy - float(sy) * sy
    rho = cov_n / varx_n
    # textbook OLS slope se (n-scaled moments cancel; no residual n)
    se = math.sqrt((vary_n - cov_n * (cov_n / varx_n))
                   / (n - 2) / varx_n)
    row = QUERIES["timeseries_dickey_fuller"](spark, sf_dir).first()
    assert row["n_obs"] == n
    assert abs(row["rho_hat"] - rho) < 1e-9 * max(1, abs(rho))
    assert abs(row["df_tstat"] - rho / se) < 1e-6 * max(1, abs(rho / se))
    assert row["rho_hat"] <= 0  # differences regress toward the level
    # independent textbook recompute: explicit residuals, never the
    # n-scaled moment shortcut (guards the sqrt(n) deflation class)
    xb, yb = sx / n, sy / n
    a = yb - rho * xb
    sse = sum((d - a - rho * x) ** 2 for x, d in pairs)
    sxx_c = sum((x - xb) ** 2 for x, _ in pairs)
    se_ref = math.sqrt(sse / (n - 2) / sxx_c)
    assert abs(row["df_tstat"] - rho / se_ref) \
        < 1e-5 * max(1, abs(rho / se_ref))


def test_katz_properties(spark, sf_dir):
    rows = QUERIES["graph_katz_centrality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # x - 1 = alpha*deg + ... > 0 for any node with an edge, and the
        # 3-term attenuated path series is finite
        assert r["katz"] > 0


def test_query_clarity_properties(spark, sf_dir):
    row = QUERIES["ir_query_clarity"](spark, sf_dir).first()
    assert row["n_fb_docs"] >= 1
    assert row["fb_vocab_size"] > 0
    assert row["fb_len"] > 0
    # KL divergence of the feedback model from the corpus model is >= 0
    # up to the round-9 fences on each term
    assert row["clarity"] > -1e-6
