"""Pins for the r12k wave: Holt-Winters additive, Mann-Whitney U,
two-proportion z-test."""

import math
from collections import Counter, defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t

A, B, G = 3 / 10.0, 1 / 10.0, 2 / 10.0


def test_holt_winters_matches_python(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderdate").collect()
    per_day = Counter(str(r["o_orderdate"])[:10] for r in o)
    days = sorted(per_day)
    ys = [float(per_day[d]) for d in days]
    nd = len(ys)
    n_train = nd // 2
    assert n_train >= 15
    train = ys[:n_train]
    m1 = sum(train[0:7]) / 7.0
    b0 = (sum(train[7:14]) / 7.0 - sum(train[0:7]) / 7.0) / 7.0
    state = [m1, b0] + [train[i] - m1 for i in range(7)]
    for y in train[7:]:
        l_, b_, s = state[0], state[1], state[2]
        ln = A * (y - s) + (1 - A) * (l_ + b_)
        bn = B * (ln - l_) + (1 - B) * b_
        sn = G * (y - ln) + (1 - G) * s
        state = [ln, bn] + state[3:] + [sn]
    mae_s, mse_s, n_test = Decimal(0), Decimal(0), 0
    for rn in range(n_train + 1, nd + 1):
        h = rn - n_train
        pred = state[0] + h * state[1] + state[2 + (h - 1) % 7]
        resid = ys[rn - 1] - pred
        mae_s += Decimal(repr(round(abs(resid), 9)))
        mse_s += Decimal(repr(round(resid * resid, 6)))
        n_test += 1
    row = QUERIES["forecast_holt_winters"](spark, sf_dir).collect()[0]
    assert row["n_train"] == n_train and row["n_test"] == n_test
    assert row["level_fit"] == state[0]
    assert row["trend_fit"] == state[1]
    assert row["mae"] == float(mae_s) / n_test
    assert row["mse"] == float(mse_s) / n_test
    # positive error, bounded loosely: a frozen linear trend
    # extrapolated over a half-series horizon can overshoot the series
    # range (it does at smoke scale), but not by orders of magnitude
    assert 0 < row["mae"] < 20 * max(ys)


def test_mann_whitney_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    xs = sorted(r["n_chars"] for r in d)
    n = len(xs)
    first, cnt = {}, Counter(xs)
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    r2_1 = sum(int(2 * mid[r["n_chars"]]) for r in d if r["lang"] == "en")
    n1 = sum(1 for r in d if r["lang"] == "en")
    n0 = n - n1
    ts = sum(c ** 3 - c for c in cnt.values())
    u = r2_1 / 2.0 - n1 * (n1 + 1) / 2.0
    sd = math.sqrt(float(n1) * n0 / 12
                   * ((n + 1) - ts / (float(n) * (n - 1))))
    row = QUERIES["eval_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["u_stat"] == u
    assert row["cl_effect"] == u / (float(n1) * n0)
    assert row["z_score"] == (u - float(n1) * n0 / 2) / sd
    assert 0.0 <= row["cl_effect"] <= 1.0


def test_proportions_ztest_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    n1 = k1 = n0 = k0 = 0
    for r in d:
        if r["lang"] == "en":
            n1 += 1
            k1 += 1 if r["n_chars"] >= 300 else 0
        else:
            n0 += 1
            k0 += 1 if r["n_chars"] >= 300 else 0
    diff = k1 / float(n1) - k0 / float(n0)
    pp = (k1 + k0) / float(n1 + n0)
    se = math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n0))
    cc = (1.0 / n1 + 1.0 / n0) / 2
    row = QUERIES["eval_proportions_ztest"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["rate_diff"] == diff
    assert row["z_pooled"] == diff / se
    assert row["z_continuity"] == (abs(diff) - cc) / se
    # continuity correction always shrinks the statistic toward zero
    assert abs(row["z_continuity"]) <= abs(row["z_pooled"]) + 1e-12
