"""Hand-recomputed references for the round-12 inferential-statistics wave
(Kruskal-Wallis, Brown-Forsythe, Welch's t, Jarque-Bera). Each test
recomputes the statistic in plain python (mirroring the engine's exact
integer-sum formulation) from the smoke-scale documents table and pins
the engine row, plus structural identities (sign/range/df)."""

import math
from collections import Counter
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def _docs(spark, sf_dir):
    return [(r["lang"], int(r["n_chars"]), r["text"])
            for r in t(spark, sf_dir, "documents")
            .select("lang", "n_chars", "text").collect()]


def test_kruskal_wallis_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    xs = sorted(x for _, x, _ in rows)
    n = len(xs)
    # midrank per value: min-rank + (ties-1)/2, exact in halves
    first = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    cnt = Counter(xs)
    mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    by_lang = {}
    for lang, x, _ in rows:
        by_lang.setdefault(lang, []).append(x)
    s = Decimal(0)
    for vals in by_lang.values():
        r_j = sum(int(2 * mid[v]) for v in vals) / 2.0
        sc = r_j / 16384
        s += Decimal(repr(round(sc * sc / len(vals), 9)))
    h = 12.0 * 16384 * 16384 * float(s) / (float(n) * (n + 1)) - 3.0 * (n + 1)
    ts = sum(c ** 3 - c for c in cnt.values())
    h_adj = h / (1.0 - ts / (float(n) * n * n - n))
    row = QUERIES["eval_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert row["n_obs"] == n and row["k_groups"] == len(by_lang)
    assert row["h_stat"] == h
    assert row["h_adj"] == h_adj
    assert row["h_adj"] >= row["h_stat"] > 0  # tie correction inflates H


def test_brown_forsythe_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    by_lang = {}
    for lang, x, _ in rows:
        by_lang.setdefault(lang, []).append(x)

    def median(vals):
        v = sorted(vals)
        m = len(v)
        lo, hi = v[(m - 1) // 2], v[m // 2]
        return lo + 0.5 * (hi - lo)

    n = len(rows)
    k = len(by_lang)
    g2 = s2_4 = 0
    sb = Decimal(0)
    for vals in by_lang.values():
        med = median(vals)
        z2 = sum(int(2 * abs(x - med)) for x in vals)
        s2_4 += sum(int(4 * abs(x - med) * abs(x - med)) for x in vals)
        g2 += z2
        sc = z2 / 2.0 / 1024
        sb += Decimal(repr(round(sc * sc / len(vals), 9)))
    sb = float(sb)
    gs = g2 / 2.0 / 1024
    ssb = sb - gs * gs / n
    ssw = s2_4 / 4.0 / (1024 * 1024) - sb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = QUERIES["eval_brown_forsythe"](spark, sf_dir).collect()[0]
    assert row["n_obs"] == n and row["k_groups"] == k
    assert row["f_stat"] == f
    assert row["f_stat"] > 0


def test_welch_ttest_matches_python(spark, sf_dir):
    rows = _docs(spark, sf_dir)
    g1 = [len(txt.split(" ")) for lang, _, txt in rows if lang == "en"]
    g0 = [len(txt.split(" ")) for lang, _, txt in rows if lang != "en"]

    def mom(g):
        n, s1, s2 = len(g), sum(g), sum(x * x for x in g)
        m = s1 / float(n)
        se = (s2 - s1 / float(n) * s1) / (n - 1) / n
        return n, m, se

    n1, m1, se1 = mom(g1)
    n0, m0, se0 = mom(g0)
    tstat = (m1 - m0) / math.sqrt(se1 + se0)
    df = ((se1 + se0) * (se1 + se0)
          / (se1 * se1 / (n1 - 1) + se0 * se0 / (n0 - 1)))
    row = QUERIES["eval_welch_ttest"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["t_stat"] == tstat
    assert row["df_welch"] == df
    # Welch df is bounded by min(n1,n0)-1 below and n1+n0-2 above
    assert min(n1, n0) - 1 <= row["df_welch"] <= n1 + n0 - 2


def test_jarque_bera_matches_python(spark, sf_dir):
    xs = [x for _, x, _ in _docs(spark, sf_dir)]
    n, s1 = len(xs), sum(xs)
    ctr = s1 // n
    p2 = sum((x - ctr) ** 2 for x in xs)
    p3 = sum((x - ctr) ** 3 for x in xs)
    p4 = sum((x - ctr) ** 4 for x in xs)
    d = s1 / float(n) - ctr
    r2, r3, r4 = p2 / float(n), p3 / float(n), p4 / float(n)
    m2 = r2 - d * d
    m3 = r3 - 3 * d * r2 + 2 * d * d * d
    m4 = r4 - 4 * d * r3 + 6 * d * d * r2 - 3 * d * d * d * d
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2)
    jb = (n / 6.0) * (skew * skew + (kurt - 3) * (kurt - 3) / 4.0)
    row = QUERIES["eval_jarque_bera"](spark, sf_dir).collect()[0]
    assert row["n_obs"] == n
    assert row["skewness"] == skew
    assert row["kurtosis"] == kurt
    assert row["jb_stat"] == jb
    assert row["jb_stat"] >= 0 and row["kurtosis"] > 0
