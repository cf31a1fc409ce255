"""Pins for the r12j wave: Yuen's trimmed t, Gries' DP dispersion,
Cohen's h."""

import math
from collections import Counter, defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_yuen_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars").collect()
    groups = {1: [], 0: []}
    for r in d:
        groups[1 if r["lang"] == "en" else 0].append(
            (r["n_chars"], r["doc_id"]))

    def stats(vals):
        vals = sorted(vals)
        xs = [v[0] for v in vals]
        n = len(xs)
        tg = n // 5
        lo, hi = xs[tg], xs[n - tg - 1]
        trimmed = xs[tg:n - tg]
        win = [lo] * tg + trimmed + [hi] * tg
        h = len(trimmed)
        st = sum(trimmed)
        sw = sum(win)
        sww = sum(v * v for v in win)
        mt = st / float(h)
        swv = (sww - sw / float(n) * sw) / (n - 1)
        dj = (n - 1) * swv / (float(h) * (h - 1))
        return n, h, mt, dj

    n1, h1, mt1, d1 = stats(groups[1])
    n0, h0, mt0, d0 = stats(groups[0])
    tstat = (mt1 - mt0) / math.sqrt(d1 + d0)
    dfy = ((d1 + d0) * (d1 + d0)
           / (d1 * d1 / (h1 - 1) + d0 * d0 / (h0 - 1)))
    row = QUERIES["eval_yuen_trimmed_t"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["h_en"]) == (n1, h1)
    assert (row["n_other"], row["h_other"]) == (n0, h0)
    assert row["trimmed_mean_diff"] == mt1 - mt0
    assert row["t_yuen"] == tstat
    assert row["df_yuen"] == dfy
    assert min(h1, h0) - 1 <= row["df_yuen"] <= h1 + h0 - 2


def test_dispersion_dp_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("source", "text").collect()
    per_part = defaultdict(Counter)
    for r in d:
        per_part[r["source"]].update(r["text"].split(" "))
    sizes = {s: sum(c.values()) for s, c in per_part.items()}
    tt = sum(sizes.values())
    tf = Counter()
    for s, c in per_part.items():
        tf.update(c)
    top = sorted(tf, key=lambda tk: (-tf[tk], tk))[:30]
    rows = {r["tok"]: r for r in
            QUERIES["token_dispersion_dp"](spark, sf_dir).collect()}
    assert set(rows) == set(top)
    for tok in top:
        f = tf[tok]
        s = Decimal(0)
        for src, c in per_part.items():
            if tok in c:
                si = sizes[src] / float(tt)
                s += Decimal(repr(round(
                    abs(c[tok] / float(f) - si) - si, 9)))
        dp = (float(s) + 1) / 2
        r = rows[tok]
        assert r["freq"] == f
        assert r["dp"] == dp
        assert -1e-9 <= r["dp"] <= 1.0 + 1e-9


def test_cohens_h_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    n1 = k1 = n0 = k0 = 0
    for r in d:
        if r["lang"] == "en":
            n1 += 1
            k1 += 1 if r["n_chars"] >= 300 else 0
        else:
            n0 += 1
            k0 += 1 if r["n_chars"] >= 300 else 0
    h = (2 * round(math.asin(math.sqrt(k1 / float(n1))), 9)
         - 2 * round(math.asin(math.sqrt(k0 / float(n0))), 9))
    row = QUERIES["eval_cohens_h"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["p_en"] == k1 / float(n1)
    assert row["p_other"] == k0 / float(n0)
    assert row["cohens_h"] == h
    assert abs(row["cohens_h"]) <= math.pi


def test_cramer_von_mises_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars").collect()
    rows = sorted((r["n_chars"], r["doc_id"],
                   1 if r["lang"] == "en" else 0) for r in d)
    xs = [r[0] for r in rows]
    first = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    cnt = Counter(xs)
    mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    d4 = {1: 0, 0: 0}
    nn = {1: 0, 0: 0}
    pos = {1: 0, 0: 0}
    for x, _, grp in rows:  # already sorted by (x, doc_id)
        pos[grp] += 1
        delta2 = int(2 * (mid[x] - pos[grp]))
        d4[grp] += delta2 * delta2
        nn[grp] += 1
    n1, n0 = nn[1], nn[0]
    u = (n1 * d4[1] + n0 * d4[0]) / 4.0
    tstat = (u / (float(n1) * n0 * (n1 + n0))
             - (4 * n1 * n0 - 1) / (6.0 * (n1 + n0)))
    row = QUERIES["drift_cramer_von_mises"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["u_stat"] == u
    assert row["t_cvm"] == tstat
    assert row["t_cvm"] > -1.0 / 6
