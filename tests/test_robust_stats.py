"""Pins for the r12e robust/nonparametric wave: Chao1+ACE, Friedman,
Anderson-Darling uniformity, Grubbs, Cochran's Q — each recomputed in
plain python mirroring the engine's exact formulation."""

import hashlib
import math
from collections import Counter, defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_chao1_ace_match_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("source", "text").collect()
    per_src = defaultdict(Counter)
    for r in d:
        per_src[r["source"]].update(r["text"].split(" "))
    rows = {r["source"]: r for r in
            QUERIES["vocab_chao1_ace"](spark, sf_dir).collect()}
    assert set(rows) == set(per_src)
    for src, cnt in per_src.items():
        coc = Counter(cnt.values())
        s_obs = sum(coc.values())
        f1, f2 = coc.get(1, 0), coc.get(2, 0)
        s_rare = sum(v for r_, v in coc.items() if r_ <= 10)
        s_abund = s_obs - s_rare
        n_rare = sum(r_ * v for r_, v in coc.items() if r_ <= 10)
        sum_rr1 = sum(r_ * (r_ - 1) * v for r_, v in coc.items()
                      if r_ <= 10)
        chao1_bc = s_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        if n_rare <= 1:
            ace = None  # engine NULLIF guards: degenerate rare stratum
        else:
            c_ace = 1.0 - f1 / float(n_rare)
            if c_ace == 0.0:
                ace = None
            else:
                gamma = max((s_rare / c_ace) * sum_rr1
                            / (float(n_rare) * (n_rare - 1)) - 1.0, 0.0)
                ace = s_abund + s_rare / c_ace + (f1 / c_ace) * gamma
        r = rows[src]
        assert (r["s_obs"], r["f1"], r["f2"]) == (s_obs, f1, f2)
        assert r["chao1_bc"] == chao1_bc
        assert r["ace"] == ace
        assert r["chao1_bc"] >= s_obs  # estimator never below observed


def test_friedman_matches_python(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    cells = defaultdict(int)
    for r in o:
        dt = r["o_orderdate"]
        cells[(dt.year, (dt.month - 1) // 3 + 1)] += int(
            round(r["o_totalprice"] * 100))
    years = sorted({y for y, _ in cells})
    full = [y for y in years
            if all((y, q) in cells for q in (1, 2, 3, 4))]
    r2 = {q: 0 for q in (1, 2, 3, 4)}
    for y in full:
        vals = sorted(cells[(y, q)] for q in (1, 2, 3, 4))
        for q in (1, 2, 3, 4):
            v = cells[(y, q)]
            minrank = vals.index(v) + 1
            ties = vals.count(v)
            r2[q] += int(2 * (minrank + (ties - 1) / 2.0))
    n = len(full)
    ssq = sum(r2[q] * r2[q] for q in (1, 2, 3, 4))
    chi2 = 3.0 * ssq / (20 * n) - 15.0 * n
    row = QUERIES["eval_friedman_quarters"](spark, sf_dir).collect()[0]
    assert row["n_years"] == n
    for q in (1, 2, 3, 4):
        assert row[f"rank_sum_q{q}"] == r2[q] / 2.0
    assert row["chi2_friedman"] == chi2
    assert row["kendalls_w"] == chi2 / (3.0 * n)
    assert 0.0 <= row["kendalls_w"] <= 1.0 + 1e-12


def _u(doc_id):
    h = hashlib.md5(f"ad:{doc_id}".encode()).hexdigest()[:8]
    return (int(h, 16) + 0.5) / 4294967296.0


def test_anderson_darling_matches_python(spark, sf_dir):
    ids = [r["doc_id"] for r in
           t(spark, sf_dir, "documents").select("doc_id").collect()]
    us = sorted((_u(i), i) for i in ids)
    n = len(us)
    s = Decimal(0)
    for idx, (u, _) in enumerate(us, start=1):
        term = round((2 * idx - 1) * round(math.log(u), 9)
                     + (2 * (n - idx) + 1) * round(math.log(1 - u), 9), 6)
        s += Decimal(repr(term))
    a2 = -n - float(s) / n
    row = QUERIES["dq_anderson_darling_uniform"](spark, sf_dir).collect()[0]
    assert row["n_keys"] == n
    assert row["a2_stat"] == a2
    # md5 keys should comfortably pass uniformity (1% critical ~ 3.9)
    assert 0.0 < row["a2_stat"] < 3.9


def test_grubbs_matches_python(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    per_day = defaultdict(int)
    for r in o:
        per_day[str(r["o_orderdate"])[:10]] += int(
            round(r["o_totalprice"] * 100))
    days = sorted(per_day)
    vs = {d: per_day[d] // 100 for d in days}
    n = len(days)
    s1 = sum(vs.values())
    s2 = sum(v * v for v in vs.values())
    best = min(days, key=lambda d: (-abs(n * vs[d] - s1), d))
    sd = math.sqrt((s2 - s1 / float(n) * s1) / (n - 1))
    g = (abs(n * vs[best] - s1) / float(n)) / sd
    row = QUERIES["anomaly_grubbs_daily"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert str(row["outlier_day"]) == best
    assert row["g_stat"] == g
    assert row["g_stat"] > 1.0


def test_cochran_q_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("n_chars", "text").collect()
    c1 = c2 = c3 = sl = sl2 = 0
    for r in d:
        ntok = len(r["text"].split(" "))
        g1 = 1 if r["n_chars"] >= 300 else 0
        g2 = 1 if ntok >= 60 else 0
        g3 = 1 if r["n_chars"] >= 5 * ntok else 0
        li = g1 + g2 + g3
        c1, c2, c3, sl, sl2 = c1 + g1, c2 + g2, c3 + g3, sl + li, \
            sl2 + li * li
    q = 2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - sl * sl) \
        / (3 * sl - sl2)
    row = QUERIES["eval_cochran_q"](spark, sf_dir).collect()[0]
    assert (row["g1_pass"], row["g2_pass"], row["g3_pass"]) == (c1, c2, c3)
    assert row["q_stat"] == q
    assert row["df"] == 2 and row["q_stat"] >= 0.0
