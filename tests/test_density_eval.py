"""Pins for the r12g wave: LOF, TOST equivalence, QQ-decile drift."""

import math
from collections import defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t

K = 5
EPS = 1.0 / (1 << 20)


def _lof_python(spark, sf_dir):
    rows = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    bucket = {}
    for vid, v in vecs.items():
        b = 0
        for i in range(4):
            b = b * 2 + (1 if v[i] > 0 else 0)
        bucket[vid] = b
    by_bucket = defaultdict(list)
    for vid in sorted(vecs):
        by_bucket[bucket[vid]].append(vid)
    cand = {b: set(ids[:64]) for b, ids in by_bucket.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(y * y for y in vecs[b]))
        return round(d / (na * nb), 9)

    knn = {}
    for vid in vecs:
        cs = [(1.0 - cos(vid, nid), nid)
              for nid in cand[bucket[vid]] if nid != vid]
        cs.sort()
        if len(cs) >= K:
            knn[vid] = cs[:K]
    kdist = {vid: max(d for d, _ in knn[vid]) for vid in knn}
    lrd = {}
    for vid in knn:
        if all(nid in kdist for _, nid in knn[vid]):
            s = sum(Decimal(repr(round(
                max(kdist[nid], d, EPS), 9))) for d, nid in knn[vid])
            lrd[vid] = round(float(K) / float(s), 9)
    lof = {}
    for vid in lrd:
        if all(nid in lrd for _, nid in knn[vid]):
            s = sum(Decimal(repr(lrd[nid])) for _, nid in knn[vid])
            lof[vid] = float(s) / K / lrd[vid]
    top = sorted(lof, key=lambda v: (-lof[v], v))[:20]
    return lof, top


def test_lof_matches_python(spark, sf_dir):
    lof, top = _lof_python(spark, sf_dir)
    rows = QUERIES["emb_lof_outliers"](spark, sf_dir).collect()
    got = {r["vid"]: (r["lof"], r["outlier_rank"]) for r in rows}
    assert list(got) == top
    for rank, vid in enumerate(top, start=1):
        assert got[vid] == (lof[vid], rank)
    # LOF of the top outlier must exceed the neighborhood-typical 1.0
    assert lof[top[0]] > 1.0


def test_tost_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("lang", "text").collect()
    g1 = [len(r["text"].split(" ")) for r in d if r["lang"] == "en"]
    g0 = [len(r["text"].split(" ")) for r in d if r["lang"] != "en"]
    n1, n0 = len(g1), len(g0)
    s11, s21 = sum(g1), sum(x * x for x in g1)
    s10, s20 = sum(g0), sum(x * x for x in g0)
    diff = s11 / float(n1) - s10 / float(n0)
    margin = (s11 + s10) / float(n1 + n0) / 20
    se = math.sqrt((s21 - s11 / float(n1) * s11) / (n1 - 1) / n1
                   + (s20 - s10 / float(n0) * s10) / (n0 - 1) / n0)
    row = QUERIES["eval_tost_equivalence"](spark, sf_dir).collect()[0]
    assert (row["n_en"], row["n_other"]) == (n1, n0)
    assert row["mean_diff"] == diff
    assert row["margin"] == margin
    assert row["t_lower"] == (diff + margin) / se
    assert row["t_upper"] == (diff - margin) / se
    assert row["point_within_margin"] == (abs(diff) < margin)
    assert row["t_lower"] > row["t_upper"]  # margin > 0 by construction


def test_qq_deciles_match_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars").collect()
    per_src = defaultdict(list)
    for r in d:
        per_src[r["source"]].append((r["n_chars"], r["doc_id"]))
    top2 = sorted(per_src, key=lambda s: (-len(per_src[s]), s))[:2]
    qs = {}
    for g, src in enumerate(top2, start=1):
        vals = sorted(per_src[src])
        n = len(vals)
        for dec in range(1, 10):
            qs[(g, dec)] = vals[(n - 1) * dec // 10][0]
    a = [qs[(1, k)] for k in range(1, 10)]
    b = [qs[(2, k)] for k in range(1, 10)]
    np_, sa, sb = 9, sum(a), sum(b)
    saa = sum(x * x for x in a)
    sbb = sum(y * y for y in b)
    sab = sum(x * y for x, y in zip(a, b))
    corr = (np_ * sab - sa * sb) / math.sqrt(
        float(np_ * saa - sa * sa) * (np_ * sbb - sb * sb))
    rows = {r["decile"]: r for r in
            QUERIES["drift_qq_deciles"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 10))
    for dec in range(1, 10):
        r = rows[dec]
        assert (r["q_src1"], r["q_src2"]) == (qs[(1, dec)], qs[(2, dec)])
        assert r["qq_corr"] == corr
    # both marginals are sorted, so quantile vectors correlate strongly
    assert corr > 0.8
