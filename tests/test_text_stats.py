"""Pins for the r12f corpus-linguistics wave: tokenizer fertility,
partial correlation, Church-Gale adaptation, Fightin' Words log-odds."""

import math
from collections import Counter, defaultdict

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def _docs(spark, sf_dir):
    return t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text").collect()


def test_fertility_matches_python(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, subwords, chars
    for r in _docs(spark, sf_dir):
        ws = r["text"].split(" ")
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += len(ws)
        a[2] += sum((len(w) + 3) // 4 for w in ws)
        a[3] += r["n_chars"]
    rows = {r["lang"]: r for r in
            QUERIES["token_fertility_by_lang"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for lang, (nd, nw, nsw, nc) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["n_words"], r["n_subwords"]) == (nd, nw, nsw)
        assert r["fertility"] == nsw / float(nw)
        assert r["chars_per_word"] == nc / float(nw)
        assert r["fertility"] >= 1.0  # every word costs >= 1 subword


def test_partial_correlation_matches_python(spark, sf_dir):
    xs, ys, zs = [], [], []
    for r in _docs(spark, sf_dir):
        ws = r["text"].split(" ")
        xs.append(r["n_chars"])
        ys.append(len(ws))
        zs.append(max(len(w) for w in ws))
    n = len(xs)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(u * v for u, v in zip(a, b))
        saa = sum(u * u for u in a)
        sbb = sum(v * v for v in b)
        return (n * sab - sa * sb) / math.sqrt(
            float(n * saa - sa * sa) * (n * sbb - sb * sb))

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz))
    row = QUERIES["stats_partial_correlation"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert row["r_chars_tokens"] == rxy
    assert row["r_chars_maxw"] == rxz
    assert row["r_tokens_maxw"] == ryz
    assert row["partial_r_given_maxw"] == part
    # chars~tokens should stay strongly related after the control
    assert row["partial_r_given_maxw"] > 0.5


def test_adaptation_matches_python(spark, sf_dir):
    f_sets, s_sets = {}, {}
    for r in _docs(spark, sf_dir):
        ws = r["text"].split(" ")
        nw = len(ws)
        if nw < 2:
            continue
        h = nw // 2
        f_sets[r["doc_id"]] = set(ws[:h])
        s_sets[r["doc_id"]] = set(ws[h:])
    n_docs = len(f_sets)
    d1, d2, db = Counter(), Counter(), Counter()
    for did in f_sets:
        for tok in f_sets[did]:
            d1[tok] += 1
        for tok in s_sets[did]:
            d2[tok] += 1
        for tok in f_sets[did] & s_sets[did]:
            db[tok] += 1
    eligible = sorted((tok for tok, c in d1.items() if c >= 5),
                      key=lambda tk: (-d1[tk], tk))[:50]
    rows = {r["tok"]: r for r in
            QUERIES["token_adaptation_churchgale"](
                spark, sf_dir).collect()}
    assert set(rows) == set(eligible)
    for tok in eligible:
        r = rows[tok]
        assert (r["df_first"], r["df_second"], r["df_both"]) == (
            d1[tok], d2[tok], db[tok])
        assert r["adaptation"] == db[tok] / float(d1[tok])
        assert r["prior"] == d2[tok] / float(n_docs)
        # burstiness: adaptation should beat the prior for real tokens
        if db[tok] > 0:
            assert r["boost"] == (db[tok] * n_docs) / (
                float(d1[tok]) * d2[tok])


def test_fightin_words_matches_python(spark, sf_dir):
    toks_by_src = Counter()
    counts = defaultdict(lambda: [0, 0])
    per_src = defaultdict(Counter)
    for r in _docs(spark, sf_dir):
        ws = r["text"].split(" ")
        toks_by_src[r["source"]] += len(ws)
        per_src[r["source"]].update(ws)
    top2 = sorted(toks_by_src, key=lambda s: (-toks_by_src[s], s))[:2]
    src1, src2 = top2
    n1, n2 = toks_by_src[src1], toks_by_src[src2]
    vocab = set(per_src[src1]) | set(per_src[src2])
    a0 = 100
    scored = {}
    for tok in vocab:
        y1, y2 = per_src[src1][tok], per_src[src2][tok]
        if y1 + y2 < 10:
            continue
        aw = float(a0) * (y1 + y2) / (n1 + n2)
        t1 = round(math.log((y1 + aw) / (n1 + a0 - y1 - aw)), 9)
        t2 = round(math.log((y2 + aw) / (n2 + a0 - y2 - aw)), 9)
        var = 1 / (y1 + aw) + 1 / (y2 + aw)
        scored[tok] = (t1 - t2, (t1 - t2) / math.sqrt(var), y1, y2)
    top = sorted(scored, key=lambda tk: (-abs(scored[tk][1]), tk))[:20]
    rows = {r["tok"]: r for r in
            QUERIES["text_fightin_words"](spark, sf_dir).collect()}
    assert set(rows) == set(top)
    for tok in top:
        delta, z, y1, y2 = scored[tok]
        r = rows[tok]
        assert (r["src1"], r["src2"]) == (src1, src2)
        assert (r["y1"], r["y2"]) == (y1, y2)
        assert r["delta_lor"] == delta
        assert r["z_score"] == z
