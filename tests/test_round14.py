"""Hand-recomputed references for the round-14 wave: the unigram-LM
tokenizer fit/apply (Viterbi hard-EM, Kudo 2018 style). The pin
recomputes the ENTIRE fit — seed substring counts, two rounds of
per-word lattice DP with the exact round-9 log-prob fencing and
(score DESC, seg ASC) tie-break, usage counts, char-epsilon fallback —
in plain python dicts from the raw parquet, then compares the engine
rows. An independent-textbook recompute, not the engine's own lineage
(the r13 Dickey-Fuller lesson: both engines can share the same wrong
formula; a third implementation can't)."""

import math
from collections import Counter

from arangodb_java_parquet_spark.queries.common import QUERIES, t

MAX_WLEN, MAX_PLEN, EM_ROUNDS, TOPK = 12, 4, 2, 50


def _r9(x):
    # mirror round-half-up at 1e-9 the way both engines agree on these
    # magnitudes: python round() is banker's, but ln ratios here are
    # never exactly at a half-way point at 9 digits, so round() matches.
    return round(x, 9)


def _word_freqs(spark, sf_dir, with_lang=False):
    d = t(spark, sf_dir, "documents")
    rows = d.select("lang", "text").collect()
    wf = Counter()
    for r in rows:
        for w in r["text"].split(" "):
            if 1 <= len(w) <= MAX_WLEN:
                wf[(r["lang"], w) if with_lang else w] += 1
    return wf


def _fit_python(spark, sf_dir):
    wf = _word_freqs(spark, sf_dir)
    # seed counts
    c0 = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, MAX_PLEN + 1):
                if i + l <= len(w):
                    c0[w[i:i + l]] += f
    tot0 = sum(c0.values())
    lp = {s: _r9(math.log(c / tot0)) for s, c in c0.items()}
    best = None
    for _ in range(EM_ROUNDS):
        best = {}
        for w in wf:
            # dp[i] = (neg score handled via max on (score, then seg
            # ASC -> use min on seg for ties))
            dp = {0: (0.0, "")}
            for i in range(1, len(w) + 1):
                cands = []
                for l in range(1, min(MAX_PLEN, i) + 1):
                    if i - l in dp:
                        piece = w[i - l:i]
                        if piece in lp:
                            ps, pseg = dp[i - l]
                            seg = piece if pseg == "" else pseg + "|" + piece
                            cands.append((ps + lp[piece], seg))
                if cands:
                    # score DESC, seg ASC
                    dp[i] = min(cands, key=lambda t: (-t[0], t[1]))
            best[w] = dp[len(w)][1]
        c = Counter()
        for w, f in wf.items():
            for piece in best[w].split("|"):
                c[piece] += f
        tot = sum(c.values())
        lp = {s: _r9(math.log(cnt / tot)) for s, cnt in c.items()}
        for s in {p for p in lp} | {ch for w in wf for ch in w}:
            if len(s) == 1 and s not in c:
                lp[s] = _r9(math.log(0.5 / tot))
    return wf, best, c, tot


def test_unigram_lm_fit_matches_python(spark, sf_dir):
    _, _, c, tot = _fit_python(spark, sf_dir)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK]
    rows = QUERIES["unigram_lm_fit"](spark, sf_dir).collect()
    got = sorted(((r["piece"], r["cnt"]) for r in rows),
                 key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    by_piece = {r["piece"]: r["logp"] for r in rows}
    for s, cnt in want:
        assert by_piece[s] == _r9(math.log(cnt / tot))


def test_unigram_lm_fertility_matches_python(spark, sf_dir):
    wf, best, _, _ = _fit_python(spark, sf_dir)
    wfl = _word_freqs(spark, sf_dir, with_lang=True)
    agg = {}
    for (lang, w), f in wfl.items():
        np = len(best[w].split("|"))
        tkn, pcs, chs = agg.get(lang, (0, 0, 0))
        agg[lang] = (tkn + f, pcs + f * np, chs + f * len(w))
    rows = QUERIES["unigram_lm_fertility"](spark, sf_dir).collect()
    assert len(rows) == len(agg)
    for r in rows:
        tkn, pcs, chs = agg[r["lang"]]
        assert (r["n_tokens"], r["n_pieces"], r["n_chars"]) == \
            (tkn, pcs, chs)
        assert r["fertility"] == pcs / tkn
        assert r["chars_per_piece"] == chs / pcs
    # sanity: a unigram LM with multi-char pieces must beat char-level
    # tokenization (fertility < chars per token) and stay >= 1
    for r in rows:
        assert 1.0 <= r["fertility"] < r["n_chars"] / r["n_tokens"]
