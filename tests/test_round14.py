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


def test_wordpiece_greedy_matches_python(spark, sf_dir):
    """Independent greedy leftmost-longest recompute: vocabulary from
    the 1/300 substring-mass threshold (plus single chars), then the
    walk, then per-lang fertility."""
    wf = _word_freqs(spark, sf_dir)
    c0 = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, MAX_PLEN + 1):
                if i + l <= len(w):
                    c0[w[i:i + l]] += f
    tot = sum(c0.values())
    vocab = {s for s, c in c0.items() if c * 300 >= tot or len(s) == 1}

    def np_of(w):
        pos, k = 0, 0
        while pos < len(w):
            l = max(l for l in range(1, min(MAX_PLEN, len(w) - pos) + 1)
                    if w[pos:pos + l] in vocab)
            pos += l
            k += 1
        return k

    wfl = _word_freqs(spark, sf_dir, with_lang=True)
    agg = {}
    for (lang, w), f in wfl.items():
        np = np_of(w)
        tkn, pcs, chs = agg.get(lang, (0, 0, 0))
        agg[lang] = (tkn + f, pcs + f * np, chs + f * len(w))
    rows = QUERIES["wordpiece_greedy_fertility"](spark, sf_dir).collect()
    assert len(rows) == len(agg)
    for r in rows:
        tkn, pcs, chs = agg[r["lang"]]
        assert (r["n_tokens"], r["n_pieces"], r["n_chars"]) == \
            (tkn, pcs, chs)
        assert r["fertility"] == pcs / tkn


def test_gmm_em_matches_python(spark, sf_dir):
    """Independent diagonal-GMM EM recompute (tertile-median init,
    max-shift softmax, 2 rounds) in plain python floats, mirroring the
    exact round-9 fencing."""
    rows = (t(spark, sf_dir, "embeddings")
            .selectExpr("vec_id AS id",
                        "CAST(embedding[0] AS DOUBLE) AS x1",
                        "CAST(embedding[1] AS DOUBLE) AS x2").collect())
    pts = [(r["id"], _r9(r["x1"]), _r9(r["x2"])) for r in rows]
    n = len(pts)
    import math as m

    def dsum9(vals):  # exact decimal sum at scale 9, like the engines
        from decimal import Decimal
        tot = sum(Decimal(f"{v:.9f}") for v in vals)
        return float(tot)

    s1 = [dsum9([p[d] for p in pts]) for d in (1, 2)]
    s2 = [dsum9([_r9(p[d] * p[d]) for p in pts]) for d in (1, 2)]
    gv = [_r9(s2[i] / n - (s1[i] / n) * (s1[i] / n)) + 0.0
          for i in (0, 1)]
    order = sorted(pts, key=lambda p: (p[1], p[0]))
    comp = []
    for j in range(3):
        seed = order[((2 * j + 1) * n) // 6]  # rank is 1-based in SQL
        comp.append([1.0 / 3, seed[1], seed[2], gv[0], gv[1]])
    two_pi = 2 * m.pi
    for _ in range(2):
        qs = {}
        for (i, x1, x2) in pts:
            row = []
            for j, (w, m1, m2, v1, v2) in enumerate(comp):
                q = _r9(m.log(w)
                        - 0.5 * _r9(m.log(two_pi * v1))
                        - 0.5 * _r9(m.log(two_pi * v2))
                        - 0.5 * ((x1 - m1) * (x1 - m1) / v1
                                 + (x2 - m2) * (x2 - m2) / v2))
                row.append(q)
            mx = max(row)
            es = [_r9(m.exp(q - mx)) for q in row]
            se = dsum9(es)
            qs[i] = [_r9(e / se) for e in es]
        new = []
        for j in range(3):
            rs = [(qs[i][j], x1, x2) for (i, x1, x2) in pts]
            sr = dsum9([r for r, _, _ in rs])
            srx1 = dsum9([_r9(r * x1) for r, x1, _ in rs])
            srx2 = dsum9([_r9(r * x2) for r, _, x2 in rs])
            srxx1 = dsum9([_r9(r * _r9(x1 * x1)) for r, x1, _ in rs])
            srxx2 = dsum9([_r9(r * _r9(x2 * x2)) for r, _, x2 in rs])
            new.append([sr / n, srx1 / sr, srx2 / sr,
                        _r9(srxx1 / sr - (srx1 / sr) * (srx1 / sr)) + 0.0,
                        _r9(srxx2 / sr - (srx2 / sr) * (srx2 / sr)) + 0.0])
        comp = new
    got = {r["component"]: r for r in
           QUERIES["gmm_em_diag_2d"](spark, sf_dir).collect()}
    assert len(got) == 3
    for j, (w, m1, m2, v1, v2) in enumerate(comp):
        r = got[j]
        assert r["weight"] == w
        assert r["m1"] == _r9(m1) + 0.0 and r["m2"] == _r9(m2) + 0.0
        assert r["v1"] == v1 and r["v2"] == v2
    # weights form a distribution; variances are positive
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-9
    assert all(r["v1"] > 0 and r["v2"] > 0 for r in got.values())


def _emb_pts(spark, sf_dir, dims=2):
    rows = (t(spark, sf_dir, "embeddings")
            .selectExpr("vec_id AS id", "embedding").collect())
    return [(r["id"], [float(v) for v in r["embedding"]]) for r in rows]


def test_dbscan_matches_python(spark, sf_dir):
    """Independent DBSCAN recompute: naive O(n^2) neighbor counting
    (no grid), textbook core/border/noise, BFS components — a
    different algorithmic route than the engine's grid-bucketed join +
    min-label propagation."""
    pts = [(i, _r9(v[0]), _r9(v[1])) for i, v in _emb_pts(spark, sf_dir)]
    eps2 = 1.0 / (32 * 32)
    nbrs = {i: set() for i, _, _ in pts}
    for (i, x1, x2) in pts:
        for (j, y1, y2) in pts:
            if i != j and (x1 - y1) * (x1 - y1) + (x2 - y2) * (x2 - y2) \
                    <= eps2:
                nbrs[i].add(j)
    core = {i for i in nbrs if 1 + len(nbrs[i]) >= 5}
    # BFS components over core-core edges
    comp = {}
    for s in sorted(core):
        if s in comp:
            continue
        stack, seen = [s], {s}
        while stack:
            u = stack.pop()
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        lbl = min(seen)
        for u in seen:
            comp[u] = lbl
    border = {}
    for i in nbrs:
        if i in core:
            continue
        cn = [comp[j] for j in nbrs[i] if j in core]
        if cn:
            border[i] = min(cn)
    want = {}
    for i, lbl in comp.items():
        sz, nc, nb = want.get(lbl, (0, 0, 0))
        want[lbl] = (sz + 1, nc + 1, nb)
    for i, lbl in border.items():
        sz, nc, nb = want.get(lbl, (0, 0, 0))
        want[lbl] = (sz + 1, nc, nb + 1)
    noise = len(pts) - len(comp) - len(border)
    rows = QUERIES["cluster_dbscan_grid"](spark, sf_dir).collect()
    got = {r["cluster_id"]: (r["size"], r["n_core"], r["n_border"])
           for r in rows}
    assert got.pop(-1) == (noise, 0, 0)
    assert got == want


def test_facility_location_matches_python(spark, sf_dir):
    """Independent greedy facility-location recompute with exact
    decimal accumulation of the round-9 marginals."""
    from decimal import Decimal
    pts = _emb_pts(spark, sf_dir)
    import math as m

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    nrm = {i: m.sqrt(dot(v, v)) for i, v in pts}
    vec = dict(pts)
    cand = sorted(i for i, _ in pts if i < 30)
    sims = {(c, i): _r9(dot(vec[c], vec[i]) / (nrm[c] * nrm[i]))
            for c in cand for i in vec}
    cov = {i: 0.0 for i in vec}
    chosen = []
    engine = sorted(QUERIES["coreset_facility_location"](
        spark, sf_dir).collect(), key=lambda r: r["step"])
    for step in range(1, 6):
        best = None
        for c in cand:
            if c in chosen:
                continue
            g = sum(Decimal(f"{max(_r9(max(sims[(c, i)] - cov[i], 0.0)), 0.0):.9f}")
                    for i in vec)
            g = float(g)
            if best is None or (-g, c) < (-best[1], best[0]):
                best = (c, g)
        c, g = best
        chosen.append(c)
        for i in vec:
            cov[i] = max(cov[i], sims[(c, i)])
        obj = float(sum(Decimal(f"{cov[i]:.9f}") for i in vec))
        r = engine[step - 1]
        assert (r["selected_id"], r["step"]) == (c, step)
        assert r["gain"] == g
        assert r["objective"] == obj
    # submodularity: marginal gains must be non-increasing
    gains = [r["gain"] for r in engine]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def _daily_counts(spark, sf_dir):
    rows = (t(spark, sf_dir, "orders")
            .selectExpr("CAST(o_orderdate AS DATE) AS day")
            .groupBy("day").count().orderBy("day").collect())
    return [int(r["count"]) for r in rows]


def test_isotonic_matches_stack_pava(spark, sf_dir):
    """The engine computes isotonic regression via the minimax identity;
    this pin runs the CLASSIC sequential pool-adjacent-violators stack
    algorithm — a genuinely different algorithmic route to the same
    unique L2 projection."""
    rows = (t(spark, sf_dir, "orders")
            .selectExpr("o_totalprice AS score",
                        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
                        " AS y", "o_orderkey").collect())
    rows.sort(key=lambda r: (r["score"], r["o_orderkey"]))
    n = len(rows)
    bins = {}
    for rk, r in enumerate(rows, 1):
        b = (rk - 1) * 100 // n
        cnt, pos = bins.get(b, (0, 0))
        bins[b] = (cnt + 1, pos + r["y"])
    # stack PAVA over (sum, weight) blocks
    blocks = []
    for b in sorted(bins):
        cnt, pos = bins[b]
        blocks.append([pos, cnt, [b]])
        while len(blocks) >= 2 and \
                blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]:
            s2, w2, l2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += w2
            blocks[-1][2] += l2
    want = {}
    for s, w, bl in blocks:
        for b in bl:
            want[b] = (s, w)
    got = QUERIES["eval_isotonic_calibration"](spark, sf_dir).collect()
    assert len(got) == 100
    for r in got:
        s, w = want[r["bin"]]
        assert r["iso_rate"] == s / w, (r["bin"], r["iso_rate"], s, w)
        cnt, pos = bins[r["bin"]]
        assert (r["n"], r["n_pos"]) == (cnt, pos)
    # fitted curve is monotone non-decreasing in bin order
    iso = [r["iso_rate"] for r in sorted(got, key=lambda r: r["bin"])]
    assert all(a <= b for a, b in zip(iso, iso[1:]))


def test_count_min_matches_python(spark, sf_dir):
    import hashlib
    d = t(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter(w for r in d for w in r["text"].split(" "))

    def col_of(tok, r):
        return int(hashlib.md5(f"{tok}:{r}".encode()).hexdigest()[:8],
                   16) % 64

    cells = Counter()
    for tok, c in cnt.items():
        for r in range(4):
            cells[(r, col_of(tok, r))] += c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {r["tok"]: r for r in
           QUERIES["agg_count_min_sketch"](spark, sf_dir).collect()}
    assert set(got) == {tok for tok, _ in top}
    for tok, c in top:
        est = min(cells[(r, col_of(tok, r))] for r in range(4))
        r = got[tok]
        assert (r["true_count"], r["cm_estimate"], r["overcount"]) == \
            (c, est, est - c)
        assert r["overcount"] >= 0  # CM never underestimates


def test_huber_irls_matches_python(spark, sf_dir):
    from decimal import Decimal

    def d6(vals):
        return float(sum(Decimal(f"{v:.6f}") for v in vals))

    def d9(vals):
        return float(sum(Decimal(f"{v:.9f}") for v in vals))

    ys = _daily_counts(spark, sf_dir)
    n = len(ys)
    pts = [(i + 1, y) for i, y in enumerate(ys)]
    w = {x: 1.0 for x, _ in pts}
    for _ in range(2):
        sw = d9([_r9(w[x]) for x, _ in pts])
        swx = d6([w[x] * x for x, _ in pts])
        swy = d6([w[x] * y for x, y in pts])
        swxx = d6([w[x] * x * x for x, _ in pts])
        swxy = d6([w[x] * x * y for x, y in pts])
        b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
        a = (swy - b * swx) / sw
        ar = sorted(abs(y - a - b * x) for x, y in pts)
        mad = ar[(n + 1) // 2 - 1] if n % 2 == 1 else \
            (ar[n // 2 - 1] + ar[n // 2]) / 2.0
        k = 19940970 * mad / 10000000.0
        w = {x: _r9(1.0 if abs(y - a - b * x) <= k
                    else k / abs(y - a - b * x)) for x, y in pts}
    r = QUERIES["regression_huber_irls"](spark, sf_dir).collect()[0]
    assert r["intercept"] == _r9(a)
    assert r["slope"] == _r9(b) + 0.0
    assert r["k_threshold"] == _r9(k)
    assert r["n_downweighted"] == sum(1 for v in w.values() if v < 1)


def test_ar2_yule_walker_matches_python(spark, sf_dir):
    from decimal import Decimal

    def d6(vals):
        return float(sum(Decimal(f"{v:.6f}") for v in vals))

    ys = _daily_counts(spark, sf_dir)
    n = len(ys)
    mean = sum(ys) / n
    d = [y - mean for y in ys]
    den = d6([x * x for x in d])
    num1 = d6([d[i] * d[i + 1] for i in range(n - 1)])
    num2 = d6([d[i] * d[i + 2] for i in range(n - 2)])
    r1, r2 = num1 / den, num2 / den
    dn = 1 - r1 * r1
    phi1 = r1 * (1 - r2) / dn
    phi2 = (r2 - r1 * r1) / dn
    sigma2 = (den / n) * (1 - phi1 * r1 - phi2 * r2)
    fc = mean + phi1 * d[-1] + phi2 * d[-2]
    r = QUERIES["forecast_ar2_yule_walker"](spark, sf_dir).collect()[0]
    assert r["n_days"] == n
    assert r["r1"] == _r9(r1) + 0.0 and r["r2"] == _r9(r2) + 0.0
    assert r["phi1"] == _r9(phi1) + 0.0 and r["phi2"] == _r9(phi2) + 0.0
    assert r["sigma2"] == _r9(sigma2) + 0.0
    assert r["forecast_next"] == _r9(fc)
    # stationarity sanity for a fitted AR(2): |r1|, |r2| <= 1, sigma2 >= 0
    assert abs(r1) <= 1 and abs(r2) <= 1 and r["sigma2"] >= 0


def test_croston_matches_python(spark, sf_dir):
    rows = (t(spark, sf_dir, "events")
            .filter("event_type = 'error'")
            .selectExpr("CAST(ts AS DATE) AS day", "value", "event_id")
            .collect())
    n = len(rows)
    srt = sorted(rows, key=lambda r: (r["value"], r["event_id"]))
    thr = srt[(n * 99 + 99) // 100 - 1]["value"]
    days = sorted(Counter(r["day"] for r in rows
                          if r["value"] >= thr).items())
    assert 1 < len(days) < n / 10  # genuinely intermittent, nontrivial
    z, p = float(days[0][1]), 1.0
    prev = days[0][0]
    for day, d in days[1:]:
        q = (day - prev).days
        z = z + (d - z) / 4
        p = p + (q - p) / 4
        prev = day
    r = QUERIES["forecast_croston"](spark, sf_dir).collect()[0]
    assert r["n_demand_days"] == len(days)
    assert r["z_size"] == _r9(z)
    assert r["p_interval"] == _r9(p)
    assert r["forecast_per_day"] == _r9(z / p)
