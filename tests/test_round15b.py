"""Round-15 continuation pins (SQ8 scalar quantization + later wave).

Each entry gets an INDEPENDENT plain-python recompute (the r13
Dickey-Fuller lesson: both engines can share the same wrong formula; a
third implementation can't) plus the family-level contract property —
for SQ8, recall@5 of the quantized ranking against the exact
squared-L2 ranking.
"""

import pytest

from arangodb_java_parquet_spark.queries.common import QUERIES, t

SF = "/root/testdata/sf0.001"

_NBINS = 256
_DIMS = 64


def _load_vectors(spark):
    rows = (t(spark, SF, "embeddings")
            .select("vec_id", "embedding").collect())
    return {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in rows}


def _python_sq8(vecs):
    """Range fit + codes + midpoint reconstruction, pure python doubles
    (same correctly-rounded double ops as both engines)."""
    ids = sorted(vecs)
    mns = [min(vecs[v][i] for v in ids) for i in range(_DIMS)]
    mxs = [max(vecs[v][i] for v in ids) for i in range(_DIMS)]
    codes, recon = {}, {}
    for v in ids:
        cs, rs = [], []
        for i in range(_DIMS):
            mn, mx = mns[i], mxs[i]
            if mx == mn:
                c = 0
            else:
                import math
                c = min(_NBINS - 1,
                        int(math.floor(((vecs[v][i] - mn) / (mx - mn))
                                       * _NBINS)))
            cs.append(c)
            rs.append(mn + (((c + 0.5) * (mx - mn)) / _NBINS))
        codes[v] = cs
        recon[v] = rs
    return codes, recon


def _l2_9(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return round(acc, 9)


def test_sq8_encode_matches_python_recompute(spark):
    vecs = _load_vectors(spark)
    codes, _ = _python_sq8(vecs)
    got = {r["vec_id"]: r["sq_code"]
           for r in QUERIES["sim_sq8_encode"](spark, SF).collect()}
    assert set(got) == set(codes)
    for v, cs in codes.items():
        assert got[v] == "-".join(str(c) for c in cs), v


def test_sq8_topk_matches_python_recompute(spark):
    vecs = _load_vectors(spark)
    _, recon = _python_sq8(vecs)
    qids = [v for v in vecs if v < 5]
    expect = {}
    for q in qids:
        scored = sorted(
            ((_l2_9(vecs[q], recon[v]), v) for v in vecs if v != q))
        expect[q] = [(v, d, rn + 1)
                     for rn, (d, v) in enumerate(scored[:5])]
    rows = QUERIES["sim_topk_sq8"](spark, SF).collect()
    got = {}
    for r in rows:
        got.setdefault(r["qid"], []).append(
            (r["vid"], r["sq_dist"], r["rn"]))
    for q in got:
        got[q].sort(key=lambda p: p[2])
    assert got == expect


def _python_lz78_phrases(tokens):
    """Classic LZ78 incremental parse: number of emitted phrases plus
    the trailing partial phrase."""
    dic = set()
    w = ()
    n = 0
    for c in tokens:
        cand = w + (c,)
        if cand in dic:
            w = cand
        else:
            dic.add(cand)
            n += 1
            w = ()
    return n + (1 if w else 0)


def test_lz78_matches_python_recompute(spark):
    docs = (t(spark, SF, "documents")
            .select("source", "text").collect())
    import math
    agg = {}
    for r in docs:
        toks = r["text"].split(" ")
        p = _python_lz78_phrases(toks)
        a = agg.setdefault(r["source"], [0, 0, 0, 0.0])
        a[0] += 1
        a[1] += p
        a[2] += len(toks)
        a[3] = round(a[3] + round(math.log(p / len(toks)), 9), 9)
    rows = QUERIES["quality_lz78_compression"](spark, SF).collect()
    assert {r["source"] for r in rows} == set(agg)
    for r in rows:
        n, sp, st, slog = agg[r["source"]]
        assert (r["n_docs"], r["sum_phrases"], r["sum_tokens"]) == \
            (n, sp, st), r["source"]
        assert r["phrase_rate"] == sp / st
        assert abs(r["avg_log_ratio"] - slog / n) < 1e-12, r["source"]


def _python_journeys(spark):
    """Per converting user: the set of distinct non-purchase channels
    touched strictly before the first purchase."""
    rows = (t(spark, SF, "events")
            .select("user_id", "ts", "event_id", "event_type").collect())
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    journeys = []
    for u, evs in by_user.items():
        evs.sort()
        fp = next(((ts, eid) for ts, eid, et in evs
                   if et == "purchase"), None)
        if fp is None:
            continue
        touched = {et for ts, eid, et in evs
                   if et != "purchase" and (ts, eid) < fp}
        if touched:
            journeys.append(frozenset(touched))
    return journeys


def test_shapley_matches_closed_form(spark):
    """The engine computes the FULL coalition enumeration; for the
    additive v(S) = #journeys with set ⊆ S, the Shapley value equals
    the independent closed form sum_{R ∋ i} C(R)/|R| — plus the
    efficiency axiom sum_i phi_i = #nonempty converting journeys."""
    journeys = _python_journeys(spark)
    channels = sorted({c for j in journeys for c in j})
    phi = {c: 0.0 for c in channels}
    touched = {c: 0 for c in channels}
    for j in journeys:
        for c in j:
            phi[c] += 1.0 / len(j)
            touched[c] += 1
    rows = QUERIES["attribution_shapley"](spark, SF).collect()
    assert sorted(r["channel"] for r in rows) == channels
    for r in rows:
        assert r["n_journeys"] == touched[r["channel"]], r["channel"]
        assert abs(r["shapley_phi"] - phi[r["channel"]]) < 1e-9, \
            r["channel"]
    assert abs(sum(r["shapley_phi"] for r in rows)
               - len(journeys)) < 1e-9


def test_viterbi_matches_python_recompute(spark):
    """Independent Viterbi DP in plain python: same round-9 log
    constants, same lower-median binarization, same tie-break; paths
    and log-likelihoods must match row-for-row."""
    import math
    rnd = lambda p, q: round(math.log(p / q), 9)
    pi = (rnd(1, 2), rnd(1, 2))
    A = ((rnd(4, 5), rnd(1, 5)), (rnd(2, 5), rnd(3, 5)))
    Bh = (rnd(7, 10), rnd(2, 10))
    Bl = (rnd(3, 10), rnd(8, 10))
    rows = (t(spark, SF, "events").filter("user_id < 200")
            .select("user_id", "ts", "event_id", "value").collect())
    seq = sorted((r["value"], r["event_id"]) for r in rows)
    med = seq[(len(seq) + 1) // 2 - 1][0]
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], 1.0 if r["value"] > med else 0.0))
    expect = {}
    for u, evs in by_user.items():
        os_ = [o for _, _, o in sorted(evs)]
        e = lambda j, o: (o * Bh[j] + (1 - o) * Bl[j])
        d = [pi[0] + e(0, os_[0]), pi[1] + e(1, os_[0])]
        bps = []
        for o in os_[1:]:
            c = [[d[i] + A[i][j] for i in range(2)] for j in range(2)]
            bps.append([0 if c[j][0] >= c[j][1] else 1
                        for j in range(2)])
            d = [max(c[j]) + e(j, o) for j in range(2)]
        s = 0 if d[0] >= d[1] else 1
        path = [s]
        for bp in reversed(bps):
            s = bp[s]
            path.append(s)
        expect[u] = ("".join(str(x) for x in reversed(path)), max(d))
    got = {r["user_id"]: (r["state_path"], r["loglik"])
           for r in QUERIES["hmm_viterbi_decode"](spark, SF).collect()}
    assert set(got) == set(expect)
    for u in got:
        assert got[u][0] == expect[u][0], u
        assert abs(got[u][1] - expect[u][1]) < 1e-12, u


def test_temperature_scaling_matches_python_recompute(spark):
    """Independent Newton trajectory in plain python: same median
    selection, round-9 logits, round-9 sigmoid, decimal-exact sums
    (emulated with integer nano-units); NLL must be non-increasing."""
    import math
    rows = (t(spark, SF, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .collect())
    seq = sorted((r["o_totalprice"], r["o_orderkey"]) for r in rows)
    med = seq[(len(seq) + 1) // 2 - 1][0]
    data = [(1 if r["o_orderstatus"] == "F" else 0,
             round(math.log(r["o_totalprice"] / med), 9))
            for r in rows]

    def nano_sum(vals):  # exact decimal(…,9) sum
        return sum(int(round(v * 1e9)) for v in vals) / 1e9

    def nll(s):
        return nano_sum(
            round(math.log(1 + round(math.exp(s * z), 9))
                  - y * (s * z), 9) for y, z in data)

    s = 1.0
    traj = [(0, s, 1 / s, nll(s))]
    for r in range(1, 5):
        g = nano_sum(
            round(z * (round(1 / (1 + math.exp(-(s * z))), 9) - y), 9)
            for y, z in data)
        h = nano_sum(
            round((z * z) * (round(1 / (1 + math.exp(-(s * z))), 9)
                             * (1 - round(1 / (1 + math.exp(-(s * z))),
                                          9))), 9)
            for y, z in data)
        s = s - g / h
        traj.append((r, s, 1 / s, nll(s)))
    got = [(r["rnd"], r["scale_s"], r["temperature"], r["nll"])
           for r in QUERIES["eval_temperature_scaling"](
               spark, SF).collect()]
    assert len(got) == 5
    for (er, es, et, en), (gr, gs, gt, gn) in zip(traj, got):
        assert er == gr
        assert abs(es - gs) < 1e-9 and abs(et - gt) < 1e-9, er
        assert abs(en - gn) < 1e-6, er
    nlls = [r[3] for r in got]
    assert all(nlls[i + 1] <= nlls[i] + 1e-9 for i in range(4)), nlls


def test_sinkhorn_matches_python_recompute(spark):
    """Independent Sinkhorn in plain python: same binning, same
    round-9 Gibbs kernel, same left-to-right folds, 25 rounds; cost
    and column-marginal error must match to the last ulps, cost must
    be nonnegative and marginal error tiny after 25 rounds."""
    import math
    B, R = 8, 25
    docs = (t(spark, SF, "documents")
            .select("source", "n_chars").collect())
    cnt = {}
    for r in docs:
        b = min(B - 1, r["n_chars"] // 32)
        cnt[(r["source"], b)] = cnt.get((r["source"], b), 0) + 1
    sources = sorted({s for s, _ in cnt})
    nall = len(docs)
    a = [sum(cnt.get((s, j), 0) for s in sources) / nall
         for j in range(B)]
    K = [round(math.exp(-1.0 * abs(i - j)), 9)
         for i in range(B) for j in range(B)]

    def lsum(vals):
        acc = 0.0
        for v in vals:
            acc += v
        return acc

    got = {r["source"]: r for r in QUERIES["ot_sinkhorn_distance"](
        spark, SF).collect()}
    assert sorted(got) == sources
    for s in sources:
        n = sum(cnt.get((s, j), 0) for j in range(B))
        b_ = [cnt.get((s, j), 0) / n for j in range(B)]
        u, v = [1.0] * B, [1.0] * B
        for _ in range(R):
            vn = [b_[j] / lsum(K[i * B + j] * u[i] for i in range(B))
                  for j in range(B)]
            un = [a[i] / lsum(K[i * B + j] * vn[j] for j in range(B))
                  for i in range(B)]
            u, v = un, vn
        cost = lsum(u[(x - 1) // B] * K[x - 1] * v[(x - 1) % B]
                    * float(abs((x - 1) // B - (x - 1) % B))
                    for x in range(1, B * B + 1))
        merr = lsum(abs(v[j] * lsum(K[i * B + j] * u[i]
                                    for i in range(B)) - b_[j])
                    for j in range(B))
        r = got[s]
        assert r["n_docs"] == n, s
        assert abs(r["ot_cost"] - cost) < 1e-12, s
        assert abs(r["col_marg_err"] - merr) < 1e-12, s
        assert r["ot_cost"] >= 0 and r["col_marg_err"] < 0.01, s


def test_ucb1_replay_matches_python_recompute(spark):
    """Independent UCB1 replay in plain python: same arm indexing,
    same lower-median rewards, same unplayed-first / lowest-index-
    argmax policy; per-user matched counts, pulls, rewards and CTR
    must match row-for-row. (This pin is what caught the DuckDB 1.0
    list_reduce `ELSE acc` corruption — see queries/bandit.py.)"""
    import math
    rows = (t(spark, SF, "events").filter("user_id < 150")
            .select("user_id", "ts", "event_id", "event_type", "value")
            .collect())
    seq = sorted((r["value"], r["event_id"]) for r in rows)
    med = seq[(len(seq) + 1) // 2 - 1][0]
    arms = sorted({r["event_type"] for r in rows})
    ai = {a: i + 1 for i, a in enumerate(arms)}
    k = len(arms)
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], ai[r["event_type"]],
             1.0 if r["value"] > med else 0.0))
    expect = {}
    for u, evs in by_user.items():
        st = [(a, rw) for _, _, a, rw in sorted(evs)]
        matched, trew = 0, 0.0
        n, s = [0.0] * k, [0.0] * k
        for a, rw in st:
            mzv = min([z + 1 for z in range(k) if n[z] == 0] or [99])
            if mzv < 90:
                chosen = mzv
            else:
                sl = [s[z] / n[z]
                      + math.sqrt(2 * round(math.log(matched + 1), 9)
                                  / n[z]) for z in range(k)]
                mx = max(sl)
                chosen = min(z + 1 for z in range(k) if sl[z] == mx)
            if chosen == a:
                matched += 1
                trew += rw
                n[a - 1] += 1
                s[a - 1] += rw
        expect[u] = (len(st), matched, int(trew),
                     "-".join(str(int(x)) for x in n),
                     trew / matched if matched else None)
    got = {r["user_id"]: (r["n_events"], r["n_matched"],
                          r["total_reward"], r["arm_pulls"],
                          r["replay_ctr"])
           for r in QUERIES["bandit_ucb1_replay"](spark, SF).collect()}
    assert set(got) == set(expect)
    for u in got:
        assert got[u][:4] == expect[u][:4], u
        if expect[u][4] is None:
            assert got[u][4] is None, u
        else:
            assert abs(got[u][4] - expect[u][4]) < 1e-12, u


def _python_jw(s, t):
    """Canonical Jaro-Winkler (unconditional prefix bonus, p=0.1)."""
    ls, lt = len(s), len(t)
    w = max(max(ls, lt) // 2 - 1, 0)
    used = [False] * lt
    ms = []
    for i in range(ls):
        lo, hi = max(0, i - w), min(lt - 1, i + w)
        for j in range(lo, hi + 1):
            if not used[j] and t[j] == s[i]:
                used[j] = True
                ms.append(s[i])
                break
    mt = [t[j] for j in range(lt) if used[j]]
    m = len(ms)
    if m == 0:
        return 0.0, 0, 0, 0
    tr = sum(1 for a, b in zip(ms, mt) if a != b)
    jaro = (m / ls + m / lt + (m - tr / 2.0) / m) / 3
    pl = 0
    for a, b in zip(s[:4], t[:4]):
        if a != b:
            break
        pl += 1
    return jaro + pl * 0.1 * (1 - jaro), m, tr, pl


def test_jaro_winkler_matches_python_recompute(spark):
    parts = (t(spark, SF, "part")
             .select("p_partkey", "p_name", "p_brand", "p_size")
             .collect())
    blocks = {}
    for r in parts:
        blocks.setdefault((r["p_brand"], r["p_size"]), []).append(
            (r["p_partkey"], r["p_name"]))
    scored = []
    for _, rows in blocks.items():
        rows.sort()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                k1, s = rows[i]
                k2, tt = rows[j]
                jw, m, tr, pl = _python_jw(s, tt)
                scored.append((-jw, k1, k2, s, tt, m, tr, pl))
    scored.sort()
    expect = [(k1, k2, s, tt, m, tr, pl, -njw, rn + 1)
              for rn, (njw, k1, k2, s, tt, m, tr, pl)
              in enumerate(scored[:25])]
    got = sorted(
        ((r["k1"], r["k2"], r["name1"], r["name2"], r["m"], r["tr"],
          r["prefix_len"], r["jw"], r["rn"])
         for r in QUERIES["dedup_jaro_winkler"](spark, SF).collect()),
        key=lambda x: x[8])
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:7] == e[:7], (g, e)
        assert abs(g[7] - e[7]) < 1e-12
    # sanity: output is ranked by descending JW
    jws = [g[7] for g in got]
    assert jws == sorted(jws, reverse=True)


def test_did_matches_python_recompute(spark):
    """Independent DiD in plain python: same treatment rule, same
    rank-selected cutoff, exact integer moments; estimate, SE and
    t-ratio must match; the DiD identity (difference of cell-mean
    differences) must hold exactly."""
    import math
    orders = (t(spark, SF, "orders")
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_totalprice").collect())
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in t(spark, SF, "customer").collect()}
    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in t(spark, SF, "nation").collect()}
    base = [(r["o_orderkey"], r["o_orderdate"],
             int(math.floor(r["o_totalprice"])),
             1 if nat[cust[r["o_custkey"]]] % 2 == 0 else 0)
            for r in orders]
    seq = sorted((d, k) for k, d, _, _ in base)
    cutoff = seq[(len(seq) + 1) // 2 - 1][0]
    cells = {}
    for k, d, y, tr in base:
        g = ("t" if tr else "c") + ("1" if d > cutoff else "0")
        n, s1, s2 = cells.get(g, (0, 0, 0))
        cells[g] = (n + 1, s1 + y, s2 + y * y)
    m, v = {}, {}
    for g, (n, s1, s2) in cells.items():
        m[g] = s1 / n
        v[g] = (s2 - s1 / n * s1) / (n - 1) / n
    did = (m["t1"] - m["t0"]) - (m["c1"] - m["c0"])
    se = math.sqrt(v["t1"] + v["t0"] + v["c1"] + v["c0"])
    r = QUERIES["causal_diff_in_diff"](spark, SF).collect()[0]
    for g in ("t1", "t0", "c1", "c0"):
        assert r[f"n_{g}"] == cells[g][0], g
        assert abs(r[f"m_{g}"] - m[g]) < 1e-9, g
    assert abs(r["did"] - did) < 1e-9
    assert abs(r["se"] - se) < 1e-9
    assert abs(r["t_stat"] - did / se) < 1e-9
    assert abs(r["did"] - ((r["m_t1"] - r["m_t0"])
                           - (r["m_c1"] - r["m_c0"]))) == 0.0


def test_misra_gries_matches_python_recompute(spark):
    """Independent MG(8) in plain python over the same per-source
    doc-ordered streams; counters must match row-for-row, the
    N/(k+1) undercount bound must hold, and every token with true
    frequency > N/(k+1) must survive in the summary."""
    K = 8
    docs = (t(spark, SF, "documents")
            .select("doc_id", "source", "text").collect())
    streams = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        streams.setdefault(r["source"], []).extend(
            r["text"].split(" "))
    expect = {}
    for src, stream in streams.items():
        ctr = {}
        for tok in stream:
            if tok in ctr:
                ctr[tok] += 1
            elif len(ctr) < K:
                ctr[tok] = 1
            else:
                ctr = {k: v - 1 for k, v in ctr.items() if v - 1 > 0}
        exact = {}
        for tok in stream:
            exact[tok] = exact.get(tok, 0) + 1
        n = len(stream)
        for tok, cnt in ctr.items():
            expect[(src, tok)] = (cnt, exact[tok], n, n / (K + 1))
        # completeness: heavy tokens must survive
        for tok, tc in exact.items():
            if tc > n / (K + 1):
                assert tok in ctr, (src, tok)
    rows = QUERIES["sketch_misra_gries"](spark, SF).collect()
    got = {(r["source"], r["token"]):
           (r["mg_count"], r["true_count"], r["n_tokens"],
            r["max_undercount"]) for r in rows}
    assert got == expect
    for (src, tok), (mg, tc, n, bound) in got.items():
        assert 0 <= tc - mg <= bound, (src, tok)


def test_competing_risks_matches_python_recompute(spark):
    """Independent Aalen-Johansen in plain python (same censoring,
    cause rule, round-9 ln/exp fences, nano-exact sums); plus the AJ
    identity CIF1(t) + CIF2(t) + S(t) ≈ 1 at every day."""
    import math
    rows = (t(spark, SF, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect())
    by_user = {}
    tmax = max(r["ts"] for r in rows)
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    US = 1_000_000
    lifes = []
    for u, evs in by_user.items():
        evs.sort()
        first, last = evs[0][0], evs[-1][0]
        dur = (int(last.timestamp() * US)
               - int(first.timestamp() * US)) // 86_400_000_000
        cens = 1 if (int(last.timestamp() * US)
                     >= int(tmax.timestamp() * US)
                     - 2 * 3600 * US) else 0
        cause = 1 if evs[-1][2] == "error" else 2
        lifes.append((dur, cens, cause))
    days = {}
    for dur, cens, cause in lifes:
        d1, d2, ended = days.get(dur, (0, 0, 0))
        days[dur] = (d1 + (1 if cens == 0 and cause == 1 else 0),
                     d2 + (1 if cens == 0 and cause == 2 else 0),
                     ended + 1)
    at_risk, cum = {}, 0
    for day in sorted(days, reverse=True):
        cum += days[day][2]
        at_risk[day] = cum
    lncum = 0  # nano-units
    zero = False
    c1 = c2 = 0  # nano-units
    expect = {}
    for day in sorted(days):
        d1, d2, _ = days[day]
        d = d1 + d2
        if d == 0:
            continue
        n = at_risk[day]
        sp = 0.0 if zero else round(math.exp(lncum / 1e9), 9)
        i1 = round(sp * (d1 / n), 9)
        i2 = round(sp * (d2 / n), 9)
        c1 += int(round(i1 * 1e9))
        c2 += int(round(i2 * 1e9))
        expect[day] = (d1, d2, n, sp, c1 / 1e9, c2 / 1e9)
        if d == n:
            zero = True
        else:
            lncum += int(round(round(math.log(1.0 - d / n), 9) * 1e9))
    got = {r["churn_day"]: (r["d_error"], r["d_other"],
                            r["n_at_risk"], r["s_prev"],
                            r["cif_error"], r["cif_other"])
           for r in QUERIES["survival_competing_risks"](
               spark, SF).collect()}
    assert set(got) == set(expect)
    for day in got:
        g, e = got[day], expect[day]
        assert g[:3] == e[:3], day
        for gi, ei in zip(g[3:], e[3:]):
            assert abs(gi - ei) < 1e-12, day
    # AJ identity: cif1 + cif2 + S(t) == 1 (within round-9 slack)
    last_day = max(got)
    # recompute S(last) including the last day's factor
    surv = 1.0
    for day in sorted(days):
        d1, d2, _ = days[day]
        d = d1 + d2
        if d == 0:
            continue
        surv *= (1.0 - d / at_risk[day])
    g = got[last_day]
    assert abs(g[4] + g[5] + surv - 1.0) < 1e-6


def test_knn_shapley_matches_python_recompute(spark):
    """Independent KNN-Shapley recurrence in plain python (backward
    recurrence, not the suffix-sum rewrite — a genuinely different
    formulation) plus the efficiency identity
    Σ_j s_j = (#correct among K nearest)/K."""
    K = 5
    vecs = _load_vectors(spark)
    labels = {r["vec_id"]: r["label"]
              for r in t(spark, SF, "embeddings")
              .select("vec_id", "label").collect()}
    qids = [v for v in vecs if v < 5]
    train = [v for v in vecs if v >= 5]
    got_rows = QUERIES["knn_shapley_valuation"](spark, SF).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["qid"], []).append(
            (r["rn"], r["vid"], r["pos"], r["ind"],
             r["shapley_value"]))
    for q in qids:
        order = sorted((_l2_9(vecs[q], vecs[v]), v) for v in train)
        inds = [1 if labels[v] == labels[q] else 0 for _, v in order]
        vids = [v for _, v in order]
        N = len(order)
        s = [0.0] * N
        s[N - 1] = inds[N - 1] / N
        nano = round(s[N - 1] * 1e9)  # emulate seed + decimal suffix
        svals = {vids[N - 1]: s[N - 1]}
        acc = 0
        for j in range(N - 2, -1, -1):
            tj = round(((inds[j] - inds[j + 1]) / K)
                       * (min(K, j + 1) / (j + 1)), 9)
            acc += int(round(tj * 1e9))
            svals[vids[j]] = inds[N - 1] / N + acc / 1e9
        # efficiency identity — up to accumulated round-9 noise on
        # the N per-term fences (observed ~1.5e-6 at N=195)
        total = sum(svals.values())
        topk_correct = sum(inds[:K]) / K
        assert abs(total - topk_correct) < 1e-5, q
        expect = sorted(((-svals[v], v) for v in vids))[:10]
        mine = [(rn, v, s_) for rn, v, _, _, s_ in sorted(got[q])]
        for (rn, v, s_), (negs, ev) in zip(mine, expect):
            assert v == ev, (q, rn)
            assert abs(s_ - (-negs)) < 1e-12, (q, rn)


def test_propensity_strata_matches_python_recompute(spark):
    """Independent subclassification in plain python: same cells,
    frequency propensities, rank-tiebroken NTILE, treated-weighted
    ATT with nano-exact term sums."""
    orders = (t(spark, SF, "orders")
              .select("o_custkey", "o_orderdate", "o_totalprice")
              .collect())
    cust = {r["c_custkey"]: (r["c_nationkey"], r["c_mktsegment"])
            for r in t(spark, SF, "customer").collect()}
    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in t(spark, SF, "nation").collect()}
    import math
    cells = {}
    for r in orders:
        nk, seg = cust[r["o_custkey"]]
        treat = 1 if nat[nk] % 2 == 0 else 0
        y = int(math.floor(r["o_totalprice"]))
        key = (r["o_orderdate"].month, seg)
        n, nt, syt, syc = cells.get(key, (0, 0, 0, 0))
        cells[key] = (n + 1, nt + treat,
                      syt + treat * y, syc + (1 - treat) * y)
    ordered = sorted(cells.items(),
                     key=lambda kv: (kv[1][1] / kv[1][0],
                                     kv[0][0], kv[0][1]))
    NS = 5
    n_cells = len(ordered)
    # NTILE semantics: first (n % NS) tiles get ceil(n/NS)
    sizes = [n_cells // NS + (1 if i < n_cells % NS else 0)
             for i in range(NS)]
    strata = {}
    idx = 0
    for s_i, sz in enumerate(sizes, start=1):
        for _ in range(sz):
            (key, (n, nt, syt, syc)) = ordered[idx]
            a = strata.setdefault(
                s_i, [0, 0, 0, 0, float("inf"), float("-inf")])
            a[0] += nt
            a[1] += n - nt
            a[2] += syt
            a[3] += syc
            a[4] = min(a[4], nt / n)
            a[5] = max(a[5], nt / n)
            idx += 1
    n_t_all = sum(a[0] for a in strata.values())
    acc = 0
    rows_exp = {}
    for s_i, a in sorted(strata.items()):
        m_t = a[2] / a[0] if a[0] else None
        m_c = a[3] / a[1] if a[1] else None
        diff = (m_t - m_c) if (m_t is not None and m_c is not None) \
            else None
        if diff is not None:
            acc += int(round(round((a[0] / n_t_all) * diff, 9) * 1e9))
        rows_exp[s_i] = (a[0], a[1], a[4], a[5], m_t, m_c, diff)
    att = acc / 1e9
    got = {r["stratum"]: r for r in
           QUERIES["causal_propensity_strata"](spark, SF).collect()}
    assert set(got) == set(rows_exp)
    for s_i, (nt, nc, pmin, pmax, m_t, m_c, diff) in rows_exp.items():
        r = got[s_i]
        assert (r["n_treat"], r["n_ctrl"]) == (nt, nc), s_i
        assert abs(r["phat_min"] - pmin) < 1e-12
        assert abs(r["phat_max"] - pmax) < 1e-12
        assert abs(r["m_treat"] - m_t) < 1e-9, s_i
        assert abs(r["m_ctrl"] - m_c) < 1e-9, s_i
        assert abs(r["diff"] - diff) < 1e-9, s_i
        assert abs(r["att"] - att) < 1e-9, s_i


def test_boruvka_matches_python_kruskal(spark):
    """Third-implementation pin: python Kruskal with path-compressed
    union-find (different from BOTH the engine's Borůvka and the
    oracle's relabeling fold) must agree on components, sizes, edge
    count and total weight; plus the forest invariant
    n_mst_edges = n_vertices − n_components."""
    vecs = _load_vectors(spark)
    verts = sorted(v for v in vecs if v < 300)
    def bucket(v):
        e = vecs[v]
        return ((8 if e[0] > 0 else 0) + (4 if e[1] > 0 else 0)
                + (2 if e[2] > 0 else 0) + (1 if e[3] > 0 else 0))
    edges = []
    by_b = {}
    for v in verts:
        by_b.setdefault(bucket(v), []).append(v)
    for vs in by_b.values():
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                edges.append((_l2_9(vecs[a], vecs[b]), a, b))
    edges.sort()
    parent = {v: v for v in verts}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    n_edges, nano = 0, 0
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            n_edges += 1
            nano += int(round(w * 1e9))
    comps = {}
    for v in verts:
        comps.setdefault(find(v), []).append(v)
    total_w = nano / 1e9
    rows = QUERIES["graph_mst_boruvka"](spark, SF).collect()
    got = {r["component"]: r for r in rows}
    assert set(got) == set(comps)
    for c, members in comps.items():
        r = got[c]
        assert r["n_vertices"] == len(members), c
        assert r["n_all_vertices"] == len(verts)
        assert r["n_components"] == len(comps)
        assert r["n_mst_edges"] == n_edges
        assert abs(r["total_mst_weight"] - total_w) < 1e-9
        assert r["n_mst_edges"] == r["n_all_vertices"] \
            - r["n_components"]


def test_sq8_recall_vs_exact_l2(spark):
    """Family contract: SQ8 (256 bins over the observed range) is a
    near-lossless quantizer — the quantized top-5 must recover almost
    all of the exact squared-L2 top-5."""
    vecs = _load_vectors(spark)
    _, recon = _python_sq8(vecs)
    qids = [v for v in vecs if v < 5]
    hits = total = 0
    for q in qids:
        exact = {v for _, v in sorted(
            ((_l2_9(vecs[q], vecs[v]), v) for v in vecs if v != q))[:5]}
        quant = {v for _, v in sorted(
            ((_l2_9(vecs[q], recon[v]), v) for v in vecs if v != q))[:5]}
        hits += len(exact & quant)
        total += 5
    assert hits / total >= 0.9, f"SQ8 recall@5 {hits}/{total}"
