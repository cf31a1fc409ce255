"""Round-15 pins.

NN-descent (Dong et al. 2011, queries/ann_graph.py): an INDEPENDENT
plain-python recompute of the entire deterministic construction —
bucket∪window init, capped reverse edges, local join, once-per-pair
scoring, top-k by round-9 cosine — compared row-for-row against the
engine graph (the r13 Dickey-Fuller lesson: both engines can share the
same wrong formula; a third implementation can't). Plus the two
contract properties VERDICT r14 #5 names: per-round recall is monotone
non-decreasing, and per-round scored-candidate counts stay within the
n·(2k)² bound.
"""

import math
from collections import defaultdict

import duckdb
import pytest

from arangodb_java_parquet_spark.queries.common import QUERIES, t
from arangodb_java_parquet_spark.queries.ann_graph import (
    _INIT_BITS, _INIT_W, _K, _NPROBE, _ROUNDS, _nnd_sql)

SF = "/root/testdata/sf0.001"


def _load_vectors(spark):
    rows = (t(spark, SF, "embeddings")
            .select("vec_id", "embedding").collect())
    return {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in rows}


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y  # left-to-right double fold, same as F.aggregate
    return acc


def _cos9(vecs, nrm, a, b):
    return round(_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b]), 9)


def _bucket(v):
    out = 0
    for i in range(_INIT_BITS):
        out = out * 2 + (1 if v[i] > 0 else 0)
    return out


def _topk(scored_by_q):
    out = {}
    for q, pairs in scored_by_q.items():
        ranked = sorted(pairs, key=lambda p: (-p[1], p[0]))[:_K]
        out[q] = ranked
    return out


def _python_nndescent(vecs):
    nrm = {i: math.sqrt(_dot(v, v)) for i, v in vecs.items()}
    ids = sorted(vecs)
    by_bucket = defaultdict(list)
    for i in ids:
        by_bucket[_bucket(vecs[i])].append(i)
    init = defaultdict(set)
    for members in by_bucket.values():
        for a in members:
            for b in members:
                if a != b:
                    init[a].add(b)
    for a in ids:
        for d in range(-_INIT_W, _INIT_W + 1):
            b = a + d
            if d != 0 and b in vecs:
                init[a].add(b)
    scored = {a: [(b, _cos9(vecs, nrm, a, b)) for b in sorted(bs)]
              for a, bs in init.items()}
    knn = _topk(scored)
    cand_counts = []
    for _ in range(_ROUNDS):
        # capped reverse edges
        rev_in = defaultdict(list)
        for q, pairs in knn.items():
            for v, c in pairs:
                rev_in[v].append((q, c))
        und = defaultdict(set)
        for q, pairs in knn.items():
            for v, _c in pairs:
                und[q].add(v)
        for v, incoming in rev_in.items():
            for q, _c in sorted(incoming, key=lambda p: (-p[1], p[0]))[:_K]:
                und[v].add(q)
        cand = set()
        for a, ms in und.items():
            for m in ms:
                for c in und.get(m, ()):
                    if c != a:
                        cand.add((a, c))
        existing = {(q, v) for q, pairs in knn.items() for v, _c in pairs}
        fresh = cand - existing
        cand_counts.append(len(fresh))
        merged = defaultdict(list)
        for q, pairs in knn.items():
            merged[q].extend(pairs)
        for a, c in fresh:
            merged[a].append((c, _cos9(vecs, nrm, a, c)))
        knn = _topk(merged)
    return knn, cand_counts


def test_nndescent_graph_matches_python_recompute(spark):
    vecs = _load_vectors(spark)
    knn, _ = _python_nndescent(vecs)
    want = {(q, i + 1): (v, c)
            for q, pairs in knn.items()
            for i, (v, c) in enumerate(pairs)}
    got_rows = QUERIES["ann_nndescent_graph"](spark, SF).collect()
    got = {(r["qid"], r["rn"]): (r["vid"], r["cos_sim"])
           for r in got_rows}
    assert got == want


def test_nndescent_recall_monotone_and_matches(spark):
    rows = sorted(QUERIES["ann_nndescent_recall"](spark, SF).collect(),
                  key=lambda r: r["stage"])
    assert [r["stage"] for r in rows] == list(range(_ROUNDS + 1))
    recalls = [r["recall"] for r in rows]
    # monotone non-decreasing: each round may only ADD better neighbors
    # (labels-only-improve is the algorithm's invariant)
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    # cross-check vs python recompute at this SF
    vecs = _load_vectors(spark)
    knn, _ = _python_nndescent(vecs)
    nrm = {i: math.sqrt(_dot(v, v)) for i, v in vecs.items()}
    probe = [q for q in sorted(vecs) if q < _NPROBE]
    hits = 0
    total = 0
    for q in probe:
        exact = sorted(((v, _cos9(vecs, nrm, q, v))
                        for v in vecs if v != q),
                       key=lambda p: (-p[1], p[0]))[:_K]
        exact_ids = {v for v, _c in exact}
        total += len(exact)
        hits += len(exact_ids & {v for v, _c in knn[q]})
    final = rows[-1]
    assert (final["n_hits"], final["n_total"]) == (hits, total)


def test_nndescent_candidate_counts_bounded():
    """Per-round freshly-scored candidates ≤ n·(2k)² — the paper's
    linear-in-n bound, enforced by the reverse-degree cap. Counted via
    the oracle's own unrolled CTEs (DuckDB), independent of Spark."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')")
    n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    counts = con.execute(
        _nnd_sql() + "\nSELECT " + ", ".join(
            f"(SELECT COUNT(*) FROM cand{r}) AS c{r}"
            for r in range(_ROUNDS))).fetchone()
    bound = n * (2 * _K) ** 2
    assert all(c <= bound for c in counts), (counts, bound)
    # and the python recompute agrees with the oracle's counts at the
    # smoke SF (same construction, third implementation)
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')")
    sql_counts = con2.execute(
        _nnd_sql() + "\nSELECT " + ", ".join(
            f"(SELECT COUNT(*) FROM cand{r}) AS c{r}"
            for r in range(_ROUNDS))).fetchone()
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = {i: [float(x) for x in v]
            for i, v in zip(tbl["vec_id"].to_pylist(),
                            tbl["embedding"].to_pylist())}
    _, py_counts = _python_nndescent(vecs)
    assert list(sql_counts) == py_counts


def test_doremi_fit_matches_python_recompute(spark):
    """Independent plain-python recompute of the full DoReMi EG fit —
    unigram LM, per-source NLL (the engines' exact decimal sums are
    reproduced with decimal.Decimal over the round-9 values), clipped
    excess, 5 EG rounds, round-averaged ᾱ — compared row-for-row
    against the engine output."""
    from collections import Counter, defaultdict
    from decimal import Decimal
    import math

    from arangodb_java_parquet_spark.queries.doremi import (
        _ETA_DEN, _ETA_NUM, _MIN_CNT, _ROUNDS, _SMOOTH_DEN)

    SF15 = "/root/testdata/sf0.01"
    rows = (t(spark, SF15, "documents")
            .select("doc_id", "source", "text").collect())
    vocab = Counter()
    for r in rows:
        for tok in r["text"].split(" "):
            vocab[tok] += 1
    total = sum(vocab.values())
    logp = {tok: round(math.log(c / total), 9)
            for tok, c in vocab.items() if c >= _MIN_CNT}
    floor = round(math.log(1.0 / total), 9)
    slp = defaultdict(Decimal)
    ntok = Counter()
    ndocs = Counter()
    for r in rows:
        ndocs[r["source"]] += 1
        for tok in r["text"].split(" "):
            slp[r["source"]] += Decimal(repr(
                logp.get(tok, floor))).quantize(Decimal("1.000000000"))
            ntok[r["source"]] += 1
    sources = sorted(slp)
    ref_nll = -(float(sum(slp[s] for s in sources))
                / sum(ntok[s] for s in sources))
    tn = float(sum(ndocs.values()))
    k = len(sources)
    eta = _ETA_NUM / _ETA_DEN
    c_s = 1.0 / _SMOOTH_DEN
    nll = {s: -(float(slp[s]) / ntok[s]) for s in sources}
    excess = {s: round(max(nll[s] - ref_nll, 0.0), 9) for s in sources}
    boost = {s: round(math.exp(eta * excess[s]), 9) for s in sources}
    w = {s: ndocs[s] / tn for s in sources}
    w0 = dict(w)
    traj = []
    for _ in range(_ROUNDS):
        b = {s: round(w[s] * boost[s], 9) for s in sources}
        z = float(sum(Decimal(repr(b[s])).quantize(
            Decimal("1.000000000")) for s in sources))
        w = {s: round((1.0 - c_s) * (b[s] / z) + c_s / k, 9)
             for s in sources}
        traj.append(dict(w))
    want = {}
    for s in sources:
        acc = Decimal(0)
        for wt in traj:
            acc += Decimal(repr(wt[s])).quantize(Decimal("1.000000000"))
        want[s] = (round(w0[s], 9), excess[s], traj[-1][s],
                   round(float(acc) / _ROUNDS, 9))
    got_rows = QUERIES["mixture_doremi_fit"](spark, SF15).collect()
    got = {r["source"]: (r["natural_share"], r["excess_nll"],
                         r["final_weight"], r["avg_weight"])
           for r in got_rows}
    assert got == want


def test_bfd_packing_matches_python_recompute(spark):
    """Independent python recompute of both packers (next-fit arrival
    order; best-fit-decreasing with first-on-tie bin choice) at sf0.01,
    plus the quality invariant BFD never uses more bins than next-fit."""
    from collections import defaultdict

    from arangodb_java_parquet_spark.queries.packing import _BUDGET

    SF15 = "/root/testdata/sf0.01"
    rows = (t(spark, SF15, "documents")
            .select("doc_id", "lang", "text").collect())
    shards = defaultdict(list)
    for r in rows:
        shards[r["lang"]].append((r["doc_id"], len(r["text"].split(" "))))
    want = {}
    for lang, docs in shards.items():
        total = sum(nt for _d, nt in docs)
        # next-fit, arrival order; seed (BUDGET, 0) so the first item
        # always opens bin 1 (the engines' seed — review r15)
        load, nf_bins = _BUDGET, 0
        for _d, nt in sorted(docs):
            if load + nt <= _BUDGET:
                load += nt
            else:
                load, nf_bins = nt, nf_bins + 1
        # best-fit-decreasing: fullest bin that fits, first on tie
        loads = []
        for _d, nt in sorted(docs, key=lambda p: (-p[1], p[0])):
            fits = [(ld, i) for i, ld in enumerate(loads)
                    if ld + nt <= _BUDGET]
            if not fits:
                loads.append(nt)
            else:
                best = max(ld for ld, _i in fits)
                loads[loads.index(best)] = best + nt
        assert len(loads) <= nf_bins  # BFD never worse than next-fit
        want[lang] = (len(docs), total, nf_bins, len(loads),
                      total / (nf_bins * _BUDGET),
                      total / (len(loads) * _BUDGET))
    got = {r["shard"]: (r["n_docs"], r["total_tokens"],
                        r["nextfit_bins"], r["bfd_bins"],
                        r["nextfit_fill"], r["bfd_fill"])
           for r in QUERIES["pack_bestfit_decreasing"](spark, SF15)
           .collect()}
    assert got == want


def test_rho_loss_matches_python_recompute(spark):
    """Independent python recompute of the RHO-loss selection: corpus
    and per-language unigram LMs (round-9 logps, Decimal sums), per-doc
    NLL pair, reducible loss, deterministic top-50."""
    from collections import Counter
    from decimal import Decimal
    import math

    from arangodb_java_parquet_spark.queries.doremi import (
        _MIN_CNT, _RHO_TOPN)

    SF15 = "/root/testdata/sf0.01"
    rows = (t(spark, SF15, "documents")
            .select("doc_id", "lang", "text").collect())
    vocab = Counter()
    lvocab = Counter()
    for r in rows:
        for tok in r["text"].split(" "):
            vocab[tok] += 1
            lvocab[(r["lang"], tok)] += 1
    total = sum(vocab.values())
    ltotal = Counter()
    for (lang, _tok), c in lvocab.items():
        ltotal[lang] += c
    logp = {tok: round(math.log(c / total), 9)
            for tok, c in vocab.items() if c >= _MIN_CNT}
    floor = round(math.log(1.0 / total), 9)
    llogp = {(lang, tok): round(math.log(c / ltotal[lang]), 9)
             for (lang, tok), c in lvocab.items() if c >= _MIN_CNT}
    lfloor = {lang: round(math.log(1.0 / tt), 9)
              for lang, tt in ltotal.items()}
    q9 = Decimal("1.000000000")
    scored = []
    for r in rows:
        toks = r["text"].split(" ")
        st = sum((Decimal(repr(logp.get(tok, floor))).quantize(q9)
                  for tok in toks), Decimal(0))
        sh = sum((Decimal(repr(
            llogp.get((r["lang"], tok), lfloor[r["lang"]]))).quantize(q9)
            for tok in toks), Decimal(0))
        tn = -(float(st) / len(toks))
        hn = -(float(sh) / len(toks))
        # + 0.0 mirrors the engines' -0.0 fence on rho_loss
        scored.append((r["doc_id"], r["lang"], len(toks),
                       round(tn, 9), round(hn, 9),
                       round(tn - hn, 9) + 0.0))
    scored.sort(key=lambda x: (-x[5], x[0]))
    want = {(row[0]): (row[1], row[2], row[3], row[4], row[5], i + 1)
            for i, row in enumerate(scored[:_RHO_TOPN])}
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["train_nll"],
                         r["holdout_nll"], r["rho_loss"], r["rn"])
           for r in QUERIES["select_rho_loss"](spark, SF15).collect()}
    assert got == want
