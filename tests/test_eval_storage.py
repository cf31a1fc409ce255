"""Pins for the r12l wave: expected reciprocal rank (cascade model) and
the RLE/dictionary encodability audit."""

import math
from collections import defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_err_matches_bruteforce(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label").collect()
    qs = [r for r in e if r["vec_id"] < 10]
    cs = [r for r in e if r["vec_id"] >= 10]

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(d / (na * nb), 9)

    expect = {}
    for q in qs:
        scored = sorted(
            ((cos(q["embedding"], c["embedding"]), c["vec_id"],
              1 if c["label"] == q["label"] else 0) for c in cs),
            key=lambda x: (-x[0], x[1]))[:10]
        s, c, nrel = Decimal(0), 0, 0
        for rn, (_, _, rel) in enumerate(scored, start=1):
            s += Decimal(repr(round(rel / (rn * 2.0 ** (c + 1)), 9)))
            c += rel
            nrel += rel
        expect[q["vec_id"]] = (nrel, float(s))
    rows = {r["qid"]: r for r in
            QUERIES["eval_expected_reciprocal_rank"](
                spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for qid, (nrel, err) in expect.items():
        r = rows[qid]
        assert r["n_rel_at10"] == nrel
        assert r["err_at10"] == err
        assert 0.0 <= r["err_at10"] <= 1.0  # cascade mass sums below 1


def test_rle_audit_matches_python(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate").collect()
    o = sorted(o, key=lambda r: r["o_orderkey"])
    rows = {r["col_name"]: r for r in
            QUERIES["dq_rle_dictionary_audit"](spark, sf_dir).collect()}
    for col in ("o_orderstatus", "o_orderpriority", "o_orderdate"):
        vals = [r[col] for r in o]
        n = len(vals)
        nd = len(set(vals))
        runs = 1 + sum(1 for a, b in zip(vals, vals[1:]) if a != b)
        bits = 0 if nd <= 1 else len(bin(nd - 1)) - 2
        r = rows[col]
        assert (r["n_rows"], r["n_distinct"], r["n_runs"]) == (n, nd, runs)
        assert r["avg_run_len"] == n / float(runs)
        assert r["dict_bits"] == bits
        # a random-ish column has ~n*(1-1/d) boundaries; sanity: runs<=n
        assert 1 <= runs <= n
