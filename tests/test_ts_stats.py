"""Pins for the r12h wave: PACF Durbin-Levinson, runs test, CCF, Mood's
median test — python recomputes mirroring the engine's exact
formulations."""

import math
from collections import defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def _daily(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    cents, counts = defaultdict(int), defaultdict(int)
    for r in o:
        d = str(r["o_orderdate"])[:10]
        cents[d] += int(round(r["o_totalprice"] * 100))
        counts[d] += 1
    days = sorted(cents)
    return days, cents, counts


def _acf(vals, lag):
    xs = vals[lag:]
    ys = vals[:-lag]
    n = len(xs)
    sx = float(sum(Decimal(repr(round(x, 4))) for x in xs))
    sy = float(sum(Decimal(repr(round(y, 4))) for y in ys))
    sxx = float(sum(Decimal(repr(round(x * x, 2))) for x in xs))
    syy = float(sum(Decimal(repr(round(y * y, 2))) for y in ys))
    sxy = float(sum(Decimal(repr(round(x * y, 2)))
                    for x, y in zip(xs, ys)))
    return round((n * sxy - sx * sy)
                 / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)


def test_pacf_matches_python(spark, sf_dir):
    days, cents, _ = _daily(spark, sf_dir)
    # dsum: exact decimal cents -> double revenue
    revs = [float(Decimal(cents[d]) / 100) for d in days]
    r1, r2, r3 = _acf(revs, 1), _acf(revs, 2), _acf(revs, 3)
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - phi22)
    pacf3 = ((r3 - phi21 * r2 - phi22 * r1)
             / (1 - phi21 * r1 - phi22 * r2))
    row = QUERIES["timeseries_pacf"](spark, sf_dir).collect()[0]
    assert row["n_days"] == len(days)
    assert (row["acf_1"], row["acf_2"], row["acf_3"]) == (r1, r2, r3)
    assert row["pacf_1"] == r1
    assert row["pacf_2"] == phi22
    assert row["pacf_3"] == pacf3


def test_runs_test_matches_python(spark, sf_dir):
    days, cents, _ = _daily(spark, sf_dir)
    vals = sorted(cents.values())
    m = len(vals)
    lo, hi = vals[(m - 1) // 2], vals[m // 2]
    med = lo + 0.5 * (hi - lo)
    seq = [1 if cents[d] > med else 0 for d in days if cents[d] != med]
    n1 = sum(seq)
    n2 = len(seq) - n1
    r = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    er = 1 + 2 * n1 * n2 / float(n1 + n2)
    sd = math.sqrt(float(2 * n1 * n2) * (2 * n1 * n2 - n1 - n2)
                   / ((n1 + n2) * (n1 + n2)) / (n1 + n2 - 1))
    row = QUERIES["stats_runs_test"](spark, sf_dir).collect()[0]
    assert (row["n_above"], row["n_below"], row["n_runs"]) == (n1, n2, r)
    assert row["expected_runs"] == er
    assert row["z_score"] == (r - er) / sd
    # a daily revenue series should not be wildly non-random
    assert abs(row["z_score"]) < 10


def test_crosscorr_matches_python(spark, sf_dir):
    days, cents, counts = _daily(spark, sf_dir)
    xs = [counts[d] for d in days]
    ys = [cents[d] // 100 for d in days]
    rows = {r["lag"]: r for r in
            QUERIES["timeseries_crosscorr"](spark, sf_dir).collect()}
    assert set(rows) == set(range(-3, 4))
    for lag in range(-3, 4):
        if lag >= 0:
            pairs = [(xs[i], ys[i + lag])
                     for i in range(len(xs) - lag)]
        else:
            pairs = [(xs[i], ys[i + lag])
                     for i in range(-lag, len(xs))]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        num = n * sxy - sx * sy
        den = (math.sqrt(float(n) * sxx - float(sx) * sx)
               * math.sqrt(float(n) * syy - float(sy) * sy))
        r = rows[lag]
        assert r["n_pairs"] == n
        assert r["ccf"] == num / den
    # volume and revenue must co-move strongly at lag 0
    assert rows[0]["ccf"] > 0.5


def test_mood_median_matches_python(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    vals = sorted(r["n_chars"] for r in d)
    m = len(vals)
    lo, hi = vals[(m - 1) // 2], vals[m // 2]
    med = lo + 0.5 * (hi - lo)
    grp = defaultdict(lambda: [0, 0])  # n_j, a_j
    for r in d:
        g = grp[r["lang"]]
        g[0] += 1
        g[1] += 1 if r["n_chars"] > med else 0
    n = sum(g[0] for g in grp.values())
    a = sum(g[1] for g in grp.values())
    sa = Decimal(0)
    sb = Decimal(0)
    for n_j, a_j in grp.values():
        ea = n_j * a / float(n)
        eb = n_j * (n - a) / float(n)
        sa += Decimal(repr(round((a_j - ea) * (a_j - ea) / ea, 9)))
        sb += Decimal(repr(round(((n_j - a_j) - eb) * ((n_j - a_j) - eb)
                                 / eb, 9)))
    chi2 = float(sa) + float(sb)
    row = QUERIES["stats_mood_median"](spark, sf_dir).collect()[0]
    assert (row["n_docs"], row["k_groups"], row["n_above_total"]) == (
        n, len(grp), a)
    assert row["chi2_mood"] == chi2
    assert row["chi2_mood"] >= 0.0
