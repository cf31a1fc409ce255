"""Pins for the r12o wave: Durbin-Watson and Breusch-Pagan residual
diagnostics on the daily revenue-vs-time OLS."""

from collections import defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t

SCALE = float(1 << 20)


def _residuals(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice").collect()
    per_day = defaultdict(int)
    for r in o:
        per_day[str(r["o_orderdate"])[:10]] += int(
            round(r["o_totalprice"] * 100))
    days = sorted(per_day)
    ys = [per_day[d] // 100 for d in days]
    n = len(ys)
    st = sum(range(1, n + 1))
    sy = sum(ys)
    stt = sum(t_ * t_ for t_ in range(1, n + 1))
    sty = sum(t_ * y for t_, y in zip(range(1, n + 1), ys))
    b = (n * sty - st * sy) / (float(n) * stt - float(st) * st)
    a = sy / float(n) - b * (st / float(n))
    return n, [(ys[i] - (a + b * (i + 1))) / SCALE for i in range(n)]


def test_durbin_watson_matches_python(spark, sf_dir):
    n, eps = _residuals(spark, sf_dir)
    num = float(sum(Decimal(repr(round((e2 - e1) * (e2 - e1), 9)))
                    for e1, e2 in zip(eps, eps[1:])))
    den = float(sum(Decimal(repr(round(e * e, 9))) for e in eps))
    row = QUERIES["stats_durbin_watson"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["dw_stat"] == num / den
    assert 0.0 < row["dw_stat"] < 4.0  # DW lives in [0, 4]


def test_breusch_pagan_matches_python(spark, sf_dir):
    n, eps = _residuals(spark, sf_dir)
    e2s = [round(e * e, 9) for e in eps]
    st = sum(range(1, n + 1))
    stt = sum(t_ * t_ for t_ in range(1, n + 1))
    se = float(sum(Decimal(repr(x)) for x in e2s))
    see = float(sum(Decimal(repr(round(x * x, 9))) for x in e2s))
    ste = float(sum(Decimal(repr(round(t_ * x, 6)))
                    for t_, x in zip(range(1, n + 1), e2s)))
    num = (n * ste - st * se) * (n * ste - st * se)
    den = (float(n) * stt - float(st) * st) * (n * see - se * se)
    r2 = num / den
    row = QUERIES["stats_breusch_pagan"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["r2_aux"] == r2
    assert row["bp_stat"] == n * r2
    assert 0.0 <= row["r2_aux"] <= 1.0
