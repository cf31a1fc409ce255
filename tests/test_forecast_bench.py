"""Pin for the r12q wave: naive / seasonal-naive / drift forecast
benchmarks on the daily order-count holdout."""

import math
from collections import Counter
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_naive_benchmarks_match_python(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderdate").collect()
    per_day = Counter(str(r["o_orderdate"])[:10] for r in o)
    days = sorted(per_day)
    ys = [per_day[d] for d in days]
    nd = len(ys)
    n_train = nd // 2
    y_last, y_first = ys[n_train - 1], ys[0]
    hold = list(range(n_train + 1, nd + 1))  # 1-based rn

    rows = {r["method"]: r for r in
            QUERIES["forecast_naive_benchmarks"](spark, sf_dir).collect()}
    assert set(rows) == {"naive", "snaive_7", "drift"}

    # naive
    resid = [ys[rn - 1] - y_last for rn in hold]
    r = rows["naive"]
    assert r["n_test"] == len(hold)
    assert r["mae"] == sum(abs(x) for x in resid) / float(len(hold))
    assert r["rmse"] == math.sqrt(
        sum(x * x for x in resid) / float(len(hold)))

    # seasonal naive (lag 7 over the full series; all holdout rows
    # have a lag at this horizon)
    sn = [(ys[rn - 1] - ys[rn - 8]) for rn in hold if rn - 8 >= 0]
    r = rows["snaive_7"]
    assert r["n_test"] == len(sn)
    assert r["mae"] == sum(abs(x) for x in sn) / float(len(sn))
    assert r["rmse"] == math.sqrt(sum(x * x for x in sn) / float(len(sn)))

    # drift
    slope = (y_last - y_first) / float(n_train - 1)
    dresid = [ys[rn - 1] - (y_last + (rn - n_train) * slope)
              for rn in hold]
    mae = float(sum(Decimal(repr(round(abs(x), 9)))
                    for x in dresid)) / len(hold)
    rmse = math.sqrt(float(sum(Decimal(repr(round(x * x, 6)))
                               for x in dresid)) / len(hold))
    r = rows["drift"]
    assert r["n_test"] == len(hold)
    assert r["mae"] == mae
    assert r["rmse"] == rmse
    # rmse dominates mae for every method (Jensen)
    for m in rows.values():
        assert m["rmse"] >= m["mae"] - 1e-12
