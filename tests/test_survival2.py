"""Pins for the r12n wave: Nelson-Aalen cumulative hazard and
Bland-Altman limits of agreement."""

import math
from collections import defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t

CENSOR_US = 2 * 3600 * 1000000


def test_nelson_aalen_matches_python(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "ts").collect()
    # parquet timestamps surface as naive UTC; compute micros portably
    import calendar
    per_user = defaultdict(list)
    for r in ev:
        tsv = r["ts"]
        us = (calendar.timegm(tsv.timetuple()) * 1_000_000
              + tsv.microsecond)
        per_user[r["user_id"]].append(us)
    tmax = max(max(v) for v in per_user.values())
    per_day = defaultdict(lambda: [0, 0])  # d, ended
    for us_list in per_user.values():
        f, l_ = min(us_list), max(us_list)
        dur = (l_ - f) // 86400000000
        cens = 1 if l_ >= tmax - CENSOR_US else 0
        per_day[dur][0] += 1 - cens
        per_day[dur][1] += 1
    days = sorted(per_day)
    at_risk = {}
    acc = 0
    for day in reversed(days):
        acc += per_day[day][1]
        at_risk[day] = acc
    cum = Decimal(0)
    expect = {}
    for day in days:
        d = per_day[day][0]
        if d == 0:
            continue
        cum += Decimal(repr(round(d / float(at_risk[day]), 9)))
        expect[day] = (d, at_risk[day], float(cum))
    rows = {r["churn_day"]: r for r in
            QUERIES["survival_nelson_aalen"](spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    prev = 0.0
    for day in sorted(expect):
        d, nr, h = expect[day]
        r = rows[day]
        assert (r["n_churned"], r["n_at_risk"]) == (d, nr)
        assert r["cum_hazard"] == h
        assert r["fh_survival"] == round(math.exp(-h), 9)
        assert r["cum_hazard"] >= prev  # hazard is nondecreasing
        prev = r["cum_hazard"]


def test_bland_altman_matches_python(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "n_chars", "text").collect()
    es = [r["n_chars"] - 5 * len(r["text"].split(" ")) for r in docs]
    n = len(es)
    s1 = sum(es)
    s2 = sum(e * e for e in es)
    me = s1 / float(n)
    sde = math.sqrt((s2 - s1 / float(n) * s1) / (n - 1))
    z = 196.0 / 100
    lo, hi = me - z * sde, me + z * sde
    outside = sum(1 for e in es if e < lo or e > hi)
    row = QUERIES["eval_bland_altman"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert row["mean_bias_tokens"] == me / 5
    assert row["loa_low_tokens"] == lo / 5
    assert row["loa_high_tokens"] == hi / 5
    assert row["n_outside"] == outside
    assert row["frac_outside"] == outside / float(n)
    # ~95% of differences must fall inside the limits by construction
    assert row["frac_outside"] < 0.15
