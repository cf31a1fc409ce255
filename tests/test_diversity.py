"""Pins for the r12m wave: distinct-n diversity and circadian entropy."""

import math
from collections import Counter, defaultdict
from decimal import Decimal

from arangodb_java_parquet_spark.queries.common import QUERIES, t


def test_distinct_n_matches_python(spark, sf_dir):
    docs = [r["text"].split(" ") for r in
            t(spark, sf_dir, "documents").select("text").collect()]
    rows = {r["n"]: r for r in
            QUERIES["text_distinct_n"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    prev_ratio = 0.0
    for n in (1, 2, 3):
        grams = Counter()
        for ws in docs:
            for i in range(len(ws) - n + 1):
                grams[" ".join(ws[i:i + n])] += 1
        total = sum(grams.values())
        r = rows[n]
        assert r["total_ngrams"] == total
        assert r["distinct_ngrams"] == len(grams)
        assert r["distinct_ratio"] == len(grams) / float(total)
        # higher-order n-grams are strictly more diverse
        assert r["distinct_ratio"] >= prev_ratio
        prev_ratio = r["distinct_ratio"]


def test_circadian_entropy_matches_python(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_type", "ts").collect()
    hours = defaultdict(Counter)
    for r in ev:
        hours[r["event_type"]][r["ts"].hour] += 1
    rows = {r["event_type"]: r for r in
            QUERIES["event_circadian_entropy"](spark, sf_dir).collect()}
    assert set(rows) == set(hours)
    for et, cnt in hours.items():
        n = sum(cnt.values())
        ent = float(sum(
            Decimal(repr(round(-(c / float(n)) * math.log(c / float(n)),
                               9))) for c in cnt.values()))
        peak_hour = min(cnt, key=lambda h: (-cnt[h], h))
        r = rows[et]
        assert r["n_events"] == n
        assert r["circadian_entropy"] == ent
        assert r["entropy_norm"] == round(ent / math.log(24.0), 9)
        assert r["peak_hour"] == peak_hour
        assert r["peak_share"] == cnt[peak_hour] / float(n)
        assert 0.0 <= r["entropy_norm"] <= 1.0 + 1e-9
