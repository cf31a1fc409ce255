"""Compare two bench outputs per query and flag regressions.

Usage:
  python tools/bench_compare.py OLD NEW [--threshold 2.0] [--min-sec 0.3]

OLD/NEW are either bench.py stdout files (first line = full JSON with
"queries") or driver BENCH_r{N}.json records (the per-query map is
regex-scraped from their "tail" field when present).

Per the repo's perf notes, single-entry swings up to ~3x are host/JIT
noise — confirm any flagged entry with an isolated best-of-3 before
treating it as a regression.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys


def _registry_names() -> set[str]:
    """Known query names, used to filter the tail scrape (the regex would
    otherwise match non-query numeric fields like "wall"/"rows")."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        from arangodb_java_parquet_spark.queries import QUERIES
        return set(QUERIES)
    except Exception:
        return set()


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        d = json.loads(text.splitlines()[0])
    except json.JSONDecodeError:
        d = json.loads(text)
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:  # driver record: scrape the per-query map from tail
        names = _registry_names()
        scraped = {m.group(1): float(m.group(2)) for m in
                   re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', d["tail"])}
        return ({k: v for k, v in scraped.items() if k in names}
                if names else scraped)
    raise SystemExit(f"{path}: no 'queries' or 'tail' field")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore entries faster than this in OLD "
                         "(sub-noise-floor ratios are meaningless)")
    args = ap.parse_args()
    old, new = load_queries(args.old), load_queries(args.new)
    common = [n for n in new if n in old and old[n] >= args.min_sec]
    if not common:
        print("no comparable entries")
        return 0
    ratios = sorted(((new[n] / old[n], n) for n in common), reverse=True)
    med = statistics.median(r for r, _ in ratios)
    print(f"{len(common)} comparable; median ratio {med:.2f}x; "
          f"{len(new) - len(common)} new/uncomparable")
    flagged = [(r, n) for r, n in ratios if r >= args.threshold]
    for r, n in flagged:
        print(f"REGRESSION? {r:5.2f}x  {n}: {old[n]:.2f} -> {new[n]:.2f}")
    for r, n in ratios[:5]:
        if (r, n) not in flagged:
            print(f"worst-ok    {r:5.2f}x  {n}: {old[n]:.2f} -> {new[n]:.2f}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
