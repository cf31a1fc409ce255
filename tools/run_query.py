"""CLI runner for any declared query: list, run, show, explain.

Usage:
  python tools/run_query.py --list
  python tools/run_query.py q1_pricing_summary [--sf DIR] [--n 20] [--explain]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--n", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    from arangodb_java_parquet_spark.queries import ORACLES, QUERIES

    if args.list or not args.name:
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:40s} [{tag}]")
        return 0

    if args.name not in QUERIES:
        print(f"unknown query: {args.name!r} (use --list)", file=sys.stderr)
        return 2

    from arangodb_java_parquet_spark.session import get_spark
    spark = get_spark(app_name=f"run:{args.name}")
    t0 = time.time()
    df = QUERIES[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=80)
    print(f"[{args.name}] {df.count()} rows in {time.time()-t0:.2f}s "
          f"at {args.sf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
