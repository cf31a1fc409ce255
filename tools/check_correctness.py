"""Local correctness harness mimicking the driver's t2 gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row-count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from arangodb_java_parquet_spark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: repr of the double
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    # Type-sensitive on purpose: the driver's value hash distinguishes
    # int64 from int128/decimal. DuckDB results are fetched via Arrow
    # (below) so a HUGEINT column surfaces as Decimal and repr-differs
    # from Spark's int — local green then predicts driver green.
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            # Arrow fetch (not fetchall): preserves engine-level types so
            # e.g. an uncast integer SUM (DuckDB HUGEINT) materializes as
            # Decimal, failing locally the way the driver's hash fails.
            atbl = rel.arrow()
            acols = [atbl.column(i).to_pylist() for i in range(atbl.num_columns)]
            duck_rows = list(zip(*acols)) if acols else []
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(spark_rows) != len(duck_rows):
            ok = False
            msgs.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            ok = False
            msgs.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if ok:
            cs = canon(spark_rows, spark_cols)
            cd = canon(duck_rows, duck_cols)
            if cs != cd:
                ok = False
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diffs}")
        if ok:
            print(f"PASS  {name}: {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
