"""Sweep every registered oracle SQL through DuckDB and report result
columns whose DuckDB type is HUGEINT/UHUGEINT (int128).

DuckDB promotes bare integer ``SUM(...)`` (plain and windowed) to HUGEINT;
Spark returns BIGINT. The driver's value hash is type-sensitive, so any
such column is a latent hash-FAIL. Run this after adding oracles; the
pytest guard in tests/test_oracle_types.py enforces it permanently.

Usage: python tools/hugeint_sweep.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def has_int128(ty) -> bool:
    """True if the DuckDB type contains int128 anywhere — top-level or
    nested inside LIST/STRUCT/MAP (a LIST(HUGEINT) element materializes
    as Decimal through Arrow just like a top-level HUGEINT column;
    round-5 lesson: user_behavior_vector's [c0..c4] count vector)."""
    s = str(ty)
    return any(b in s for b in BAD_TYPES)


def sweep(sf_dir: str):
    """Return {name: [(col, type), ...]} for oracles with int128 outputs."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    errs = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        try:
            rel = con.sql(sql)
            hits = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                    if has_int128(ty)]
        except Exception as e:  # noqa: BLE001 - report, don't die
            errs[name] = str(e)[:200]
            continue
        if hits:
            bad[name] = hits
    return bad, errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    bad, errs = sweep(args.sf)
    for name, hits in bad.items():
        print(f"HUGEINT  {name}: {hits}")
    for name, e in errs.items():
        print(f"ERROR    {name}: {e}")
    print(f"\n{len(bad)} oracles with int128 columns, {len(errs)} errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
