"""Guard: no registered oracle SQL may produce a DuckDB int128 column.

DuckDB promotes bare integer ``SUM(...)`` — plain and windowed — to
HUGEINT; Spark returns BIGINT for the same aggregate. The driver's value
hash is type-sensitive, so any HUGEINT output column is a guaranteed
hash-FAIL on the driver even when every value matches (round-4 lesson:
3 driver-red panel slots, 13 more latent). This test binds every oracle
over the sf0.001 views and asserts the class can never ship again.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
BAD_TYPES = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_in_any_oracle(con):
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        rel = con.sql(sql)  # binds/plans only; no execution needed for types
        # substring match catches int128 NESTED inside LIST/STRUCT/MAP
        # too (round-5: a LIST(HUGEINT) count vector failed the Arrow
        # canon exactly like a top-level HUGEINT column)
        hits = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                if any(b in str(ty) for b in BAD_TYPES)]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"{len(offenders)} oracle(s) output int128 columns (driver "
        f"hash-FAIL): {offenders} — wrap the integer SUM in "
        f"CAST(... AS BIGINT)")


def test_probe_uncast_sum_is_detected(con):
    """Sanity: the detection mechanism itself sees a bare integer SUM."""
    rel = con.sql("SELECT SUM(x) AS s FROM (SELECT 1 AS x)")
    assert str(rel.types[0]) == "HUGEINT"
