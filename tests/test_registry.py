"""Registry hygiene for the driver-panel era.

The verification driver checks exactly the first 50 entries of ``queries()``
in registration order. These tests pin that panel to the curated
``DRIVER_PANEL`` list and guarantee every panel slot is value-checkable
(carries a DuckDB oracle) — a rows-only entry drifting into the panel would
silently burn a correctness slot on a permanent ``no_oracle``.
"""

from arangodb_java_parquet_spark.queries import DRIVER_PANEL, ORACLES, QUERIES


def test_panel_is_first_50_registered():
    assert len(DRIVER_PANEL) == 50
    assert list(QUERIES)[:50] == DRIVER_PANEL


def test_panel_slots_all_carry_oracles():
    unoracled = [n for n in DRIVER_PANEL if n not in ORACLES]
    assert unoracled == []


def test_panel_has_no_duplicates():
    assert len(set(DRIVER_PANEL)) == 50


def test_registry_names_unique_and_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
    # every oracle belongs to a registered query
    orphans = [n for n in ORACLES if n not in QUERIES]
    assert orphans == []
