"""Stored-index parity: every fit-once/probe-later ANN query must return
BIT-IDENTICAL rows to its fit-inclusive twin — the model store changes
latency, never answers. Also pins the store's staleness key (different
source mtime ⇒ different root) and the fit-once behavior (second call
hits the store, no refit)."""

import os

from arangodb_java_parquet_spark.operators.models import store_root_for
from arangodb_java_parquet_spark.queries import QUERIES


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivfpq_stored_matches_inline(spark, sf_dir):
    inline = _rows(QUERIES["sim_topk_ivfpq"](spark, sf_dir))
    stored = _rows(QUERIES["sim_topk_ivfpq_stored"](spark, sf_dir))
    assert stored == inline


def test_pq_adc_stored_matches_inline(spark, sf_dir):
    inline = _rows(QUERIES["sim_topk_pq_adc"](spark, sf_dir))
    stored = _rows(QUERIES["sim_topk_pq_adc_stored"](spark, sf_dir))
    assert stored == inline


def test_ivf_stored_matches_inline(spark, sf_dir):
    inline = _rows(QUERIES["sim_topk_ivf"](spark, sf_dir))
    stored = _rows(QUERIES["sim_topk_ivf_stored"](spark, sf_dir))
    assert stored == inline


def test_components_materialized_matches_inline(spark, sf_dir):
    from arangodb_java_parquet_spark.queries.curation import (
        components_materialized)
    inline = _rows(QUERIES["dedup_cluster_components"](spark, sf_dir))
    stored = _rows(components_materialized(spark, sf_dir))
    assert stored == inline


def test_store_root_keyed_by_source_identity(tmp_path, sf_dir):
    a = store_root_for(sf_dir, "embeddings")
    assert a == store_root_for(sf_dir, "embeddings")  # stable
    # a different file identity must map to a different root
    other = tmp_path / "embeddings.parquet"
    other.write_bytes(b"x")
    b = store_root_for(str(tmp_path), "embeddings")
    assert a != b


def test_second_call_loads_not_refits(spark, sf_dir):
    """After the first stored-probe run the artifacts exist on disk; the
    second run must read them (manifest present) rather than refit."""
    root = store_root_for(sf_dir, "embeddings")
    QUERIES["sim_topk_pq_adc_stored"](spark, sf_dir).collect()
    manifest = os.path.join(root, "pq_codes_pos", "manifest.json")
    assert os.path.isfile(manifest)
    before = os.path.getmtime(manifest)
    QUERIES["sim_topk_pq_adc_stored"](spark, sf_dir).collect()
    assert os.path.getmtime(manifest) == before


def test_ivfpq_stored_probe_prunes_cell_partitions(spark, sf_dir):
    """The codes artifact is written hive-partitioned by cell; the probe
    joining on cell must carry dynamic partition pruning on that scan
    (reads only the probed cells — the FAISS-style serving layout)."""
    df = QUERIES["sim_topk_ivfpq_stored"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ivfpq_codes_by_cell" in plan
    assert "dynamicpruning" in plan.lower()
