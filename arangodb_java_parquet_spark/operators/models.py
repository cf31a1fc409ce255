"""Fitted-artifact store: persist what an in-engine fit learns (IVF
centroids, BPE merges, IRLS weights, LM vocabularies) as plain parquet
tables and reload them for later apply jobs.

This is the production split the fit queries imply: training-data
pipelines fit ONCE (expensive, full-corpus) and apply DAILY (cheap,
broadcast the artifact). Artifacts are ordinary DataFrames, so the store
is just a directory-of-parquet convention plus a tiny manifest — no new
serialization format, readable by any engine (the same portability rule
as the oracle SQL), and writable/readable from any executor count.

Layout::

    <root>/<name>/manifest.json   {"name", "kind", "columns"}
    <root>/<name>/data.parquet    the artifact rows
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def save_model(df: DataFrame, root: str, name: str, kind: str) -> str:
    """Persist a fitted-artifact DataFrame. Overwrites any prior version
    (fit jobs are idempotent re-runs). Returns the model directory."""
    mdir = os.path.join(root, name)
    df.write.mode("overwrite").parquet(os.path.join(mdir, "data.parquet"))
    manifest = {"name": name, "kind": kind, "columns": df.columns}
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return mdir


def load_model(spark: SparkSession, root: str, name: str,
               expect_kind: str | None = None) -> DataFrame:
    """Reload a fitted artifact; validates the manifest kind/columns so an
    apply job fails loudly on a mismatched artifact, not with wrong
    results."""
    mdir = os.path.join(root, name)
    with open(os.path.join(mdir, "manifest.json")) as f:
        manifest = json.load(f)
    if expect_kind is not None and manifest["kind"] != expect_kind:
        raise ValueError(
            f"model {name!r} has kind {manifest['kind']!r}, "
            f"expected {expect_kind!r}")
    df = spark.read.parquet(os.path.join(mdir, "data.parquet"))
    missing = [c for c in manifest["columns"] if c not in df.columns]
    if missing:
        raise ValueError(f"model {name!r} missing columns {missing}")
    return df.select(*manifest["columns"])


def list_models(root: str) -> list[dict]:
    """Manifests of every model under the store root."""
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        mpath = os.path.join(root, name, "manifest.json")
        if os.path.isfile(mpath):
            with open(mpath) as f:
                out.append(json.load(f))
    return out
