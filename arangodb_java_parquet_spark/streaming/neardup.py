"""Incremental near-duplicate detection at ingest: every micro-batch's
documents are MinHash-signatured, LSH-checked against a PERSISTENT
signature store (all previously ingested docs), and then appended to it —
so a near-dup of anything ever ingested is flagged the moment it arrives,
without re-scanning the corpus.

This is the streaming form of the batch dedup funnel
(operators/dedup.py): the store holds only (band_idx, band_hash, id) —
~32 bytes/doc/band, never text — so at 100 TB of ingested documents the
store is a few hundred GB and the per-batch check is one equi-join against
it. At that scale the store should be written BUCKETED by band_hash so the
per-batch join co-locates without reshuffling the store (bucketed-join
plan gate in tests/test_plans.py shows the mechanism); the append-parquet
form here keeps the test fleet-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arangodb_java_parquet_spark.operators.dedup import (
    char_shingles, lsh_bands, minhash_signatures)


def _batch_bands(batch_df: DataFrame, text_col: str, id_col: str
                 ) -> DataFrame:
    sh = char_shingles(batch_df, text_col, id_col, k=5, distinct=False)
    return lsh_bands(minhash_signatures(sh, id_col), id_col)


def check_and_register(spark: SparkSession, batch_df: DataFrame, *,
                       store_path: str, dups_path: str,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> None:
    """One micro-batch step: flag near-dups (vs the store AND within the
    batch), append flagged pairs to ``dups_path``, then register the
    batch's bands in ``store_path``.

    Idempotence note: foreachBatch can replay a batch after failure; a
    production deployment keys both writes by epoch id (partition dir per
    epoch, overwrite-by-partition) — elided here to keep the mechanism
    clear.
    """
    from pyspark.errors import AnalysisException

    bands = _batch_bands(batch_df, text_col, id_col).cache()
    try:
        store = spark.read.parquet(store_path)
        have_store = True
    except AnalysisException as e:
        # ONLY first-batch bootstrap (store not created yet) may proceed
        # without the store. Any other failure — corrupt store, transient
        # FS error, schema mismatch — must propagate so foreachBatch
        # retries: silently treating it as "no store" would skip
        # cross-corpus dup detection AND then append the batch, losing
        # those dup pairs permanently with no signal.
        if "PATH_NOT_FOUND" not in str(e) and \
                "Path does not exist" not in str(e):
            raise
        have_store = False
    pairs = None
    if have_store:
        vs_store = (bands.join(
            store.select("band_idx", "band_hash",
                         F.col(id_col).alias("existing_id")),
            ["band_idx", "band_hash"])
            .filter(F.col(id_col) != F.col("existing_id"))
            .select(F.col(id_col).alias("new_id"), "existing_id")
            .distinct())
        pairs = vs_store
    a = bands.alias("a")
    b = bands.alias("b")
    in_batch = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                       & (F.col("a.band_hash") == F.col("b.band_hash"))
                       & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
                .select(F.col(f"b.{id_col}").alias("new_id"),
                        F.col(f"a.{id_col}").alias("existing_id"))
                .distinct())
    pairs = in_batch if pairs is None else pairs.unionByName(in_batch)
    pairs.write.mode("append").parquet(dups_path)
    bands.write.mode("append").parquet(store_path)
    bands.unpersist()


def incremental_neardup_stream(spark: SparkSession, stream_df: DataFrame, *,
                               store_path: str, dups_path: str,
                               checkpoint: str,
                               text_col: str = "text",
                               id_col: str = "doc_id"):
    """Wire :func:`check_and_register` under ``foreachBatch``; caller picks
    the trigger (tests use availableNow + maxFilesPerTrigger to force
    multiple micro-batches)."""
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(spark)

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        check_and_register(spark, batch_df, store_path=store_path,
                           dups_path=dups_path, text_col=text_col,
                           id_col=id_col)

    return (stream_df.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
