"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libraries —
see ``decode_image_stub``); everything Spark-side is real and tested:
schema contracts, binary handling through Arrow batches, partition-parallel
UDF plumbing, and the deterministic fake feature extractor that stands in
for a model forward pass.

Scale: mapInPandas streams Arrow batches — executor memory is O(batch), not
O(partition); binary payloads never pass through the driver; feature
extraction parallelizes per partition exactly like a GPU preprocessing fleet
would (swap the stub for the real decoder + an inference client).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = ("doc_id long, n_bytes long, format string, "
                     "width int, height int, phash string")


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Build an opaque binary payload column + modality metadata struct from
    a text corpus (the test stand-in for real image bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"))


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    A real deployment replaces this body with e.g. PIL.Image.open; the
    container has no imaging libraries, so we derive stable pseudo-metadata
    from the payload hash — keeping every downstream contract (schema,
    batching, partitioning) real and testable.
    """
    h = hashlib.md5(payload).digest()
    return {
        "format": ["png", "jpeg", "webp"][h[0] % 3],
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "phash": h.hex()[:16],
    }


def extract_image_features(df: DataFrame, *, payload_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract binary payloads via mapInPandas (Arrow
    batches, vectorized transfer; per-row python only inside the batch)."""
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(df.sparkSession)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_image_stub(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                "format": [m["format"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "phash": [m["phash"] for m in metas],
            })

    return df.mapInPandas(decode_batches, schema=IMAGE_META_SCHEMA)


def frame_sample_stub(df: DataFrame, *, every_n: int = 10,
                      payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The frame decode is faked (frame index + payload hash); the explode
    pattern, schema, and per-partition batching are the real contract a
    video pipeline needs.
    """
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(df.sparkSession)

    def sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p)
                n_frames = max(len(data) // 100, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(hashlib.md5(
                        data[fi * 100:(fi + 1) * 100]).hexdigest()[:12])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_hash": hashes})

    return df.mapInPandas(sample_batches,
                          schema="doc_id long, frame_idx int, frame_hash string")


AUDIO_META_SCHEMA = ("doc_id long, n_bytes long, codec string, "
                     "sample_rate int, duration_ms long, loudness int")


def decode_audio_stub(payload: bytes) -> dict:
    """Deterministic fake audio decoder (the container has no soundfile /
    ffmpeg; a real deployment swaps this body). Pseudo-metadata derives
    from the payload md5 + length so every value is SQL-expressible and
    the Arrow plumbing stays fully oracle-checked."""
    h = hashlib.md5(payload).digest()
    return {
        "codec": ["flac", "opus", "mp3"][h[3] % 3],
        "sample_rate": [16000, 24000, 44100][h[4] % 3],
        # fake: 1 "ms" of audio per payload byte
        "duration_ms": len(payload),
        "loudness": h[5] % 128,
    }


def extract_audio_features(df: DataFrame, *, payload_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """Audio leg of the multimodal pipeline: decode + feature-extract via
    Arrow-batched mapInPandas (same contract as the image leg — binary
    column in, typed metadata out, python only inside the batch)."""
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(df.sparkSession)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_audio_stub(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                "codec": [m["codec"] for m in metas],
                "sample_rate": [m["sample_rate"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
                "loudness": [m["loudness"] for m in metas],
            })

    return df.mapInPandas(decode_batches, schema=AUDIO_META_SCHEMA)
