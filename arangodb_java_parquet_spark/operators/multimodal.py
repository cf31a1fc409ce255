"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The IMAGE leg has an honest pure-stdlib pixel decoder (``decode_image``:
24-bit BMP + binary P6 PPM, exact channel statistics — value-checked
end-to-end by the ``multimodal_image_decode`` query and
tests/test_multimodal.py). Formats that genuinely need an imaging library
(JPEG/PNG/WebP) and the audio/video legs remain STUBBED
(``decode_image_stub`` / ``decode_audio_stub``: deterministic md5-derived
pseudo-metadata — this container ships no imaging/audio libs); everything
Spark-side is real and tested either way: schema contracts, binary handling
through Arrow batches, partition-parallel UDF plumbing.

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


# ---------------------------------------------------------------------------
# honest image leg: pure-stdlib pixel codecs (no imaging libraries needed)
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb_at) -> bytes:
    """Build a real 24-bit uncompressed bottom-up BMP (BITMAPINFOHEADER)
    from a pixel callback ``rgb_at(x, y) -> (r, g, b)``. Fixture
    generator for the decode round-trip tests/queries."""
    import struct as _s
    row_sz = (width * 3 + 3) & ~3
    img_sz = row_sz * height
    off = 14 + 40
    out = bytearray()
    out += b"BM" + _s.pack("<IHHI", off + img_sz, 0, 0, off)
    out += _s.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_sz,
                   2835, 2835, 0, 0)
    for y in range(height - 1, -1, -1):  # bottom-up row order
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_at(x, y)
            row += bytes((b & 255, g & 255, r & 255))  # BGR on disk
        row += b"\x00" * (row_sz - len(row))
        out += row
    return bytes(out)


def encode_ppm(width: int, height: int, rgb_at) -> bytes:
    """Build a real binary P6 PPM from ``rgb_at(x, y) -> (r, g, b)``."""
    out = bytearray(f"P6\n{width} {height}\n255\n".encode())
    for y in range(height):
        for x in range(width):
            r, g, b = rgb_at(x, y)
            out += bytes((r & 255, g & 255, b & 255))
    return bytes(out)


def decode_image(payload: bytes) -> dict | None:
    """REAL pixel decoder, pure stdlib: 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up or top-down) and binary P6 PPM
    (whitespace/comment-tolerant header). Returns format, dimensions and
    exact integer channel sums / pixel count (mean computation is left
    to the caller so it can pick its determinism discipline); None for
    payloads that are not a supported image — callers decide whether to
    fall back (e.g. to :func:`decode_image_stub` for synthetic corpora).

    This replaces the md5 stub as the honest image leg: given real image
    bytes it reports real pixel statistics. Formats beyond BMP/P6 still
    need an imaging library — that boundary is explicit here rather than
    hidden behind a fake.
    """
    import struct as _s
    if payload[:2] == b"BM" and len(payload) >= 54:
        try:
            off, = _s.unpack_from("<I", payload, 10)
            w, h_raw = _s.unpack_from("<ii", payload, 18)
            _planes, bpp = _s.unpack_from("<HH", payload, 26)
            comp, = _s.unpack_from("<I", payload, 30)
        except _s.error:
            return None
        if bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
            return None
        h = abs(h_raw)
        row_sz = (w * 3 + 3) & ~3
        if len(payload) < off + row_sz * h:
            return None
        sr = sg = sb = 0
        for yrow in range(h):
            base = off + yrow * row_sz
            row = payload[base:base + w * 3]
            sb += sum(row[0::3])
            sg += sum(row[1::3])
            sr += sum(row[2::3])
        return {"format": "bmp", "width": w, "height": h,
                "sum_r": sr, "sum_g": sg, "sum_b": sb, "n_px": w * h}
    if payload[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
        i, fields = 2, []
        n = len(payload)
        while len(fields) < 3 and i < n:
            while i < n and payload[i:i + 1].isspace():
                i += 1
            if payload[i:i + 1] == b"#":  # comment to end of line
                while i < n and payload[i] not in (10, 13):
                    i += 1
                continue
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            if j == i:
                return None
            try:
                fields.append(int(payload[i:j]))
            except ValueError:
                return None
            i = j
        if len(fields) < 3 or i >= n:
            return None
        i += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if w <= 0 or h <= 0 or maxval != 255:
            return None
        if len(payload) < i + w * h * 3:
            return None
        data = payload[i:i + w * h * 3]
        return {"format": "ppm", "width": w, "height": h,
                "sum_r": sum(data[0::3]), "sum_g": sum(data[1::3]),
                "sum_b": sum(data[2::3]), "n_px": w * h}
    return None


IMAGE_DECODE_SCHEMA = ("doc_id long, format string, width int, height int, "
                       "mean_r double, mean_g double, mean_b double")


def decode_image_stats(df: DataFrame, *, payload_col: str = "payload",
                       id_col: str = "doc_id") -> DataFrame:
    """Real-decoder image leg: binary column in, (format, dims, per-channel
    mean) out, via Arrow-batched mapInPandas. Means are exact-int channel
    sums divided by the pixel count — both engines' nearest-double of the
    same rational, so the whole decode round-trip is value-checkable.
    Unsupported payloads are dropped (None from the decoder)."""
    from arangodb_java_parquet_spark.shipping import ensure_package_shipped
    ensure_package_shipped(df.sparkSession)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "format", "width", "height",
                                    "mean_r", "mean_g", "mean_b")}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = decode_image(bytes(p))
                if m is None:
                    continue
                rows["doc_id"].append(i)
                rows["format"].append(m["format"])
                rows["width"].append(m["width"])
                rows["height"].append(m["height"])
                rows["mean_r"].append(m["sum_r"] / m["n_px"])
                rows["mean_g"].append(m["sum_g"] / m["n_px"])
                rows["mean_b"].append(m["sum_b"] / m["n_px"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(decode_batches, schema=IMAGE_DECODE_SCHEMA)
