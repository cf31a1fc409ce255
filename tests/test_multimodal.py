"""Multimodal plumbing tests: binary payload columns, Arrow-batched decode
stub, frame sampling — schema and determinism contracts."""

from arangodb_java_parquet_spark.operators.multimodal import (
    attach_binary_payload, decode_image_stub, extract_image_features,
    frame_sample_stub)
from arangodb_java_parquet_spark.queries.common import t


def test_attach_binary_payload_schema(spark, sf_dir):
    d = t(spark, sf_dir, "documents").limit(20)
    p = attach_binary_payload(d)
    assert dict(p.dtypes)["payload"] == "binary"
    row = p.first()
    assert row.meta.mime == "image/fake"
    assert row.meta.n_bytes == len(bytes(row.payload))


def test_extract_image_features_deterministic(spark, sf_dir):
    d = t(spark, sf_dir, "documents").limit(50)
    feats = extract_image_features(attach_binary_payload(d))
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 50
    # re-run produces identical metadata (deterministic stub)
    rows2 = {r.doc_id: r for r in
             extract_image_features(attach_binary_payload(d)).collect()}
    assert rows == rows2
    r0 = next(iter(rows.values()))
    assert r0.format in ("png", "jpeg", "webp")
    assert r0.width >= 64 and r0.height >= 64 and len(r0.phash) == 16


def test_stub_matches_local_python(spark, sf_dir):
    # the distributed path computes exactly what the stub computes locally
    d = t(spark, sf_dir, "documents").limit(5)
    local = {r.doc_id: decode_image_stub(r.text.encode())
             for r in d.select("doc_id", "text").collect()}
    dist = {r.doc_id: r for r in
            extract_image_features(attach_binary_payload(d)).collect()}
    for k, meta in local.items():
        assert dist[k].phash == meta["phash"]
        assert dist[k].width == meta["width"]


def test_frame_sample_explodes(spark, sf_dir):
    d = t(spark, sf_dir, "documents").limit(10)
    frames = frame_sample_stub(attach_binary_payload(d), every_n=2)
    rows = frames.collect()
    assert len(rows) >= 10  # at least one frame per doc
    assert all(r.frame_idx % 2 == 0 for r in rows)


def test_binary_file_lake_to_features(spark, tmp_path):
    """End-to-end multimodal ingest: a lake of binary files read via the
    binaryFile source, decoded through the Arrow-batched mapInPandas
    feature extractor — the full scan->decode pipeline with real plumbing
    (the decode itself is the documented deterministic stub)."""
    from pyspark.sql import functions as F

    from arangodb_java_parquet_spark.sources.readers import read_binary_files

    payloads = {1: b"\x89PNGfakedata-one", 2: b"\xff\xd8JPEGfake-two",
                3: b"RIFFwebp-fake-three"}
    for i, b in payloads.items():
        (tmp_path / f"img_{i}.bin").write_bytes(b)

    lake = read_binary_files(spark, str(tmp_path), glob="img_*.bin")
    with_ids = lake.select(
        F.regexp_extract("path", r"img_(\d+)\.bin", 1).cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"))
    feats = {r.doc_id: r for r in extract_image_features(with_ids).collect()}
    assert set(feats) == {1, 2, 3}
    for i, b in payloads.items():
        expected = decode_image_stub(b)
        assert feats[i].phash == expected["phash"]
        assert feats[i].n_bytes == len(b)
        assert (feats[i].width, feats[i].height) == (
            expected["width"], expected["height"])
