"""Multimodal operator tests: schema/batch-shape correctness of the
mapInPandas plumbing and exact-value determinism of the fake kernels."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators import multimodal as mm
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import table

from .conftest import SF_SMOKE


def _media(spark):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(50)
    return mm.synthesize_media(docs, "doc_id", "text")


def test_media_schema_and_metadata(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    row = m.filter(F.col("kind") == "image").first()
    assert row.metadata.width == row.metadata.height
    assert row.metadata.n_bytes == len(row.content)
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_features_exact_values(spark):
    m = _media(spark)
    out = mm.decode_features(m).orderBy("media_id")
    src = {r.media_id: bytes(r.content) for r in m.collect()}
    for r in out.collect():
        buf = np.frombuffer(src[r.media_id], dtype=np.uint8).astype(np.float64)
        assert r.n_samples == len(buf)
        assert abs(r.mean_level - buf.mean()) < 1e-9
        hist, _ = np.histogram(buf, bins=mm.FEATURE_DIM, range=(0.0, 256.0))
        np.testing.assert_allclose(r.features, (hist / len(buf)).astype(np.float32))
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram


def test_decode_is_deterministic(spark):
    m = _media(spark)
    a = sorted(map(tuple, mm.decode_features(m).collect()))
    b = sorted(map(tuple, mm.decode_features(m).collect()))
    assert a == b


def test_resize_downsamples(spark):
    m = _media(spark)
    out = mm.resize_media(m, factor=4)
    src = {r.media_id: bytes(r.content) for r in m.collect()}
    for r in out.collect():
        assert bytes(r.content) == src[r.media_id][::4]
        assert r.n_bytes == len(r.content)


def test_frame_sample_fanout(spark):
    m = _media(spark).filter(F.col("kind") == "video")
    frames = mm.frame_sample(m, frame_bytes=64, every_n=2)
    src = {r.media_id: bytes(r.content) for r in m.collect()}
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.collect_list("frame_index").alias("idx")
    )
    assert got.count() == len(src)  # fan-out covers every video
    for r in got.collect():
        n_frames = (len(src[r.media_id]) + 63) // 64
        assert r.n == (n_frames + 1) // 2
        assert sorted(r.idx) == list(range(0, n_frames, 2))
    # frame content round-trips
    one = frames.filter(F.col("frame_index") == 0).first()
    assert bytes(one.frame) == src[one.media_id][:64]


def test_pillow_seam_raises_without_library(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        mm.pillow_image_decode(b"\x89PNG")


def test_documents_corpus_stays_ascii(spark):
    """Live-data pin for two oracle preconditions: ns_mm_decode_features'
    oracle equates per-CHARACTER ord sums with per-BYTE buffer means
    (parity_multimodal.py PRECONDITION comment), and the ns_text_bpe_learn
    oracle wraps symbols in chr(1) delimiters (parity_text.py) — both hold
    only while documents.text is printable ASCII (no chr(1), every char one
    byte). If a driver testdata regeneration introduces non-ASCII or
    control bytes, this fails loudly instead of silently invalidating the
    oracles. Checks the sf0.01 table the driver compares at."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bad = docs.filter(
        F.col("text").isNotNull()
        & (
            (F.octet_length("text") != F.length("text"))  # multi-byte char
            | F.col("text").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]")
        )
    ).count()
    assert bad == 0


def test_pillow_decode_parity_when_library_present(spark):
    """Executable proof of the PRODUCTION decoder seam (env-gated:
    SPARK_GRAFT_PILLOW=1 where Pillow exists; the container default has no
    Pillow, so the seam otherwise only proves its NotImplementedError).
    Encodes a known 4x4 grayscale gradient to real PNG bytes, then asserts
    pillow_image_decode returns exactly that pixel buffer and that
    decode_features over the Spark plumbing (same mapInPandas kernel the
    fake path certifies) computes the matching n_samples/mean/histogram."""
    import os

    import numpy as np
    import pytest

    if os.environ.get("SPARK_GRAFT_PILLOW") != "1":
        pytest.skip("set SPARK_GRAFT_PILLOW=1 (with Pillow installed) to run")
    PIL_Image = pytest.importorskip("PIL.Image")

    from io import BytesIO

    pixels = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    buf = BytesIO()
    PIL_Image.fromarray(pixels, mode="L").save(buf, format="PNG")
    png = buf.getvalue()

    decoded = mm.pillow_image_decode(png)
    assert decoded.tolist() == pixels.ravel().astype(float).tolist()

    df = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, kind string, content binary",
    )
    row = mm.decode_features(df, decoder=mm.pillow_image_decode).collect()[0]
    assert row.n_samples == 16
    assert row.mean_level == float(pixels.ravel().mean())
    hist, _ = np.histogram(pixels.ravel(), bins=16, range=(0.0, 256.0))
    assert [round(f, 6) for f in row.features] == [
        round(float(h) / 16, 6) for h in hist
    ]
