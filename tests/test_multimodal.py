"""Multimodal operator tests: schema/batch-shape correctness of the
mapInPandas plumbing and exact-value determinism of the fake kernels."""

from __future__ import annotations

import numpy as np
import pytest
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
    # the two REAL tiers agree bit-for-bit on the same bytes (gray + RGB)
    assert mm.png_image_decode(png).tolist() == decoded.tolist()
    rgb = np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5
    buf2 = BytesIO()
    PIL_Image.fromarray(rgb, mode="RGB").save(buf2, format="PNG")
    assert (
        mm.png_image_decode(buf2.getvalue()).tolist()
        == mm.pillow_image_decode(buf2.getvalue()).tolist()
    )

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


def _forward_filter(recon: "np.ndarray", bpp: int, ftypes: list[int]) -> bytes:
    """Apply PNG spec §6 filters FORWARD (the encoder direction) row by
    row, so the decoder's unfilter paths 1-4 get exercised by
    construction, not just filter-0 round-trips."""
    h, stride = recon.shape
    out = b""
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        r = recon[y].astype(np.int64)
        f = ftypes[y % len(ftypes)]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), r[:-bpp]]) if bpp <= stride else np.zeros(stride, dtype=np.int64)
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]]) if bpp <= stride else np.zeros(stride, dtype=np.int64)
        if f == 0:
            filt = r
        elif f == 1:
            filt = r - left
        elif f == 2:
            filt = r - prior
        elif f == 3:
            filt = r - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = r - pred
        out += bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes()
        prior = r
    return out


def _handmade_png(recon: "np.ndarray", color_type: int, ftypes: list[int]) -> bytes:
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    h, stride = recon.shape
    w = stride // ch
    raw = _forward_filter(recon, ch, ftypes)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_grayscale_and_rgb():
    """png_encode -> png_image_decode reproduces the pixel buffer exactly
    (grayscale identity; RGB through the documented integer luma)."""
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    assert mm.png_image_decode(mm.png_encode(gray)).tolist() == (
        gray.astype(np.float64).ravel().tolist()
    )
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    r, g, b = (rgb[:, :, i].astype(np.int64) for i in range(3))
    luma = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.float64)
    assert mm.png_image_decode(mm.png_encode(rgb)).tolist() == luma.ravel().tolist()


def test_png_decode_all_filter_types():
    """Every PNG filter type (Sub/Up/Average/Paeth + None) unfilters back
    to the reference reconstruction, for 1- and 3-channel images."""
    rng = np.random.default_rng(11)
    for ch, color_type in ((1, 0), (3, 2)):
        recon = rng.integers(0, 256, (10, 7 * ch), dtype=np.uint8)
        png = _handmade_png(recon, color_type, ftypes=[0, 1, 2, 3, 4])
        got = mm.png_image_decode(png)
        px = recon.reshape(10, 7, ch)
        if ch == 1:
            want = px[:, :, 0].astype(np.float64)
        else:
            r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
            want = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
                np.float64
            )
        assert got.tolist() == want.ravel().tolist(), (ch, color_type)


def test_png_decode_rejects_garbage_and_exotics():
    import pytest

    with pytest.raises(ValueError, match="bad signature"):
        mm.png_image_decode(b"JFIF not a png")
    # 16-bit depth is out of scope -> loud NotImplementedError, not junk
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        mm.png_image_decode(png16)


def test_decode_features_over_real_png_bytes(spark):
    """The REAL-bytes branch of the mapInPandas kernel, ungated: encode
    deterministic gradients to actual PNG files, run decode_features with
    the stdlib decoder through Spark, and assert the histogram/stats equal
    a direct numpy computation on the known pixels."""
    imgs = {
        i: (np.arange(i * 64, dtype=np.uint8).reshape(i * 8, 8) * 3) % 256
        for i in (1, 2, 3)
    }
    rows = [(int(i), "image", bytearray(mm.png_encode(px))) for i, px in imgs.items()]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    ).repartition(2)
    out = {
        r.media_id: r
        for r in mm.decode_features(df, decoder=mm.png_image_decode).collect()
    }
    assert set(out) == set(imgs)
    for i, px in imgs.items():
        buf = px.astype(np.float64).ravel()
        assert out[i].n_samples == len(buf)
        assert abs(out[i].mean_level - buf.mean()) < 1e-9
        hist, _ = np.histogram(buf, bins=mm.FEATURE_DIM, range=(0.0, 256.0))
        np.testing.assert_allclose(
            out[i].features, (hist / len(buf)).astype(np.float32)
        )


def test_resize_over_real_png_decoded_pixels(spark):
    """Binary-in/binary-out plumbing over real encoded bytes: decode the
    PNG pixels driver-side as the reference, downsample the decoded buffer
    via the same seam shape (decode -> resize on raw bytes stays the fake
    path; here we prove the real decode feeds the pipeline)."""
    px = (np.arange(256, dtype=np.uint8).reshape(16, 16) * 5) % 256
    png = mm.png_encode(px)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png))], "media_id long, kind string, content binary"
    )
    # real decode through Spark, then histogram equality at factor-dowsampled
    # granularity driver-side
    feats = mm.decode_features(df, decoder=mm.png_image_decode).collect()[0]
    assert feats.n_samples == 256
    assert feats.mean_level == px.astype(np.float64).mean()


def test_auto_decoder_default_routes_by_signature(spark):
    """The decode_features DEFAULT (auto_image_decode, r12): real PNG
    bytes take the stdlib codec, text bytes keep the fake tier — one
    mixed-format table, one pass, per-row routing."""
    px = (np.arange(128, dtype=np.uint8).reshape(16, 8) * 7) % 256
    txt = b"plain utf-8 text content, bytes are pixels"
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(mm.png_encode(px))),
            (2, "image", bytearray(txt)),
        ],
        "media_id long, kind string, content binary",
    )
    out = {r.media_id: r for r in mm.decode_features(df).collect()}
    # row 1: PNG magic -> stdlib decode -> stats over the PIXELS
    assert out[1].n_samples == px.size
    assert abs(out[1].mean_level - px.astype(np.float64).mean()) < 1e-9
    # row 2: no signature -> fake tier -> stats over the raw BYTES
    buf = np.frombuffer(txt, dtype=np.uint8).astype(np.float64)
    assert out[2].n_samples == len(buf)
    assert abs(out[2].mean_level - buf.mean()) < 1e-9


def test_auto_decoder_never_silently_fakes_real_images():
    """JPEG/GIF/WEBP magic must reach the Pillow seam — loud
    NotImplementedError where the library is absent, never fake
    features for real image bytes."""
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    gif_ish = b"GIF89a" + b"\x00" * 32
    webp_ish = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"\x00" * 32
    try:
        import PIL  # noqa: F401

        have_pillow = True
    except ImportError:
        have_pillow = False
    for blob in (jpeg_ish, gif_ish, webp_ish):
        if have_pillow:
            with pytest.raises(Exception):  # truncated garbage: decode error
                mm.auto_image_decode(blob)
        else:
            with pytest.raises(NotImplementedError):
                mm.auto_image_decode(blob)
    # and the synthetic convention still routes to the fake tier
    assert mm.auto_image_decode(b"hello").tolist() == [
        float(b) for b in b"hello"
    ]
