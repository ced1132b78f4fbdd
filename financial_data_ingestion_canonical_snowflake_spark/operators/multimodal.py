"""Multimodal (image/audio/video) column operators.

Media assets are opaque ``binary`` columns plus a typed metadata struct —
the only schema that scales to 100 TB: content stays a byte buffer the JVM
never interprets; all per-row decode work happens in Arrow-batched Python
(``mapInPandas``), where the real codec libraries would run.

The container has no image/audio libraries, so the decode kernels are
DETERMINISTIC FAKES (clearly marked): they interpret the raw bytes as the
"pixel"/"sample" buffer directly. The Spark-side plumbing — schemas,
``mapInPandas`` signatures, Arrow batch iteration, row fan-out for frame
sampling — is real and tested; swapping a fake kernel for Pillow/ffmpeg is a
one-function change (``decoder=`` argument), and missing-library decoders
raise ``NotImplementedError`` instead of silently faking.

Scale notes:
- ``mapInPandas`` streams Arrow batches (spark.sql.execution.arrow
  .maxRecordsPerBatch) so a partition of large blobs never materializes at
  once; keep blobs <= ~100 MB/row or chunk upstream.
- Every operator is per-row (no shuffle); partition count is inherited, so
  co-partitioned joins against the media table stay shuffle-free.
- Feature vectors come out as ``array<float>`` ready for the ANN operators
  (operators/similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text corpus (the container has
    no binary fixtures): content = utf-8 bytes of the text, kind cycles
    image/audio/video, metadata derived from content size. Pure column
    expressions — runs at any scale."""
    content = F.encode(F.col(text_col), "UTF-8")
    n = F.length(content).cast("long")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    side = F.ceil(F.sqrt(n.cast("double"))).cast("int")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.concat(F.lit("fake/"), kind).alias("format"),
            F.when(kind == "image", side).alias("width"),
            F.when(kind == "image", side).alias("height"),
            F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(kind == "video", n * 40).alias("duration_ms"),
            n.alias("n_bytes"),
        ).alias("metadata"),
    )


# ---------------------------------------------------------------------------
# decode kernels (pluggable; fakes are deterministic byte-level math)


def fake_image_decode(content: bytes) -> np.ndarray:
    """FAKE decoder: bytes ARE the grayscale pixel buffer (uint8)."""
    return np.frombuffer(content, dtype=np.uint8).astype(np.float64)


def pillow_image_decode(content: bytes) -> np.ndarray:  # pragma: no cover
    """Real decoder seam — raises unless Pillow is installed."""
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, not present in this container; "
            "use fake_image_decode for the deterministic test path"
        ) from exc
    return np.asarray(Image.open(BytesIO(content)).convert("L"), dtype=np.float64).ravel()


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    Output: one row per input row with a ``dim``-bucket normalized byte/pixel
    histogram as ``features array<float>`` plus basic signal stats. The
    histogram of a decoded buffer is a real (if simple) visual feature — and
    is deterministic for the fake decoder, so tests can assert exact values.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("mean_level", T.DoubleType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # Arrow-batched: never the whole partition at once
            rows = []
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf[content_col]
            ):
                buf = decoder(bytes(content))
                hist, _ = np.histogram(buf, bins=dim, range=(0.0, 256.0))
                total = max(len(buf), 1)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "kind": str(kind),
                        "n_samples": len(buf),
                        "mean_level": float(buf.mean()) if len(buf) else 0.0,
                        "features": (hist / total).astype(np.float32),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select("media_id", "kind", content_col).mapInPandas(run, out_schema)


def resize_media(
    df: DataFrame, factor: int = 4, content_col: str = "content"
) -> DataFrame:
    """"Resize" by deterministic downsampling: keep every ``factor``-th byte
    of the decoded buffer (a real resize kernel plugs in at the same seam).
    Demonstrates binary-in / binary-out mapInPandas plumbing."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            small = [bytes(c)[::factor] for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": small,
                    "n_bytes": [len(s) for s in small],
                }
            )

    return df.select("media_id", content_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 2,
    content_col: str = "content",
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from a video blob.

    Row fan-out (one input row -> many frame rows) inside mapInPandas — the
    batch shape a real ffmpeg frame extractor produces. Frames index from 0;
    a trailing partial frame is kept (real samplers pad it).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf[content_col]):
                raw = bytes(content)
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(int(media_id))
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.select("media_id", content_col).mapInPandas(run, out_schema)
