"""Multimodal-operator parity queries.

The media table is synthesized deterministically from ``documents`` (content
= utf-8 bytes of the text), so the DuckDB oracle can reason about byte
lengths arithmetically (``octet_length(encode(text))``) even though it never
runs the Python kernels. The decode-feature query is rows-only (its
histogram math lives in numpy inside mapInPandas — exact values are covered
by tests/test_multimodal.py instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as mm
from .registry import parity, table

_KIND = "(['image','audio','video'])[(doc_id % 3) + 1]"
_NBYTES = "octet_length(encode(text))"


def _media(spark, sf_dir):
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return mm.synthesize_media(docs, "doc_id", "text")


@parity(
    "ns_mm_metadata_stats",
    driver=False,  # driver slot: folded into ns_mm_digest
    oracle=f"""
    SELECT {_KIND} AS kind, COUNT(*) AS media_cnt,
           CAST(SUM({_NBYTES}) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN {_KIND} = 'image'
                THEN CAST(ceil(sqrt(CAST({_NBYTES} AS DOUBLE))) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS total_width,
           CAST(SUM(CASE WHEN {_KIND} = 'video' THEN {_NBYTES} * 40 ELSE 0 END)
                AS BIGINT) AS total_duration_ms
    FROM documents GROUP BY 1
    """,
)
def ns_mm_metadata_stats(spark, sf_dir):
    """Typed-metadata rollup over the binary media table (metadata stays a
    struct column; content is never touched — scan prunes to metadata)."""
    m = _media(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("media_cnt"),
        F.sum("metadata.n_bytes").alias("total_bytes"),
        F.sum(F.coalesce(F.col("metadata.width").cast("long"), F.lit(0))).alias(
            "total_width"
        ),
        F.sum(F.coalesce(F.col("metadata.duration_ms"), F.lit(0))).alias(
            "total_duration_ms"
        ),
    )


@parity(
    "ns_mm_frame_sample",
    driver=False,  # driver slot: folded into ns_mm_digest
    oracle=f"""
    WITH m AS (SELECT doc_id AS media_id, {_NBYTES} AS n FROM documents
               WHERE {_KIND} = 'video'),
    fr AS (SELECT media_id, CAST(ceil(n / 64.0) AS BIGINT) AS n_frames FROM m)
    SELECT media_id,
           CAST(ceil(n_frames / 2.0) AS BIGINT) AS sampled_frames,
           CAST((CAST(ceil(n_frames / 2.0) AS BIGINT) - 1) * 2 AS BIGINT) AS last_frame_index
    FROM fr
    """,
)
def ns_mm_frame_sample(spark, sf_dir):
    """Video frame sampling (mapInPandas row fan-out), checked arithmetically:
    ceil(bytes/64) frames, every 2nd sampled."""
    videos = _media(spark, sf_dir).filter(F.col("kind") == "video")
    frames = mm.frame_sample(videos, frame_bytes=64, every_n=2)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("sampled_frames"),
        F.max("frame_index").alias("last_frame_index"),
    )


@parity(
    "ns_mm_resize",
    driver=False,  # driver slot: folded into ns_mm_digest
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(ceil({_NBYTES} / 4.0) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def ns_mm_resize(spark, sf_dir):
    """Binary-in/binary-out downsample; oracle checks the output sizes."""
    resized = mm.resize_media(_media(spark, sf_dir), factor=4)
    return resized.select("media_id", "n_bytes")


# PRECONDITION (oracle below): the corpus must be pure ASCII. n_samples
# counts BYTES (octet_length) while mean_level averages per-CHARACTER ord
# values — these agree only when every character is one byte. A non-ASCII
# testdata round would make the Spark side (true byte-buffer mean) diverge
# from this oracle; fix by averaging over encode(text) octets instead.
@parity(
    "ns_mm_decode_features",
    oracle=f"""
    SELECT doc_id AS media_id, {_KIND} AS kind,
           CAST({_NBYTES} AS BIGINT) AS n_samples,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(generate_series(1, length(text)),
                          i -> ord(substr(text, i, 1)))) AS DOUBLE)
                     / length(text) END AS mean_level,
           CAST(16 AS INT) AS feature_dim
    FROM documents
    """,
)
def ns_mm_decode_features(spark, sf_dir):
    """Decode + histogram feature extraction (Arrow-batched mapInPandas).

    Oracle-paired: the fake decoder's buffer IS the utf-8 byte sequence
    (ASCII corpus, so per-char ord == byte value), n_samples is the byte
    count, and numpy's float64 mean of exact small integers equals DuckDB's
    integer-sum / n double division bit-for-bit. The histogram VALUES are
    float32 bucket ratios (not SQL-reproducible at bit level) — their
    exact-value assertions live in tests/test_multimodal.py; the oracle
    checks the feature dimensionality."""
    feats = mm.decode_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_samples",
        "mean_level",
        F.size("features").alias("feature_dim"),
    )


# --------------------------------------------------------------------------
# Driver-slot composite: the three SQL-checkable multimodal queries in one
# oracle-paired digest (SURVEY.md §8 50-entry driver window). The rows-only
# decode-features query stays registered individually.
# --------------------------------------------------------------------------

_MM_DIGEST = [
    (
        "ns_mm_metadata_stats",
        [("kind", "s"), ("media_cnt", "s"), ("total_bytes", "s"), ("total_width", "s"), ("total_duration_ms", "s")],
    ),
    ("ns_mm_frame_sample", [("media_id", "s"), ("sampled_frames", "s"), ("last_frame_index", "s")]),
    ("ns_mm_resize", [("media_id", "s"), ("n_bytes", "s")]),
]


def _mm_digest_oracle() -> str:
    from .registry import ALL_ORACLE_SQL, digest_sql

    return "\nUNION ALL\n".join(
        digest_sql(name, ALL_ORACLE_SQL[name], cols) for name, cols in _MM_DIGEST
    )


@parity("ns_mm_digest", oracle=_mm_digest_oracle())
def ns_mm_digest(spark, sf_dir):
    """Metadata rollup + frame sampling + binary resize content-checksummed
    into one driver slot (registry.digest_frame): the mapInPandas kernels'
    outputs are still value-verified against the byte-arithmetic oracles."""
    from .registry import ALL_QUERIES, digest_frame

    out = None
    for name, _cols in _MM_DIGEST:
        d = digest_frame(ALL_QUERIES[name](spark, sf_dir), name)
        out = d if out is None else out.unionByName(d)
    return out
