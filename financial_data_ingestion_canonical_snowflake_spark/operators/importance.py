"""DSIR-shaped importance weighting: score raw documents by how much more
likely their hashed n-gram features are under a target corpus than under
the raw corpus itself.

The shape follows the published Data Selection with Importance Resampling
recipe (hashed n-gram bag features; per-feature likelihood ratio between a
target distribution and the raw distribution; per-document aggregate as
the selection score), re-expressed Spark-first:

1. features: word n-gram shingles hashed into ``2**hash_bits`` buckets
   with the engine's cross-engine md5 integer hash (``scalars.md5_long``)
   — the feature space is FIXED-size regardless of corpus scale;
2. two feature tables (target, raw) via one groupBy each — at most
   ``2**hash_bits`` rows (65,536 at the default 16 bits), broadcast;
3. per-document scoring: explode features, broadcast-join the ratio
   table, re-aggregate one compact row per document — the corpus-wide
   shuffle carries (doc, bucket) pairs and the output one row per doc.

Cross-engine parity surface (hash-checkable): integer anchors
(``n_features``, summed target/raw bucket counts) plus ``mean_ratio`` —
the mean of per-feature smoothed probability ratios
``((cnt_T + 1) / (total_T + B)) / ((cnt_R + 1) / (total_R + B))``, each
ratio DECIMAL(38,12)-pinned before the order-insensitive sum and the
mean quotient pinned at DECIMAL(28,6) — the sum-at-12/pin-output-at-6
discipline (registry convention, ``embedding_stats`` precedent). The
production DSIR score is the LOG-likelihood-ratio sum;
``log_weight=True`` adds it, but ``ln`` is not bit-pinned across engines,
so it stays off hash-checked surfaces (same policy as unigram-LM
``mean_surprisal``).

Scale posture: feature tables are bounded by the hash space (broadcast
side), the raw side shuffles once for the per-doc aggregate, and nothing
data-sized reaches the driver. At 100 TB the knobs are ``hash_bits``
(feature resolution vs broadcast size) and shingle length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import md5_long
from ..functions.text import shingles_from_tokens, tokens


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_len: int = 2,
    hash_bits: int = 16,
) -> DataFrame:
    """``(id, bucket)`` pairs: one row per n-gram occurrence, bucket =
    md5 of the shingle modulo ``2**hash_bits`` (bag semantics — repeats
    count, as DSIR's bag-of-ngrams features do). Tokens project as a real
    column before the gram lambda (the HOF recompute discipline)."""
    return (
        docs.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
        )
        .select(
            "id",
            F.explode(shingles_from_tokens(F.col("__toks"), shingle_len)).alias(
                "__g"
            ),
        )
        .select("id", md5_long(F.col("__g"), modulus=1 << hash_bits).alias("bucket"))
    )


def _feature_table(feats: DataFrame) -> DataFrame:
    """Bucket counts + grand total attached to every row (vocab-bounded)."""
    tab = feats.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = tab.agg(F.sum("cnt").cast("long").alias("total"))
    return tab.crossJoin(F.broadcast(total))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_len: int = 2,
    hash_bits: int = 16,
    log_weight: bool = False,
) -> DataFrame:
    """Per raw document: ``(id, n_features, sum_target_cnt, sum_raw_cnt,
    mean_ratio)`` — higher ``mean_ratio`` = more target-like.

    Laplace-smoothed per-feature probabilities on both sides (so buckets
    unseen in either corpus stay finite); ``log_weight=True`` adds
    ``log_weight`` = Σ ln(ratio), the published DSIR score (off the
    hash-checked parity surface — ln is not cross-engine bit-pinned).

    Documents with zero features (fewer than ``shingle_len`` tokens) emit
    no row — they carry no evidence either way; treat absence as
    "unscored", not as a low weight.
    """
    b = 1 << hash_bits
    # vocab-bounded (<= 2**hash_bits rows) but produced by a FULL
    # target-corpus shingle pass — persisted because both the ratio join
    # and the grand total consume it; without the cache the target
    # pipeline runs twice (r15; cache lifetime contract as elsewhere —
    # the session owner clears between query families)
    tgt_tab = (
        hashed_ngram_features(
            target, id_col, text_col, shingle_len=shingle_len, hash_bits=hash_bits
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("t_cnt"))
        .persist()
    )
    # the target TOTAL is a global: it must reach raw buckets the target
    # never saw (their smoothed p_t is 1 / (t_total + B), not 1 / B)
    t_total = tgt_tab.agg(
        F.coalesce(F.sum("t_cnt"), F.lit(0)).cast("long").alias("t_total")
    )
    # the raw gram stream feeds BOTH the bucket-count table and the per-doc
    # scoring join — persist so the tokenize+shingle+md5 pipeline (the
    # dominant per-doc cost) runs once, not twice (r15). Compact rows:
    # two longs per gram occurrence.
    raw_feats = hashed_ngram_features(
        raw, id_col, text_col, shingle_len=shingle_len, hash_bits=hash_bits
    ).persist()
    rawtab = _feature_table(raw_feats).select(
        "bucket",
        F.col("cnt").alias("r_cnt"),
        F.col("total").alias("r_total"),
    )
    # ratio table: one row per OBSERVED raw bucket (<= 2**hash_bits);
    # every raw feature occurrence has an entry by construction, so the
    # per-doc join below is a broadcast inner join with no fallback path
    ratios = (
        rawtab.join(F.broadcast(tgt_tab), "bucket", "left")
        .crossJoin(F.broadcast(t_total))
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            "r_cnt",
            "t_total",
            "r_total",
        )
    )
    p_t = (F.col("t_cnt") + 1).cast("double") / (F.col("t_total") + b).cast("double")
    p_r = (F.col("r_cnt") + 1).cast("double") / (F.col("r_total") + b).cast("double")
    ratios = ratios.withColumn("ratio", p_t / p_r)
    joined = raw_feats.join(F.broadcast(ratios), "bucket")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.sum("t_cnt").cast("long").alias("sum_target_cnt"),
        F.sum("r_cnt").cast("long").alias("sum_raw_cnt"),
        # sum-at-12 / pin-output-at-6 (embedding_stats discipline): per-row
        # scale-6 ratio pins hit cast-boundary draws at sf1 row counts;
        # scale-12 rows drift only 1e-12 and the DECIMAL(28,6) quotient
        # pin absorbs it. Per-row precision is 38 (26 integer digits):
        # the smoothed ratio is bounded by ~(r_total+B)/2, which can pass
        # 16 integer digits at 100 TB n-gram counts — 38 keeps the cast
        # from going NULL under Spark non-ANSI / erroring in DuckDB there.
        (
            F.sum(F.col("ratio").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        )
        .cast("decimal(28,6)")
        .cast("double")
        .alias("mean_ratio"),
    ]
    if log_weight:
        aggs.append(F.sum(F.log("ratio")).alias("log_weight"))
    return joined.groupBy(F.col("id").alias(id_col)).agg(*aggs)
