"""Per-dimension embedding statistics + feature standardization — the
normalization pre-pass of an embedding pipeline (before int8 quantization,
bucketed ANN, or semantic dedup, feature scales should be comparable).

Scale shape:

- :func:`embedding_dim_moments` is ONE ``posexplode`` + ``groupBy(pos)``:
  the map side combines to at most ``dim`` rows per partition before the
  exchange, so the shuffle carries ``dim x n_partitions`` rows regardless
  of corpus size, and the output is a ``dim``-row table.
- :func:`standardize_embeddings` folds the moment table into two
  ``dim``-length literal arrays on a one-row broadcast frame and applies
  ``(x - mean) / std`` via ``zip_with`` — pure map-side, zero shuffle.

Cross-engine determinism (registry conventions) — the discipline is
*sum at scale 12, pin outputs at scale 6, never compare raw quotient
doubles*:

- **Sums at DECIMAL(38,12)**, not 6: a scale-6 sum divided by an n that
  divides 10^3 (e.g. 500 at sf0.001) lands EXACTLY on scale-6 half-way
  boundaries where the engines' double->decimal casts disagree (observed:
  dim-19 mean at sf0.001). Scale-12 sums push the quotient's exactness to
  scale 15, so a scale-6 half-way needs 9 specific trailing digits.
- **Outputs pinned at DECIMAL(28,6)->double**: per-row double->decimal
  casts at scale 12 themselves disagree cross-engine on ~1 in 30k values
  (the rounding-boundary class registry.py documents) — at 32k values
  (sf0.01) one hit lands and the raw quotient doubles differ in the last
  ulp (observed: dim-37 mean, 2e-15). The scale-6 output pin absorbs that
  drift: a 2e-15 disagreement flips the pinned value only if the quotient
  sits within 2e-15 of a 5e-7 boundary (~4e-9 chance). ``std`` derives
  from the PINNED mean/ex2 (``sqrt(greatest(0, ex2 - mean²))`` is
  IEEE-identical on identical inputs; ``greatest`` guards the tiny
  negative a rounded variance can produce).
- The divisor-1 guard in :func:`standardize_embeddings` fires when the
  pinned variance is exactly 0 — guaranteed for constant dimensions whose
  value and square round exactly at scale 6 (0, integers, …); a constant
  like 0.1234567 instead yields a tiny spurious std from the two
  roundings' mismatch, so its standardized values are near-zero noise,
  not exactly 0 — both engines compute that identically, but don't rely
  on exact zeros for inexact constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_dim_moments(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """``(pos, n, mean, std, min_val, max_val)`` — one row per dimension."""
    ex = corpus.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val")
    )
    n = F.count(F.lit(1)).cast("long")

    # sum at 12, pin the quotient output at 6 (module docstring): the
    # scale-12 sums avoid quotient half-way boundaries, the scale-6 output
    # pin absorbs the ~1-in-30k per-row cast drift the scale-12 casts
    # themselves carry. std derives from the PINNED mean/ex2.
    def _pinned_mean_of(sum_col):
        q = F.sum(sum_col.cast("decimal(38,12)")).cast("double") / n.cast(
            "double"
        )
        return q.cast("decimal(28,6)").cast("double")

    agg = ex.groupBy("pos").agg(
        n.alias("n"),
        _pinned_mean_of(F.col("val")).alias("mean"),
        _pinned_mean_of(F.col("val") * F.col("val")).alias("ex2"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    std = F.sqrt(
        F.greatest(F.lit(0.0), F.col("ex2") - F.col("mean") * F.col("mean"))
    )
    return agg.select(
        "pos", "n", "mean", std.alias("std"), "min_val", "max_val"
    )


def standardize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    moments: DataFrame | None = None,
) -> DataFrame:
    """Per-dimension z-scoring: ``(id_col, vec_col)`` with each component
    replaced by ``(x - mean[pos]) / std[pos]`` (divisor 1 where a
    dimension is constant). ``moments`` defaults to
    :func:`embedding_dim_moments` over ``corpus`` itself; pass a
    training-set moment table to standardize a different split with the
    same transform (the train/serve contract).
    """
    if moments is None:
        moments = embedding_dim_moments(corpus, vec_col)
    stats = moments.select(
        "pos",
        "mean",
        F.when(F.col("std") == 0, F.lit(1.0)).otherwise(F.col("std")).alias(
            "std_g"
        ),
    )
    # dim-length arrays on a ONE-row frame (array_sort on structs orders by
    # the leading field, pos) — broadcast to every vector
    arrs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s["mean"],
        ).alias("__mean_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "std_g"))),
            lambda s: s["std_g"],
        ).alias("__std_arr"),
    )
    v = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(v, F.col("__mean_arr"), lambda x, m: x - m)
    standardized = F.zip_with(centered, F.col("__std_arr"), lambda x, s: x / s)
    return corpus.crossJoin(F.broadcast(arrs)).select(
        F.col(id_col), standardized.alias(vec_col)
    )
