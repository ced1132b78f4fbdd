"""Materialize a training-source mixture: replicate/sample each source to
its target epoch count, deterministically.

``plans/parity_curation.ns_source_mixture`` COMPUTES the temperature
reweighting (epochs per source); this operator APPLIES it — the step that
actually builds the training mix. Epochs decompose as ``full + frac``
(integer + fractional part, carried as exact parts-per-million): every
document gets ``full`` copies, plus one more iff its md5 bucket falls
under ``frac`` — no RNG, same selection on every cluster and every rerun,
and the same arithmetic is expressible in the DuckDB oracle.

Scale: pure map work + an explode whose fan-out is the OUTPUT size
(Σ epochs × source size). Zero shuffle; the downstream shuffle (packing)
sees the already-mixed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import md5_long

_PPM = 1_000_000


def apply_source_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    epochs_ppm: dict[str, int],
    *,
    salt: str = "#mix",
) -> DataFrame:
    """Replicate/sample ``df`` to the target mixture.

    ``epochs_ppm``: target epochs per source in exact parts-per-million
    (1_500_000 = 1.5 epochs). Sources absent from the dict get 0 epochs
    (dropped). Returns the input columns plus ``copy_idx`` (0-based copy
    ordinal); a document selected for the fractional epoch carries the
    highest copy_idx.
    """
    pairs: list = []
    for src, ppm in sorted(epochs_ppm.items()):
        if ppm < 0:
            raise ValueError(f"negative epochs_ppm for {src!r}")
        pairs.extend([F.lit(src), F.lit(int(ppm))])
    rate = F.create_map(*pairs)[F.col(source_col)]
    full = (rate / F.lit(_PPM)).cast("long")
    frac = rate - full * F.lit(_PPM)
    bucket = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)), modulus=_PPM
    )
    copies = (full + F.when(bucket < frac, F.lit(1)).otherwise(F.lit(0))).alias(
        "__copies"
    )
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("__copies") - 1))
        )
        .drop("__copies")
    )
