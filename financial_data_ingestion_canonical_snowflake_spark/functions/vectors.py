"""Vector column expressions for embedding similarity (north-star ops).

Dot products / norms are sequential left-folds over the array — the exact
same operation order as the DuckDB oracle's ``list_reduce``, so doubles are
bit-identical cross-engine (IEEE ops are deterministic given order).
JVM-side codegen; no UDFs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(j: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    md5-derived so the DuckDB oracle can inline the very same constants;
    no RNG state anywhere.
    """
    h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    return [[hyperplane(j, i) for i in range(dim)] for j in range(num_planes)]


def int8_scale(vec: Column) -> Column:
    """Symmetric int8 quantization scale for one vector:
    ``max(|x|) / 127`` (0.0 for all-zero vectors). PROJECT this as a named
    column before feeding :func:`int8_codes` — the codes lambda references
    the scale once per element, and Catalyst re-evaluates captured outer
    expressions inside higher-order-function lambdas, so an inline scale
    would recompute the O(dim) max per element (the O(dim²) trap
    functions/text.py documents)."""
    return F.array_max(
        F.transform(vec, lambda x: F.abs(x.cast("double")))
    ) / F.lit(127.0)


def int8_codes(vec: Column, scale: Column) -> Column:
    """Int8 codes ``q_i = round(x_i / scale)`` (all-zero when scale is 0) —
    the 4x embedding-storage compressor of a vector index (float32 -> int8;
    candidate generation runs on the codes, exact re-ranking on the
    originals). ``scale`` must be a projected attribute (see
    :func:`int8_scale`). Cross-engine deterministic: the division is
    single-op IEEE and round() is half-away-from-zero in both Spark and
    DuckDB (pinned empirically)."""
    return F.when(
        scale == 0.0,
        F.transform(vec, lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("long"))
    )


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Reconstruct the double vector from int8 codes: ``q_i * scale``."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def max_abs_error(vec: Column, q: Column, scale: Column) -> Column:
    """Largest per-element reconstruction error ``max_i |x_i - q_i*scale|``
    — order-independent (max of exact IEEE per-element errors), so it sits
    safely on a hash-checked parity surface. Bounded by ``scale / 2`` for
    in-range inputs; pytest pins that bound."""
    errs = F.zip_with(
        F.transform(vec, lambda x: x.cast("double")),
        q,
        lambda x, qi: F.abs(x - (qi.cast("double") * scale)),
    )
    return F.array_max(errs)


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit j set when dot(vec, plane_j) >= 0.

    Cosine-similar vectors agree on most hyperplane signs, so they land in
    the same bucket with high probability — the candidate-generation step
    that replaces the O(n^2) cross join at scale.
    """
    bits = []
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
