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
