"""Python-kernel quality signals that no SQL expression can produce.

Currently one: the COMPRESSION-RATIO heuristic (Gopher / Dolma corpus
curation) — highly repetitive or templated text compresses far below
natural prose, so ``compressed_len / raw_len`` separates boilerplate and
degenerate repetition from real content with a single cheap signal.

Kernel discipline (SURVEY.md §2.13): Arrow-batched ``mapInPandas`` only —
zlib (stdlib, deterministic for a fixed level/strategy) runs per batch
over the raw bytes; everything around the kernel (projection, schema,
downstream filters) stays JVM-side. Rows-only verification: DuckDB has no
zlib surface, so exactness is pinned against direct ``zlib`` calls in
pytest rather than an oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_LEVEL = 6  # zlib default — pinned so retrains/reruns are bit-identical


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, raw_len, compressed_len, compression_ratio) per document.

    ``raw_len`` counts UTF-8 bytes; NULL text reads as empty (ratio NULL —
    0/0 carries no signal). One Arrow-batched pass, no shuffle: the kernel
    is a map, so the operator composes with any downstream filter without
    breaking partitioning.
    """
    import pandas as pd

    # id passes through untouched — carry ITS type, not an assumed long
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("raw_len", T.LongType()),
            T.StructField("compressed_len", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        for b in batches:
            raws = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in b[text_col]
            ]
            raw_len = [len(r) for r in raws]
            comp_len = [len(zlib.compress(r, _LEVEL)) for r in raws]
            yield pd.DataFrame(
                {
                    "id": b[id_col],
                    "raw_len": raw_len,
                    "compressed_len": comp_len,
                    "compression_ratio": [
                        (c / r) if r else None for c, r in zip(comp_len, raw_len)
                    ],
                }
            )

    return (
        df.select(id_col, text_col)
        .mapInPandas(run, out_schema)
        .withColumnRenamed("id", id_col)
    )
