"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (n-gram overlap decontamination):
any training document containing an n-gram that also appears in a held-out
benchmark is flagged (and usually dropped) so eval scores measure
generalization, not memorization.

Spark-first shape
-----------------
The benchmark n-gram universe is small relative to the corpus (benchmarks
are MB-scale; the corpus is TB-scale), so the corpus-side check must be a
broadcast HASH join, not a per-row array probe:

1. distinct benchmark n-grams -> a small frame, broadcast once;
2. corpus docs explode their distinct n-grams (n_grams carried through the
   generator so short docs survive) and probe the broadcast hash relation —
   the benchmark set is built ONCE per task and each gram probes in O(1).
   A per-row ``array_intersect`` against a broadcast array was measured
   ~3x slower even at bench scale and degrades linearly in |bench| per ROW
   (1e7-gram benchmarks make it unusable); the hash join amortizes |bench|
   across the whole task.
3. ``groupBy(doc)`` rolls the hits back up: partial aggregation collapses
   each doc's grams map-side (explode preserves locality), so the only
   shuffle carries ONE compact row per document.

Past broadcastable benchmark sizes, put the Bloom pre-filter from
operators/sketches.py in front of the same join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_from_tokens, tokens


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ngram_len: int = 5,
) -> DataFrame:
    """Per-training-document contamination stats against ``bench``.

    Returns ``(id_col, n_grams, n_contaminated, contamination_rate,
    is_contaminated)`` — one row per training doc. ``n_grams`` counts the
    doc's DISTINCT n-grams; ``n_contaminated`` counts how many of those also
    occur anywhere in the benchmark set; rate is their ratio (0.0 for docs
    too short to have any n-gram).
    """
    bench_grams = (
        bench.select(tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(shingles_from_tokens(F.col("__toks"), ngram_len)).alias("__g")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # Staged projections, deliberately: tokens materialize first (the shingle
    # slice-lambda references an attribute, not a re-split per gram), the
    # gram array materializes next, its size is taken BEFORE the generator,
    # and the explode then references only attributes. Folding these into
    # one select would re-evaluate the whole shingle subtree per EXPLODED
    # row (measured ~30x slower) because generator-adjacent expressions are
    # pushed below/above the Generate, not shared with it.
    with_grams = train.select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.array_distinct(shingles_from_tokens(F.col("__toks"), ngram_len)).alias(
            "__grams"
        ),
    )
    sized = with_grams.select(
        id_col, F.size("__grams").alias("__n_grams"), "__grams"
    )
    exploded = sized.select(
        id_col, "__n_grams", F.explode_outer("__grams").alias("__g")
    )
    n_grams = F.col("__n_grams")
    hits = F.count("__hit")
    return (
        exploded.join(F.broadcast(bench_grams), "__g", "left")
        .groupBy(id_col, "__n_grams")
        .agg(hits.cast("long").alias("n_contaminated"))
        .select(
            id_col,
            n_grams.cast("long").alias("n_grams"),
            "n_contaminated",
            F.when(n_grams == 0, F.lit(0.0))
            .otherwise(
                F.col("n_contaminated").cast("double") / n_grams.cast("double")
            )
            .alias("contamination_rate"),
            (F.col("n_contaminated") > 0).alias("is_contaminated"),
        )
    )
