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


def contamination_report_bloom(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ngram_len: int = 5,
    n_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """:func:`contamination_report` with a Bloom pre-filter — the scale
    path once the benchmark gram universe outgrows a comfortable broadcast.

    Two phases, EXACT result (identical rows to the plain report,
    property-tested):

    1. a Bloom bitmap over the distinct benchmark grams compiles into a
       literal map-side predicate (operators/sketches.py); the corpus's
       exploded grams filter against it BEFORE any join — rows that cannot
       match never leave the scan stage, so the join input shrinks from
       every-gram-of-every-doc to (true hits + the ~(1-e^{-kn/m})^k false
       positives);
    2. the surviving grams run the same exact hash join against the
       benchmark set (false positives drop out here), and per-doc counts
       rejoin the (doc, n_grams) base so zero-hit and zero-gram documents
       still report.

    At 100 TB the bitmap is a few KB broadcast inside an expression while
    the pre-filter reject rate tracks the true contamination rate — the
    shuffle/probe volume reduction is the whole game. Size ``n_bits`` at
    ~10x the benchmark gram count for a ~2% false-positive tax.
    """
    from .sketches import bloom_build, bloom_compile, bloom_might_contain

    # the gram universe feeds BOTH the bitmap build (collected eagerly) and
    # the exact join — persist so the bench-side shingle pipeline runs once
    bench_grams = (
        bench.select(tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(shingles_from_tokens(F.col("__toks"), ngram_len)).alias("__g")
        )
        .distinct()
        .persist()
    )
    bitmap = bloom_compile(bloom_build(bench_grams, "__g", n_bits=n_bits, k=k))

    with_grams = train.select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.array_distinct(shingles_from_tokens(F.col("__toks"), ngram_len)).alias(
            "__grams"
        ),
    )
    # base feeds BOTH the survivor branch and the zero-hit rejoin; without a
    # persist the tokenize+shingle pipeline (the dominant per-doc cost) runs
    # twice. Same lifecycle policy as bench_grams above: the cache lives
    # until the session evicts or clears it.
    base = with_grams.select(
        id_col, F.size("__grams").cast("long").alias("n_grams"), "__grams"
    ).persist()
    survivors = (
        base.select(id_col, F.explode("__grams").alias("__g"))
        .filter(bloom_might_contain(bitmap, "__g", n_bits=n_bits, k=k))
        .join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    n_grams = F.col("n_grams")
    return (
        base.select(id_col, "n_grams")
        .join(survivors, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.when(n_grams == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / n_grams.cast("double")
            )
            .alias("contamination_rate"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )
