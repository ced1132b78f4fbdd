"""Training-data curation parity queries, round 5: repetition filters,
benchmark decontamination, sequence packing, source-mixture reweighting.

These extend the LLM-data-pipeline surface (SURVEY.md §8 north-star) with
the remaining staples of a pre-training data pipeline:

- ``ns_repetition_signals`` — Gopher-style duplicate-/top-n-gram fractions
  (the repetitive-text quality filter);
- ``ns_decontaminate`` — n-gram-overlap decontamination of the corpus
  against a benchmark set (broadcast, map-side);
- ``ns_pack_sequences`` — deterministic fixed-token-budget sequence packing
  (the training-data export layout);
- ``ns_source_mixture`` — temperature-based source reweighting (the
  multilingual/multi-domain mixture schedule).

Every oracle mirrors the Spark expression tree on DuckDB list/window
primitives with the shared md5 integer hash; doubles follow the registry
conventions (exact integer inputs, IEEE per-row arithmetic, decimal-cast
order-independent sums).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as tx
from ..operators.decontaminate import contamination_report
from ..operators.packing import pack_summary
from .registry import parity, table

# ns_curation_digest's oracle is assembled at decoration time from
# ALL_ORACLE_SQL entries that parity_text registers (ns_sample_stratified,
# ns_sample_exact_k, ns_dedup_survivor_policy) and parity_streaming
# registers (ns_stream_live_sinks) — import them first so this module is
# import-order self-contained.
from . import parity_streaming  # noqa: F401  (registers digest-member oracles)
from . import parity_text  # noqa: F401  (registers digest-member oracles)

_TOKS = "string_split(lower(text), ' ')"


def _sh(n: int, toks: str = "toks") -> str:
    """DuckDB word n-gram shingles (mirrors functions.text.shingles)."""
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        "ELSE [] END"
    )


def _rep_cols(n: int) -> str:
    """DuckDB twin of functions.text.ngram_repetition_stats for one n."""
    ng = f"ng{n}"
    return f"""
           CAST(CASE WHEN len({ng}) = 0 THEN 0 ELSE len({ng}) END AS BIGINT)
               AS n_{n}grams,
           CASE WHEN len({ng}) = 0 THEN 0.0
                ELSE CAST(len({ng}) - len(list_distinct({ng})) AS DOUBLE)
                     / CAST(len({ng}) AS DOUBLE) END AS dup_{n}gram_frac,
           CASE WHEN len({ng}) = 0 THEN 0.0
                ELSE CAST(list_max(list_transform(list_distinct({ng}),
                          d -> len(list_filter({ng}, x -> x = d)))) AS DOUBLE)
                     / CAST(len({ng}) AS DOUBLE) END AS top_{n}gram_frac"""


@parity(
    "ns_repetition_signals",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
        SELECT doc_id, {_sh(2)} AS ng2, {_sh(3)} AS ng3 FROM toks
    ),
    sig AS (
        SELECT doc_id, {_rep_cols(2)}, {_rep_cols(3)}
        FROM grams
    )
    SELECT *, (top_2gram_frac > 0.08 OR dup_3gram_frac > 0.01) AS repetitive
    FROM sig
    """,
)
def ns_repetition_signals(spark, sf_dir):
    """Per-document repetition filter signals: duplicate- and top-n-gram
    fractions for n in {2, 3} plus the composed repetitive flag. Pure
    map-side higher-order array ops — zero shuffle at any scale. Gram
    arrays are projected as real columns first so the shingle subtree is
    computed once per row, not once per lambda reference (see
    functions.text.ngram_repetition_stats)."""
    d = table(spark, sf_dir, "documents")
    grams = d.select("doc_id", tx.tokens(F.col("text")).alias("toks")).select(
        "doc_id",
        tx.shingles_from_tokens(F.col("toks"), 2).alias("ng2"),
        tx.shingles_from_tokens(F.col("toks"), 3).alias("ng3"),
    )
    folded = grams.select(
        "doc_id",
        tx.repetition_fold(F.col("ng2")).alias("f2"),
        tx.repetition_fold(F.col("ng3")).alias("f3"),
    )
    r2 = tx.repetition_fracs(F.col("f2"))
    r3 = tx.repetition_fracs(F.col("f3"))
    return folded.select(
        "doc_id",
        r2["n_ngrams"].alias("n_2grams"),
        r2["dup_frac"].alias("dup_2gram_frac"),
        r2["top_frac"].alias("top_2gram_frac"),
        r3["n_ngrams"].alias("n_3grams"),
        r3["dup_frac"].alias("dup_3gram_frac"),
        r3["top_frac"].alias("top_3gram_frac"),
        ((F.col("top_2gram_frac") > 0.08) | (F.col("dup_3gram_frac") > 0.01)).alias(
            "repetitive"
        ),
    )


# Synthetic contamination: benchmark = every 37th doc; the training side is
# everything else PLUS verbatim copies (full contamination) and 8-token
# prefixes with an unrelated tail (partial contamination), so the report has
# non-trivial rates at every level that the oracle must reproduce exactly.
_DECON_TRAIN = f"""
    SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0
    UNION ALL
    SELECT doc_id + 200000, text FROM documents
    WHERE doc_id % 37 = 0 AND doc_id < 200
    UNION ALL
    SELECT doc_id + 300000,
           array_to_string(({_TOKS})[1:8], ' ') || ' qq ww ee rr tt yy uu ii'
    FROM documents WHERE doc_id % 37 = 0 AND doc_id < 100
"""


def _decon_frames(spark, sf_dir):
    """The synthetic train/bench split shared by both decontamination
    queries (full + partial contamination injected in-query).

    The train side repartitions first: 5-gram shingling + the md5 probe are
    CPU-bound and the fixture parquet is one row group (an unsplittable
    single-core scan locally); at real scale the corpus arrives in
    thousands of row groups (same concession as parity_text._docs2)."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bench = d.filter(F.col("doc_id") % 37 == 0)
    toks = tx.tokens(F.col("text"))
    train = (
        d.filter(F.col("doc_id") % 37 != 0)
        .unionByName(
            bench.filter(F.col("doc_id") < 200).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            bench.filter(F.col("doc_id") < 100).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.concat(
                    F.array_join(F.slice(toks, 1, 8), " "),
                    F.lit(" qq ww ee rr tt yy uu ii"),
                ).alias("text"),
            )
        )
    )
    return train, bench


_DECON_ORACLE = f"""
    WITH train AS ({_DECON_TRAIN}),
    ttoks AS (SELECT doc_id, {_TOKS} AS toks FROM train),
    tg AS (SELECT doc_id, list_distinct({_sh(5)}) AS grams FROM ttoks),
    btoks AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id % 37 = 0
    ),
    bg AS (SELECT DISTINCT UNNEST({_sh(5)}) AS g FROM btoks),
    ex AS (SELECT doc_id, UNNEST(grams) AS g FROM tg),
    hit AS (
        SELECT doc_id, COUNT(*) AS n_hits FROM ex JOIN bg USING (g)
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE CAST(COALESCE(n_hits, 0) AS DOUBLE)
                     / CAST(len(grams) AS DOUBLE) END AS contamination_rate,
           COALESCE(n_hits, 0) > 0 AS is_contaminated
    FROM tg t LEFT JOIN hit USING (doc_id)
    """


@parity(
    "ns_decontaminate",
    driver=False,  # driver slot: folded into ns_decontaminate_modes
    oracle=_DECON_ORACLE,
)
def ns_decontaminate(spark, sf_dir):
    """5-gram benchmark decontamination over the synthetic train/bench
    split: per training doc, how many of its distinct 5-grams appear in the
    benchmark set. Broadcast hash join of the exploded distinct-gram sets
    against the benchmark gram universe, with map-side partial counting —
    one compact (doc, n_hits) row per document shuffles, never the grams
    (operators/decontaminate.py module doc)."""
    train, bench = _decon_frames(spark, sf_dir)
    return contamination_report(train, bench, "doc_id", "text", ngram_len=5)


@parity(
    "ns_decontaminate_bloom",
    driver=False,  # driver slot: folded into ns_decontaminate_modes
    oracle=_DECON_ORACLE,
)
def ns_decontaminate_bloom(spark, sf_dir):
    """The Bloom-prefiltered decontamination path (the design for benchmark
    gram universes past broadcast size): a literal-map Bloom predicate
    rejects non-matching grams map-side before the exact join, which then
    removes the false positives — same oracle as ns_decontaminate because
    the result is exact by construction."""
    from ..operators.decontaminate import contamination_report_bloom

    train, bench = _decon_frames(spark, sf_dir)
    # k=2 halves the per-gram md5 work; with n_bits=16384 over the ~1.5k
    # benchmark grams the false-positive rate stays ~3%, and exactness
    # never depends on it
    return contamination_report_bloom(
        train, bench, "doc_id", "text", ngram_len=5, n_bits=1 << 14, k=2
    )


_DECON_DIGEST = [
    (
        "ns_decontaminate",
        [
            ("doc_id", "s"), ("n_grams", "s"), ("n_contaminated", "s"),
            ("contamination_rate", "d"), ("is_contaminated", "s"),
        ],
    ),
    (
        "ns_decontaminate_bloom",
        [
            ("doc_id", "s"), ("n_grams", "s"), ("n_contaminated", "s"),
            ("contamination_rate", "d"), ("is_contaminated", "s"),
        ],
    ),
]


def _decon_modes_oracle() -> str:
    from .registry import digest_union_oracle

    return digest_union_oracle(_DECON_DIGEST)


@parity("ns_decontaminate_modes", oracle=_decon_modes_oracle())
def ns_decontaminate_modes(spark, sf_dir):
    """Benchmark decontamination both ways in one driver slot: the
    broadcast exact-join baseline AND the Bloom-prefiltered scale path
    (map-side literal predicate rejects non-benchmark grams before the
    exact join). Both share one oracle — the Bloom path is exact by
    construction — so two green digest rows certify the prefilter never
    changes results."""
    from .registry import digest_union

    return digest_union(spark, sf_dir, _DECON_DIGEST)


_PACK_BUDGET = 512
_PACK_SHARDS = 4
_BPE = "list_sum(list_transform(toks, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))"

# shared by the packing oracle and the export-manifest oracle: per-document
# token counts, md5 shard, and the exclusive prefix-sum token offset
_PACK_CTES = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (
        SELECT doc_id,
               CAST({_BPE} AS BIGINT) AS tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % {_PACK_SHARDS} AS shard
        FROM toks
    ),
    off AS (
        SELECT *,
               COALESCE(SUM(tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS token_offset
        FROM tok
    )
"""


@parity(
    "ns_pack_sequences",
    driver=False,  # driver slot: folded into ns_pack_export_digest
    oracle=f"""
    {_PACK_CTES}
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(token_offset // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS tokens_packed,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM off
    GROUP BY 1, 2
    """,
)
def ns_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing of the corpus into 512-token training
    sequences across 4 md5 shards — per-(shard, seq) manifest. Window cumsum
    and rollup share ONE shuffle (plan-asserted in tests/test_curation.py)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", tx.bpe_ish_token_count(F.col("text")).alias("tokens")
    )
    return pack_summary(
        d, "doc_id", "tokens", budget=_PACK_BUDGET, num_shards=_PACK_SHARDS
    )


# Export-manifest oracle: what export_shards' read-back manifest must say,
# derived purely from the packing assignment (the writer adds no rows).
_EXPORT_MANIFEST_SQL = f"""
    {_PACK_CTES}
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT token_offset // {_PACK_BUDGET}) AS BIGINT)
               AS n_sequences,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM off
    GROUP BY 1
"""

_PACK_DIGEST_COLS = [
    ("shard", "s"), ("seq_id", "s"), ("n_docs", "s"),
    ("tokens_packed", "s"), ("first_doc", "s"), ("last_doc", "s"),
]
_MANIFEST_DIGEST_COLS = [
    ("shard", "s"), ("n_docs", "s"), ("n_tokens", "s"),
    ("n_sequences", "s"), ("first_doc", "s"), ("last_doc", "s"),
]



_MIXTURE_PPM = {
    **{f"src{i}": 2_250_000 for i in range(5)},     # 2.25 epochs: upweighted
    **{f"src{i}": 1_000_000 for i in range(5, 10)},  # 1 epoch: as-is
    **{f"src{i}": 400_000 for i in range(10, 15)},   # 0.4 epoch: downsampled
    # src15..src19 absent -> dropped
}

_MIXTURE_RATES_SQL = ", ".join(
    f"('{s}', {ppm})" for s, ppm in sorted(_MIXTURE_PPM.items())
)


@parity(
    "ns_apply_mixture",
    driver=False,  # driver slot: folded into ns_pack_export_digest
    oracle=f"""
    WITH rates(source, ppm) AS (VALUES {_MIXTURE_RATES_SQL}),
    d AS (
        SELECT doc_id, documents.source, ppm,
               (ppm // 1000000)
               + CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))::BIGINT
                            % 1000000) < (ppm % 1000000)
                      THEN 1 ELSE 0 END AS copies
        FROM documents JOIN rates ON documents.source = rates.source
    )
    SELECT doc_id, source, CAST(t.i AS BIGINT) AS copy_idx
    FROM d, UNNEST(generate_series(0, copies - 1)) AS t(i)
    WHERE copies > 0
    """,
)
def ns_apply_mixture(spark, sf_dir):
    """Materialize a training-source mixture (operators/mixture.py):
    upweighted sources replicate (integer epochs), downsampled sources keep
    the md5-bucket fraction, absent sources drop — the APPLY step for the
    reweighting ns_source_mixture computes. Deterministic (no RNG), zero
    shuffle, fan-out = output size."""
    from ..operators.mixture import apply_source_mixture

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return apply_source_mixture(docs, "doc_id", "source", _MIXTURE_PPM).select(
        "doc_id", "source", F.col("copy_idx").cast("long").alias("copy_idx")
    )


def _pack_export_oracle() -> str:
    from .registry import ALL_ORACLE_SQL, digest_sql

    return (
        digest_sql("ns_pack_sequences", ALL_ORACLE_SQL["ns_pack_sequences"], _PACK_DIGEST_COLS)
        + "\nUNION ALL\n"
        + digest_sql("ns_export_shards", _EXPORT_MANIFEST_SQL, _MANIFEST_DIGEST_COLS)
        + "\nUNION ALL\n"
        # JSONL writer: identical manifest contract, distinct physical path
        + digest_sql(
            "ns_export_shards_jsonl", _EXPORT_MANIFEST_SQL, _MANIFEST_DIGEST_COLS
        )
        + "\nUNION ALL\n"
        + digest_sql(
            "ns_apply_mixture",
            ALL_ORACLE_SQL["ns_apply_mixture"],
            [("doc_id", "s"), ("source", "s"), ("copy_idx", "s")],
        )
    )


@parity("ns_pack_export_digest", oracle=_pack_export_oracle())
def ns_pack_export_digest(spark, sf_dir):
    """Sequence packing AND the training-shard export writer in one driver
    slot, each content-checksummed (registry.digest_frame): the per-(shard,
    seq) packing manifest, plus operators/export.py export_shards run
    against a scratch directory with its manifest derived from the data
    READ BACK off disk — so the digest certifies the physical write path
    (one file per shard, packing order, corpus preserved), not just the
    plan."""
    import shutil
    import tempfile

    from ..operators.export import export_shards, export_shards_jsonl
    from .registry import ALL_QUERIES, digest_frame

    pack = ALL_QUERIES["ns_pack_sequences"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", tx.bpe_ish_token_count(F.col("text")).alias("tokens")
    )
    cols = ["shard", "n_docs", "n_tokens", "n_sequences", "first_doc", "last_doc"]

    def _materialized_manifest(manifest):
        # Pin the (shard-count-sized) manifest rows so the scratch export
        # directory can be deleted immediately — repeated driver/bench
        # invocations previously leaked one full shard export per call.
        return spark.createDataFrame(manifest.select(*cols).collect(), cols)

    out_dir = tempfile.mkdtemp(prefix="fincan_export_digest_")
    try:
        manifest = _materialized_manifest(
            export_shards(
                docs.drop("text"), "doc_id", "tokens", out_dir,
                budget=_PACK_BUDGET, num_shards=_PACK_SHARDS,
            )
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    jsonl_dir = tempfile.mkdtemp(prefix="fincan_export_jsonl_digest_")
    try:
        jsonl = _materialized_manifest(
            export_shards_jsonl(
                docs, "doc_id", "tokens", "text", jsonl_dir,
                budget=_PACK_BUDGET, num_shards=_PACK_SHARDS,
            )
        )
    finally:
        shutil.rmtree(jsonl_dir, ignore_errors=True)
    return (
        digest_frame(pack, "ns_pack_sequences")
        .unionByName(digest_frame(manifest, "ns_export_shards"))
        .unionByName(digest_frame(jsonl, "ns_export_shards_jsonl"))
        .unionByName(
            digest_frame(
                ALL_QUERIES["ns_apply_mixture"](spark, sf_dir), "ns_apply_mixture"
            )
        )
    )


@parity(
    "ns_source_mixture",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({_BPE}) AS BIGINT) AS n_tokens
        FROM toks GROUP BY source
    ),
    shares AS (
        SELECT *,
               CAST(n_tokens AS DOUBLE)
                   / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
        FROM per_src
    ),
    weighted AS (
        SELECT *,
               sqrt(token_share) AS w,
               CAST(SUM(CAST(sqrt(token_share) AS DECIMAL(18,9))) OVER ()
                    AS DOUBLE) AS w_sum
        FROM shares
    )
    SELECT source, n_docs, n_tokens, token_share,
           w / w_sum AS sample_prob,
           (w / w_sum) / token_share AS epochs
    FROM weighted
    """,
)
def ns_source_mixture(spark, sf_dir):
    """Temperature-based source-mixture reweighting (alpha = 0.5): per
    source, token share p, adjusted sampling probability q = sqrt(p) /
    sum(sqrt(p)), and epochs = q / p — the multinomial mixture schedule of
    multilingual/multi-domain pre-training. sqrt is IEEE-correctly-rounded
    in both engines; the cross-source normalizer sums DECIMAL(18,9)-cast
    weights (order-independent exact) per the registry convention. The
    whole-frame window runs over #sources rows (one per source) — a
    single-partition window over a handful of rows, never over data."""
    d = table(spark, sf_dir, "documents").select(
        "source", tx.bpe_ish_token_count(F.col("text")).alias("tokens")
    )
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tokens").cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all).cast(
        "double"
    )
    shares = per_src.withColumn("token_share", share)
    w = F.sqrt(F.col("token_share"))
    w_sum = (
        F.sum(w.cast("decimal(18,9)")).over(w_all).cast("double")
    )
    return shares.select(
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        (w / w_sum).alias("sample_prob"),
        ((w / w_sum) / F.col("token_share")).alias("epochs"),
    )


@parity(
    "ns_source_token_divergence",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""
    WITH toks AS (
        SELECT source, UNNEST({_TOKS}) AS token FROM documents
    ),
    st AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks GROUP BY 1, 2
    ),
    corpus AS (
        SELECT token, CAST(SUM(cnt) AS BIGINT) AS ccnt FROM st GROUP BY 1
    ),
    stot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS stotal FROM st GROUP BY 1),
    ctot AS (SELECT CAST(SUM(ccnt) AS BIGINT) AS ctotal FROM corpus),
    grid AS (
        SELECT s.source, c.token, c.ccnt, s.stotal, t.ctotal,
               COALESCE(st.cnt, 0) AS scnt
        FROM stot s CROSS JOIN corpus c CROSS JOIN ctot t
        LEFT JOIN st ON st.source = s.source AND st.token = c.token
    )
    SELECT source,
           CAST(MAX(stotal) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN scnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_seen,
           CAST(COUNT(*) AS BIGINT) AS vocab_corpus,
           CAST(SUM(CAST(abs((CAST(scnt AS DOUBLE) / CAST(stotal AS DOUBLE))
                             - (CAST(ccnt AS DOUBLE) / CAST(ctotal AS DOUBLE)))
                        AS DECIMAL(18,6))) AS DOUBLE)
               * CAST(0.5 AS DOUBLE) AS tv_distance
    FROM grid GROUP BY 1
    """,
)
def ns_source_token_divergence(spark, sf_dir):
    """Per-source token-distribution drift: total-variation distance
    between each source's unigram distribution and the corpus distribution
    — the source-mixture health check of a curation pipeline (a source
    whose vocabulary drifts from the blend gets re-weighted or audited).

    One (source, token) groupBy is the only corpus-wide shuffle; the
    corpus distribution re-aggregates FROM that vocabulary-sized frame,
    and the per-source grid is sources x corpus-vocab (both tiny relative
    to any corpus — broadcast-joined). Per-token |q - p| pins through
    DECIMAL(18,6) before the sum, so the double is order-insensitive and
    cross-engine exact."""
    d = table(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(tx.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    corpus = st.groupBy("token").agg(F.sum("cnt").cast("long").alias("ccnt"))
    stot = st.groupBy("source").agg(F.sum("cnt").cast("long").alias("stotal"))
    ctot = corpus.agg(F.sum("ccnt").cast("long").alias("ctotal"))
    grid = (
        stot.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(ctot))
        .join(F.broadcast(st), ["source", "token"], "left")
        .withColumn("scnt", F.coalesce("cnt", F.lit(0)))
    )
    diff = F.abs(
        (F.col("scnt").cast("double") / F.col("stotal").cast("double"))
        - (F.col("ccnt").cast("double") / F.col("ctotal").cast("double"))
    )
    return grid.groupBy("source").agg(
        F.max("stotal").cast("long").alias("n_tokens"),
        F.sum((F.col("scnt") > 0).cast("int")).cast("long").alias("vocab_seen"),
        F.count(F.lit(1)).cast("long").alias("vocab_corpus"),
        (
            F.sum(diff.cast("decimal(18,6)")).cast("double") * F.lit(0.5)
        ).alias("tv_distance"),
    )


# DSIR-shaped importance weighting (operators/importance.py): target =
# English docs with doc_id % 5 = 0 (a deterministic "clean corpus" proxy),
# raw = everything else; 2-gram features hashed into 2^16 buckets.
_IMP_BITS = 16
_IMP_B = 1 << _IMP_BITS
_IMP_IS_TARGET = "(COALESCE(lang, '') = 'en' AND doc_id % 5 = 0)"


@parity(
    "ns_importance_weights",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_IMP_IS_TARGET} AS is_target, {_TOKS} AS toks
        FROM documents
    ),
    f AS (
        SELECT doc_id, is_target,
               (('0x' || substr(md5(g), 1, 15))::BIGINT % {_IMP_B}) AS bucket
        FROM (SELECT doc_id, is_target, UNNEST({_sh(2)}) AS g FROM toks)
    ),
    tgt AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_cnt
        FROM f WHERE is_target GROUP BY 1
    ),
    ttot AS (SELECT CAST(COALESCE(SUM(t_cnt), 0) AS BIGINT) AS t_total FROM tgt),
    rawf AS (SELECT doc_id, bucket FROM f WHERE NOT is_target),
    rtab AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM rawf GROUP BY 1
    ),
    rtot AS (SELECT CAST(SUM(r_cnt) AS BIGINT) AS r_total FROM rtab),
    ratios AS (
        SELECT r.bucket, COALESCE(t.t_cnt, 0) AS t_cnt, r.r_cnt,
               (CAST(COALESCE(t.t_cnt, 0) + 1 AS DOUBLE)
                    / CAST(tt.t_total + {_IMP_B} AS DOUBLE))
               / (CAST(r.r_cnt + 1 AS DOUBLE)
                    / CAST(rt.r_total + {_IMP_B} AS DOUBLE)) AS ratio
        FROM rtab r LEFT JOIN tgt t USING (bucket)
        CROSS JOIN ttot tt CROSS JOIN rtot rt
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(t_cnt) AS BIGINT) AS sum_target_cnt,
           CAST(SUM(r_cnt) AS BIGINT) AS sum_raw_cnt,
           CAST(CAST(CAST(SUM(CAST(ratio AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS DECIMAL(28,6)) AS DOUBLE)
               AS mean_ratio
    FROM rawf JOIN ratios USING (bucket)
    GROUP BY 1
    """,
)
def ns_importance_weights(spark, sf_dir):
    """DSIR-shaped data selection: per raw document, the mean smoothed
    probability ratio of its hashed 2-gram features under the target
    corpus vs the raw corpus (higher = more target-like; the resampling
    weight of importance-resampling data selection). Feature tables are
    bounded by the 2^16 hash space and broadcast; the raw side shuffles
    once for the per-doc aggregate. Per-feature ratios pin through
    DECIMAL(38,12) before the order-insensitive sum, and the mean_ratio
    quotient pins at DECIMAL(28,6) — sum-at-12/pin-output-at-6, the
    embedding_stats discipline (38-digit per-row precision = 26 integer
    digits of headroom: the smoothed ratio is bounded only by
    ~(r_total+B)/2, which overflows 16 integer digits at 100TB n-gram
    counts and would NULL out under Spark non-ANSI); the production
    log-likelihood-ratio score (``log_weight=True``) stays off the
    hash-checked surface (ln is not cross-engine bit-pinned)."""
    from ..operators.importance import importance_weights

    d = table(spark, sf_dir, "documents")
    is_target = (F.coalesce(F.col("lang"), F.lit("")) == "en") & (
        F.col("doc_id") % 5 == 0
    )
    return importance_weights(
        d.filter(~is_target),
        d.filter(is_target),
        "doc_id",
        "text",
        shingle_len=2,
        hash_bits=_IMP_BITS,
    )


# --------------------------------------------------------------------------
# Curation digest composite: one driver slot certifying the full result
# sets of four previously-standalone curation probes (round-7 window
# headroom — the driver verifies only the first 50 oracle-paired entries,
# and the window was 50/50 full in r6) plus the round-7 DSIR importance
# weights.
# --------------------------------------------------------------------------

_CURATION_DIGEST = [
    (
        "ns_repetition_signals",
        [
            ("doc_id", "s"),
            ("n_2grams", "s"), ("dup_2gram_frac", "d"), ("top_2gram_frac", "d"),
            ("n_3grams", "s"), ("dup_3gram_frac", "d"), ("top_3gram_frac", "d"),
            ("repetitive", "s"),
        ],
    ),
    (
        "ns_sample_stratified",
        [
            ("lang", "s"), ("sampled_docs", "s"),
            ("min_doc_id", "s"), ("max_doc_id", "s"),
        ],
    ),
    (
        "ns_source_mixture",
        [
            ("source", "s"), ("n_docs", "s"), ("n_tokens", "s"),
            ("token_share", "d"), ("sample_prob", "d"), ("epochs", "d"),
        ],
    ),
    (
        "ns_source_token_divergence",
        [
            ("source", "s"), ("n_tokens", "s"), ("vocab_seen", "s"),
            ("vocab_corpus", "s"), ("tv_distance", "d"),
        ],
    ),
    (
        "ns_importance_weights",
        [
            ("doc_id", "s"), ("n_features", "s"), ("sum_target_cnt", "s"),
            ("sum_raw_cnt", "s"), ("mean_ratio", "d"),
        ],
    ),
    (
        "ns_dedup_survivor_policy",
        [
            ("doc_id", "s"), ("component_id", "s"), ("score", "s"),
            ("survivor_id", "s"), ("is_kept", "s"),
        ],
    ),
    ("ns_sample_exact_k", [("lang", "s"), ("doc_id", "s")]),
    (
        "ns_stream_live_sinks",
        [("kind", "s"), ("k1", "s"), ("k2", "s"), ("v", "s")],
    ),
    # the forced mid-drain rebucket crossing, certified separately from
    # the steady-state sink economics (VERDICT r14 next-step #1)
    (
        "ns_stream_rebucket_drain",
        [("chunk_hash", "s"), ("doc_freq", "s")],
    ),
]


def _curation_digest_oracle() -> str:
    from .registry import digest_union_oracle

    return digest_union_oracle(_CURATION_DIGEST)


@parity("ns_curation_digest", oracle=_curation_digest_oracle())
def ns_curation_digest(spark, sf_dir):
    """Curation family in one driver slot: per-doc repetition signals
    (Gopher), deterministic stratified sampling, temperature-based source
    mixture, and per-source token-distribution divergence — each member
    probe's full result set content-checksummed identically in Spark and
    DuckDB (registry.digest_frame / digest_sql)."""
    from .registry import digest_union

    return digest_union(spark, sf_dir, _CURATION_DIGEST)
