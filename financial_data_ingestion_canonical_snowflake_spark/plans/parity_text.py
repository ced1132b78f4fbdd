"""North-star text-operator parity queries (dedup + text analysis).

Each query pairs the engine operator (operators/text_dedup.py,
functions/text.py) with a DuckDB oracle built on the SAME primitives:
md5-prefix integer hashes, whitespace tokens, word-shingles, and fixed
MinHash/LSH parameters inlined into both sides. Documents get synthetic
near-duplicates appended in-query (the driver's corpus has none) so the
dedup operators produce non-trivial matches that the oracle must agree on.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as tx
from ..operators import text_dedup as td
from .registry import SYNTH_ID_OFFSET, parity, table

P31 = tx.MERSENNE31
FP_P = tx.FP_PRIME
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
MINHASH_PARAMS = td.minhash_params(NUM_HASHES)


def _md5h(expr: str, p: int) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {p})"


_TOKS = "string_split(lower(text), ' ')"
# word 3-gram shingles (matches functions.text.shingles semantics)
_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> array_to_string(toks[i:i+2], ' ')) "
    "ELSE [] END"
)
_SIG_ELEMS = ", ".join(
    f"COALESCE(list_min(list_transform(hs, h -> ({a} * h + {b}) % {P31})), {P31})"
    for a, b in MINHASH_PARAMS
)

# documents + synthetic near-duplicates (id + SYNTH_ID_OFFSET, two tokens
# appended — the offset sits beyond any fixture id domain; the old +100000
# collided with real doc_ids at sf >= 2, see registry.SYNTH_ID_OFFSET)
_DOCS2 = (
    "SELECT doc_id, text FROM documents "
    f"UNION ALL SELECT doc_id + {SYNTH_ID_OFFSET}, text || ' zz yy' "
    "FROM documents WHERE doc_id < 50"
)


def _docs2(spark, sf_dir):
    # The docs parquet is one small file -> 1-2 input splits; the hash-heavy
    # dedup operators are CPU-bound, so spread rows across all cores first
    # (at real scale the input arrives already well-partitioned).
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    dups = (
        d.filter(F.col("doc_id") < 50)
        .select(
            (F.col("doc_id") + SYNTH_ID_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
        )
    )
    return d.unionByName(dups)


# --------------------------------------------------------------------------


@parity(
    "ns_dedup_exact",
    oracle=f"""
    WITH docs2 AS ({_DOCS2})
    SELECT sha256(text) AS content_hash, MIN(doc_id) AS survivor_id,
           COUNT(*) AS dup_cnt
    FROM docs2 GROUP BY 1
    """,
)
def ns_dedup_exact(spark, sf_dir):
    """Exact content-hash dedup (groupBy sha-256; one shuffle)."""
    return td.exact_dedup(_docs2(spark, sf_dir), "doc_id", "text")


@parity(
    "ns_dedup_minhash_lsh",
    driver=False,  # driver slot: folded into ns_dedup_minhash_lsh_modes
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    hashed AS (
        SELECT doc_id,
               list_transform({_SHINGLES}, s -> {_md5h('s', P31)}) AS hs
        FROM toks
    ),
    sigs AS (SELECT doc_id AS doc, [{_SIG_ELEMS}] AS sig FROM hashed),
    banded AS (
        SELECT doc, sig, b.band,
               array_to_string(sig[b.band * {ROWS_PER_BAND} + 1 : b.band * {ROWS_PER_BAND} + {ROWS_PER_BAND}], '-') AS band_key
        FROM sigs, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
    ),
    pairs AS (
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b, a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b USING (band, band_key)
        WHERE a.doc < b.doc
    ),
    scored AS (
        SELECT id_a, id_b,
               CAST(list_sum(list_transform(generate_series(1, {NUM_HASHES}),
                    i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS BIGINT)
                   AS matching_minhashes
        FROM pairs
    )
    SELECT * FROM scored WHERE matching_minhashes >= 8
    """,
)
def ns_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (shingle->minhash->band->bucket
    equi-join; no quadratic pass)."""
    return td.minhash_lsh_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        num_hashes=NUM_HASHES, bands=BANDS, min_matching=8,
    )


# Incremental-dedup split of docs2: the "new batch" is every synthetic dup
# plus the first 25 originals, so the incremental bucket join has new-vs-new
# pairs (dup of doc < 25 against its original, both new) AND new-vs-corpus
# pairs (dup of doc in [25, 50) against its corpus-side original).
_NEW_PRED_SQL = f"(id >= {SYNTH_ID_OFFSET} OR id < 25)"


def _new_pred(col):
    return (col >= SYNTH_ID_OFFSET) | (col < 25)


def _minhash_modes_oracle() -> str:
    from .registry import ALL_ORACLE_SQL

    full = ALL_ORACLE_SQL["ns_dedup_minhash_lsh"]
    incr_where = " OR ".join(
        _NEW_PRED_SQL.replace("id ", f"{c} ") for c in ("id_a", "id_b")
    )
    return (
        f"SELECT 'full' AS mode, id_a, id_b, matching_minhashes FROM ({full}) __full"
        "\nUNION ALL\n"
        f"SELECT 'incremental' AS mode, id_a, id_b, matching_minhashes "
        f"FROM ({full}) __incr WHERE {incr_where}"
    )


@parity("ns_dedup_minhash_lsh_modes", oracle=_minhash_modes_oracle())
def ns_dedup_minhash_lsh_modes(spark, sf_dir):
    """MinHash-LSH dedup both ways in one driver slot: the full corpus
    self-join AND the incremental batch path (new-batch signatures joined
    against a persisted corpus signature table, operators/text_dedup.py
    minhash_lsh_pairs_incremental). The incremental oracle is the full
    pair set restricted to pairs involving a new-batch doc — value-hash
    equality certifies the batch-wise path reproduces exactly the full
    self-join's new-involving pairs (the invariant that lets a 100 TB
    corpus dedup per-batch instead of re-self-joining)."""
    from .registry import ALL_QUERIES

    full = ALL_QUERIES["ns_dedup_minhash_lsh"](spark, sf_dir).select(
        F.lit("full").alias("mode"), "id_a", "id_b", "matching_minhashes"
    )
    docs = _docs2(spark, sf_dir)
    new_sigs = td.minhash_signatures(
        docs.filter(_new_pred(F.col("doc_id"))), "doc_id", "text",
        num_hashes=NUM_HASHES,
    )
    corpus_sigs = td.minhash_signatures(
        docs.filter(~_new_pred(F.col("doc_id"))), "doc_id", "text",
        num_hashes=NUM_HASHES,
    )
    incr = td.minhash_lsh_pairs_incremental(
        new_sigs, corpus_sigs, num_hashes=NUM_HASHES, bands=BANDS, min_matching=8
    ).select(F.lit("incremental").alias("mode"), "id_a", "id_b", "matching_minhashes")
    return full.unionByName(incr)


@parity(
    "ns_dedup_simhash",
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    hashed AS (
        SELECT doc_id AS doc,
               list_transform({_TOKS}, t -> {_md5h('t', P31)}) AS hs
        FROM docs2
    ),
    sims AS (
        SELECT doc,
               CAST(list_sum(list_transform(generate_series(0, 31), b ->
                    CASE WHEN list_sum(list_transform(hs,
                         h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
        FROM hashed
    ),
    bucketed AS (SELECT doc, simhash, simhash >> 24 AS bucket FROM sims)
    SELECT a.doc AS id_a, b.doc AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bucketed a JOIN bucketed b USING (bucket)
    WHERE a.doc < b.doc AND bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def ns_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs, prefix-bucketed (fixed 8 bits), hamming <= 6."""
    return td.simhash_pairs(
        _docs2(spark, sf_dir), "doc_id", "text", max_hamming=6, prefix_bits=8
    )


# adaptive_prefix_bits mirror: smallest b in [8, 24] with 256*2^b >= n —
# an integer threshold CASE (the adaptive_num_planes oracle discipline)
_SQL_ADAPTIVE_BITS = (
    "CASE "
    + " ".join(
        f"WHEN n <= {256 << j} THEN {j}" for j in range(8, 24)
    )
    + " ELSE 24 END"
)


@parity(
    "ns_dedup_simhash_adaptive",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    bits_t AS (
        SELECT {_SQL_ADAPTIVE_BITS} AS bits
        FROM (SELECT COUNT(*) AS n FROM ({_DOCS2}) __c) __cnt
    ),
    hashed AS (
        SELECT doc_id AS doc,
               list_transform({_TOKS}, t -> {_md5h('t', P31)}) AS hs
        FROM docs2
    ),
    sims AS (
        SELECT doc,
               CAST(list_sum(list_transform(generate_series(0, 31), b ->
                    CASE WHEN list_sum(list_transform(hs,
                         h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
        FROM hashed
    ),
    bucketed AS (
        SELECT doc, simhash, simhash >> (32 - (SELECT bits FROM bits_t)) AS bucket
        FROM sims
    )
    SELECT a.doc AS id_a, b.doc AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bucketed a JOIN bucketed b USING (bucket)
    WHERE a.doc < b.doc AND bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def ns_dedup_simhash_adaptive(spark, sf_dir):
    """SimHash pairs through the PRODUCTION default
    (``prefix_bits="adaptive"``): the bucket prefix derives from the
    corpus count — smallest b in [8, 24] with 256*2^b >= n
    (operators/text_dedup.py adaptive_prefix_bits) — mirrored in the
    oracle as an integer threshold CASE over its own COUNT(*). A fixed
    prefix keeps 2^8 buckets whose width grows with the corpus (the
    within-bucket join then quadratic: measured 7.18x cost for 3.33x
    data at sf3->sf10, BENCH_SF3.json); the adaptive prefix holds
    bucket width ~256 at any scale."""
    return td.simhash_pairs(
        _docs2(spark, sf_dir), "doc_id", "text", max_hamming=6,
        prefix_bits="adaptive",
    )


@parity(
    "ns_dedup_ngram_jaccard",
    driver=False,  # driver slot: folded into ns_dedup_ngram_jaccard_modes
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    sh AS (
        SELECT DISTINCT doc_id AS doc, UNNEST({_SHINGLES}) AS shingle FROM toks
    ),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
    common AS (
        SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc < b.doc
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.6
    """,
)
def ns_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs via shared-shingle equi-join.

    ``max_shingle_freq=None`` opts out of the (default-on) stop-shingle cap
    because THIS oracle is the uncapped exact join; the capped twin is
    ``ns_dedup_ngram_jaccard_capped``."""
    return td.ngram_jaccard_pairs(
        _docs2(spark, sf_dir), "doc_id", "text", shingle_len=3, min_jaccard=0.6,
        max_shingle_freq=None,
    )


# --------------------------------------------------------------------------

_STOP_EN = ", ".join(f"'{w}'" for w in tx.STOPWORDS_EN)
_STOP_ES = ", ".join(f"'{w}'" for w in tx.STOPWORDS_ES)
_STOP_DE = ", ".join(f"'{w}'" for w in tx.STOPWORDS_DE)


@parity(
    "ns_text_quality_stats",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE) AS alpha_ratio,
           CAST(len(list_filter(toks, t -> t IN ({_STOP_EN})))
              + len(list_filter(toks, t -> t IN ({_STOP_ES})))
              + len(list_filter(toks, t -> t IN ({_STOP_DE}))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(toks, t -> {_md5h('t', FP_P)})),
                       (acc, h) -> (acc * 31 + h) % {FP_P}) AS fingerprint,
           CAST(list_sum(list_transform(toks,
                t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_ish_tokens
    FROM toks
    """,
)
def ns_text_quality_stats(spark, sf_dir):
    """Per-document quality signals + rolling fingerprint + token estimate.
    Tokens project once and feed every HOF consumer (quality filters,
    fingerprint fold, BPE estimate) as an attribute — one split per row."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", tx.tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    stats = tx.quality_stats(F.col("text"), toks=toks)
    return d.select(
        "doc_id",
        stats["n_chars"].alias("n_chars"),
        stats["n_tokens"].alias("n_tokens"),
        stats["n_distinct_tokens"].alias("n_distinct_tokens"),
        stats["avg_token_len"].alias("avg_token_len"),
        stats["alpha_ratio"].alias("alpha_ratio"),
        stats["stopword_ratio"].alias("stopword_ratio"),
        tx.fingerprint(F.col("text"), toks=toks).alias("fingerprint"),
        tx.bpe_ish_token_count(F.col("text"), toks=toks).alias("bpe_ish_tokens"),
    )


@parity(
    "ns_text_language_id",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    scores AS (
        SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ({_STOP_EN}))) AS s_en,
               len(list_filter(toks, t -> t IN ({_STOP_ES}))) AS s_es,
               len(list_filter(toks, t -> t IN ({_STOP_DE}))) AS s_de
        FROM toks
    )
    SELECT lang,
           CASE WHEN greatest(s_en, s_es, s_de) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de) THEN 'es'
                ELSE 'de' END AS predicted_lang,
           COUNT(*) AS doc_cnt
    FROM scores GROUP BY 1, 2
    """,
)
def ns_text_language_id(spark, sf_dir):
    """Stopword-heuristic language ID vs. the labeled lang column."""
    d = table(spark, sf_dir, "documents").select(
        "lang", tx.tokens(F.col("text")).alias("toks")
    )
    return d.groupBy(
        "lang",
        tx.language_id(F.lit(None), toks=F.col("toks")).alias("predicted_lang"),
    ).agg(F.count(F.lit(1)).alias("doc_cnt"))


@parity(
    "ns_dedup_ngram_jaccard_capped",
    driver=False,  # driver slot: folded into ns_dedup_ngram_jaccard_modes
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    sh_all AS (
        SELECT DISTINCT doc_id AS doc, UNNEST({_SHINGLES}) AS shingle FROM toks
    ),
    keep AS (
        SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= 5
    ),
    sh AS (SELECT doc, shingle FROM sh_all JOIN keep USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
    common AS (
        SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc < b.doc
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.6
    """,
)
def ns_dedup_ngram_jaccard_capped(spark, sf_dir):
    """The stop-shingle skew guard (``max_shingle_freq``): shingles appearing
    in > 5 docs are dropped before the posting-list join — the knob that caps
    degenerate bucket blowup at 100 TB. Jaccard then runs over the SURVIVING
    shingle sets (both engines agree on the capped universe)."""
    return td.ngram_jaccard_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        shingle_len=3, min_jaccard=0.6, max_shingle_freq=5,
    )


@parity(
    "ns_dedup_ngram_jaccard_adaptive",
    driver=False,  # driver slot: folded into ns_dedup_ngram_jaccard_modes
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    cap_t AS (SELECT GREATEST(8, (COUNT(*) + 999) // 1000) AS cap FROM docs2),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    sh_all AS (
        SELECT DISTINCT doc_id AS doc, UNNEST({_SHINGLES}) AS shingle FROM toks
    ),
    keep AS (
        SELECT shingle FROM sh_all GROUP BY shingle
        HAVING COUNT(*) <= (SELECT cap FROM cap_t)
    ),
    sh AS (SELECT doc, shingle FROM sh_all JOIN keep USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
    common AS (
        SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc < b.doc
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.6
    """,
)
def ns_dedup_ngram_jaccard_adaptive(spark, sf_dir):
    """Jaccard pairs through the PRODUCTION default
    (``max_shingle_freq="adaptive"``): the stop-shingle cap derives from
    the corpus count — max(8, ceil(n/1000)), ~0.1% of docs
    (operators/text_dedup.py adaptive_max_shingle_freq) — and the oracle
    mirrors the derivation with exact integer arithmetic over its own
    COUNT(*). Certifies the adaptive path end-to-end: count -> cap ->
    surviving shingle universe -> pairs. Unlike the FIXED cap twin, this
    scales with the corpus, so the capped universe stays meaningful at
    sf1+ where cap=5 would delete nearly every shingle."""
    return td.ngram_jaccard_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        shingle_len=3, min_jaccard=0.6, max_shingle_freq="adaptive",
    )


# word 4-gram shingles for the winnowing probe (k=4 separates the
# fingerprint grams from the 3-gram jaccard probes sharing this corpus)
_SHINGLES4 = (
    "CASE WHEN len(toks) >= 4 THEN "
    "list_transform(generate_series(1, len(toks) - 3), "
    "i -> array_to_string(toks[i:i+3], ' ')) "
    "ELSE [] END"
)


@parity(
    "ns_dedup_winnowing",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH docs2 AS ({_DOCS2}),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    hs_t AS (
        SELECT doc_id AS doc,
               list_transform({_SHINGLES4}, s -> {_md5h('s', P31)}) AS hs
        FROM toks
    ),
    fp_t AS (
        SELECT doc, UNNEST(list_distinct(
            CASE WHEN len(hs) >= 4 THEN
                     list_transform(generate_series(1, len(hs) - 3),
                                    i -> list_min(hs[i:i+3]))
                 WHEN len(hs) > 0 THEN [list_min(hs)]
                 ELSE [] END)) AS fingerprint
        FROM hs_t
    ),
    keep AS (SELECT fingerprint FROM fp_t GROUP BY 1 HAVING COUNT(*) <= 5),
    fpk AS (SELECT doc, fingerprint FROM fp_t JOIN keep USING (fingerprint)),
    sizes AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fpk GROUP BY 1),
    pairs AS (
        SELECT a.doc AS id_a, b.doc AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fpk a JOIN fpk b USING (fingerprint)
        WHERE a.doc < b.doc
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared, sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
           CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.n_fp, sb.n_fp) AS DOUBLE)
               AS containment
    FROM pairs
    JOIN sizes sa ON sa.doc = id_a
    JOIN sizes sb ON sb.doc = id_b
    WHERE n_shared >= 2
    """,
)
def ns_dedup_winnowing(spark, sf_dir):
    """Winnowing-fingerprint substring-overlap pairs (Schleimer et al.,
    SIGMOD 2003): per-doc winnowed 4-gram hash sets (sliding-window-4
    minima — any shared token run of length >= 7 shares a fingerprint),
    posting-list equi-join with the stop-fingerprint cap (<= 5 docs),
    containment = n_shared / min(|A|, |B|) — the partial-overlap signal
    (quoted spans, boilerplate) whole-doc MinHash dilutes away. The twins
    share their originals' text verbatim, so every twin pair surfaces at
    containment ~1 even where full-doc Jaccard drops below threshold."""
    return td.winnowing_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        k=4, window=4, min_shared=2, max_fp_freq=5,
    )


@parity(
    "ns_text_topk_quality_by_lang",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents),
    scored AS (
        SELECT doc_id, lang,
               CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                   AS distinct_ratio,
               CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS alpha_ratio
        FROM toks
    ),
    ranked AS (
        SELECT doc_id, lang,
               distinct_ratio * alpha_ratio AS quality,
               CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY distinct_ratio * alpha_ratio DESC, doc_id) AS INT) AS rank
        FROM scored
    )
    SELECT lang, rank, doc_id, quality FROM ranked WHERE rank <= 10
    """,
)
def ns_text_topk_quality_by_lang(spark, sf_dir):
    """Top-10 documents per language by composite quality score — the
    select-best-per-group filter of a training-data pipeline. Window top-k
    per group = one shuffle on the group key, and the rank<=k filter
    compiles to a PARTIAL WindowGroupLimit below the exchange (each map
    task keeps only its own top 10 per group before shuffling — the
    partial-top-k-first plan 100 TB needs, plan-shape-pinned in
    tests/test_plan_shapes.py)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", tx.tokens(F.col("text")).alias("toks")
    )
    stats = tx.quality_stats(F.col("text"), toks=F.col("toks"))
    scored = d.select(
        "doc_id",
        "lang",
        (
            (stats["n_distinct_tokens"].cast("double") / stats["n_tokens"].cast("double"))
            * stats["alpha_ratio"]
        ).alias("quality"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "doc_id", "quality")
    )


@parity(
    "ns_text_normalize_scrub",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(
               regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '[0-9][0-9 -]{{11,}}[0-9]', '<NUMBER>', 'g')),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
           CAST(length(text) AS BIGINT) AS raw_len
    FROM documents
    """,
)
def ns_text_normalize_scrub(spark, sf_dir):
    """PII-ish scrub (emails, long digit runs) then canonical normalization
    (lowercase, strip punctuation, collapse whitespace) — the deterministic
    lexical cleaning stage of a training-data pipeline, all JVM regexp."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.normalize_text(tx.scrub_pii_ish(F.col("text"))).alias("clean_text"),
        F.length("text").cast("long").alias("raw_len"),
    )


_CHUNK_TOKENS = 32
_CHUNK_OVERLAP = 8
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


@parity(
    "ns_text_chunking",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sized AS (
        SELECT doc_id, toks,
               1 + CAST(ceil(greatest(len(toks) - {_CHUNK_TOKENS}, 0)
                             / {_CHUNK_STRIDE}.0) AS INT) AS n_chunks
        FROM toks
    ),
    fan AS (
        SELECT doc_id, toks, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM sized
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(
               toks[chunk_idx * {_CHUNK_STRIDE} + 1 :
                    chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}], ' ')
               AS chunk_text,
           CAST(len(toks[chunk_idx * {_CHUNK_STRIDE} + 1 :
                         chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}]) AS BIGINT)
               AS n_tokens
    FROM fan
    """,
)
def ns_text_chunking(spark, sf_dir):
    """Fixed-token overlapping document chunking (32-token windows,
    8-token overlap — sized so the sf0.01 corpus genuinely fans out to
    multiple chunks per document; production uses context-window-scale
    budgets) — the context-window packing precursor for
    long-document training shards and RAG indexing. Tokens project once;
    the explode fans out start offsets only, so the whole operator is
    map-side (zero shuffle at any scale)."""
    return tx.chunk_documents(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
        chunk_tokens=_CHUNK_TOKENS,
        overlap=_CHUNK_OVERLAP,
    )


_CDC_DIV = 8

# CDC chunk derivation as a reusable WITH-prefix: ``cdc_chunks`` holds
# (doc_id, chunk_idx, chunk_text, n_tokens) — the DuckDB twin of
# functions/text.py:cdc_chunk_documents. Shared by the chunking probe,
# the CDC chunk-dedup twin, and the shared-span remediation oracle.
# Tokens keep SOURCE case (chunk_text is not case-folded); only the
# boundary hash lowercases — mirroring the Spark side exactly.
_CDC_CHUNKS_CTE = f"""
    WITH toks_t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (
        SELECT doc_id, toks,
               list_filter(generate_series(1, len(toks)),
                           i -> {_md5h('lower(toks[i])', _CDC_DIV)} = 0) AS bpos
        FROM toks_t
    ),
    p AS (
        SELECT doc_id, toks,
               list_prepend(1, list_transform(bpos, x -> x + 1)) AS starts,
               list_append(bpos, len(toks)) AS ends
        FROM b
    ),
    ch AS (
        SELECT doc_id,
               list_filter(
                   list_transform(generate_series(1, len(starts)),
                       j -> CASE WHEN ends[j] >= starts[j]
                                 THEN array_to_string(toks[starts[j]:ends[j]], ' ')
                            END),
                   x -> x IS NOT NULL) AS chunks
        FROM p
    ),
    cdc_chunks AS (
        SELECT doc_id,
               CAST(generate_subscripts(chunks, 1) - 1 AS INT) AS chunk_idx,
               UNNEST(chunks) AS chunk_text,
               CAST(len(string_split(UNNEST(chunks), ' ')) AS BIGINT) AS n_tokens
        FROM ch
    )"""


@parity(
    "ns_text_cdc_chunking",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_CDC_CHUNKS_CTE
    + """
    SELECT doc_id, chunk_idx, chunk_text, n_tokens FROM cdc_chunks
    """,
)
def ns_text_cdc_chunking(spark, sf_dir):
    """Content-defined chunking (rsync/LBFS rolling-hash boundaries on
    token streams): a chunk ends after any token whose lowercased md5
    hash is 0 mod 8 — boundaries are a function of CONTENT, so an
    insertion perturbs only its own chunk and every later chunk hash
    survives for chunk-level dedup (fixed windows shift wholesale and
    match nothing). chunk_text preserves source case. Map-side HOFs over
    one projected token array; zero shuffle."""
    return tx.cdc_chunk_documents(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
        divisor=_CDC_DIV,
    )


@parity(
    "ns_chunk_dedup",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sized AS (
        SELECT doc_id, toks,
               1 + CAST(ceil(greatest(len(toks) - {_CHUNK_TOKENS}, 0)
                             / {_CHUNK_TOKENS}.0) AS INT) AS n_chunks
        FROM toks
    ),
    fan AS (
        SELECT doc_id, toks, UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM sized
    ),
    chunks AS (
        SELECT doc_id * 1000 + chunk_idx AS chunk_id,
               array_to_string(
                   toks[chunk_idx * {_CHUNK_TOKENS} + 1 :
                        (chunk_idx + 1) * {_CHUNK_TOKENS}], ' ') AS chunk_text
        FROM fan
    )
    SELECT sha256(chunk_text) AS content_hash,
           MIN(chunk_id) AS survivor_id,
           COUNT(*) AS dup_cnt
    FROM chunks GROUP BY 1
    """,
)
def ns_chunk_dedup(spark, sf_dir):
    """Sub-document dedup: exact content dedup over NON-overlapping
    fixed-token chunks (the paragraph-granularity dedup pass of a
    RefinedWeb-style pipeline — boilerplate repeats inside otherwise
    unique pages, so document-level dedup misses it). Chunking is
    map-side; the only shuffle is the content-hash groupBy."""
    chunks = tx.chunk_documents(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
        chunk_tokens=_CHUNK_TOKENS,
        overlap=0,
    ).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        "chunk_text",
    )
    return td.exact_dedup(chunks, "chunk_id", "chunk_text")


@parity(
    "ns_chunk_dedup_cdc",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_CDC_CHUNKS_CTE
    + """
    SELECT sha256(chunk_text) AS content_hash,
           MIN(doc_id * 100000 + chunk_idx) AS survivor_id,
           COUNT(*) AS dup_cnt
    FROM cdc_chunks GROUP BY 1
    """,
)
def ns_chunk_dedup_cdc(spark, sf_dir):
    """Sub-document dedup over CONTENT-DEFINED chunks — the twin of
    ns_chunk_dedup that users should copy: CDC boundaries make chunk
    hashes insertion-robust (an edit perturbs only its own chunk, so the
    shared remainder of two edited copies still collapses; fixed windows
    shift wholesale and match nothing — certified by the injected-edit
    fixture in tests/test_cdc_evolution.py). Chunking is map-side; the
    only shuffle is the content-hash groupBy."""
    chunks = tx.cdc_chunk_documents(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
        divisor=_CDC_DIV,
    ).select(
        (F.col("doc_id") * 100000 + F.col("chunk_idx")).alias("chunk_id"),
        "chunk_text",
    )
    return td.exact_dedup(chunks, "chunk_id", "chunk_text")


_SPAN_MAX_DOC_FREQ = 1


@parity(
    "ns_text_remove_spans",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_CDC_CHUNKS_CTE
    + f""",
    hashed AS (
        SELECT doc_id, chunk_idx, chunk_text, n_tokens,
               ('0x' || substr(md5(lower(chunk_text)), 1, 15))::BIGINT AS h
        FROM cdc_chunks
    ),
    freq AS (
        SELECT h, COUNT(DISTINCT doc_id) AS doc_freq FROM hashed GROUP BY 1
    ),
    scored AS (
        SELECT hashed.*, doc_freq <= {_SPAN_MAX_DOC_FREQ} AS kept
        FROM hashed JOIN freq USING (h)
    )
    SELECT doc_id,
           COALESCE(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
                        FILTER (WHERE kept), '') AS cleaned_text,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_kept_chunks,
           CAST(COALESCE(SUM(n_tokens) FILTER (WHERE NOT kept), 0) AS BIGINT)
               AS n_tokens_removed
    FROM scored GROUP BY 1
    """,
)
def ns_text_remove_spans(spark, sf_dir):
    """Substring-dedup REMEDIATION (operators/text_dedup.py
    remove_shared_spans): drop every CDC chunk whose content occurs in
    more than 1 distinct document (case-insensitively) and reassemble
    each document from its surviving chunks in order — the
    RefinedWeb/Lee-et-al. removal step that turns the engine's
    substring-duplication DETECTORS (winnowing, CDC chunk hashes) into
    an actual cleaning operator. cleaned_text preserves source case
    (whitespace-normalized). Chunking is map-side; then three keyed
    shuffles (hash frequency, chunk-to-frequency join, per-document
    reassembly)."""
    return td.remove_shared_spans(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
        divisor=_CDC_DIV,
        max_doc_freq=_SPAN_MAX_DOC_FREQ,
    )


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@parity(
    "ns_profile_columns",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS null_frac,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM documents
    """
        for c in _PROFILE_COLS
    ),
)
def ns_profile_columns(spark, sf_dir):
    """Column-level profiling of the documents table (operators/
    profiling.py): completeness, exact cardinality, lexical range — ONE
    aggregate pass (map-side partials; a 1-row exchange) unpivoted to one
    row per column. Exact-NDV mode here so DuckDB agrees bit-for-bit; the
    default approx_count_distinct (HLL++) is the 100 TB path."""
    from ..operators.profiling import profile_columns

    return profile_columns(
        table(spark, sf_dir, "documents"), _PROFILE_COLS, exact=True
    )


_COOC_TOP = 10


@parity(
    "ns_text_cooccurrence",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, UNNEST({_TOKS}) AS token FROM documents
    ),
    freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs_tok FROM dt GROUP BY 1
    ),
    vocab AS (
        SELECT token, n_docs_tok FROM freq
        ORDER BY n_docs_tok DESC, token LIMIT {_COOC_TOP}
    ),
    vd AS (SELECT dt.doc_id, dt.token FROM dt JOIN vocab USING (token)),
    total AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
    pairs AS (
        SELECT a.token AS t1, b.token AS t2, CAST(COUNT(*) AS BIGINT) AS n_both
        FROM vd a JOIN vd b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2
    )
    SELECT t1, t2, n_both,
           v1.n_docs_tok AS n_docs_t1, v2.n_docs_tok AS n_docs_t2,
           (CAST(n_both AS DOUBLE) * CAST(n_docs AS DOUBLE))
               / (CAST(v1.n_docs_tok AS DOUBLE) * CAST(v2.n_docs_tok AS DOUBLE))
               AS lift
    FROM pairs
    JOIN vocab v1 ON v1.token = t1
    JOIN vocab v2 ON v2.token = t2
    CROSS JOIN total
    """,
)
def ns_text_cooccurrence(spark, sf_dir):
    """Document-level co-occurrence of the top-10 tokens with the
    independence lift (``P(t1,t2) / (P(t1)P(t2))`` — the PMI argument
    without the cross-engine-unsafe log): the collocation/association
    report of corpus analytics. The vocabulary is tiny and broadcast; the
    per-doc pair join is bounded by vocabulary size per doc, so the only
    corpus-wide shuffle is the distinct (doc, token) projection. Lift is
    one pinned-association IEEE chain over exact integers — hash-exact."""
    d = table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(tx.tokens(F.col("text")))).alias("token")
    )
    freq = dt.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_docs_tok"))
    vocab = freq.orderBy(F.desc("n_docs_tok"), F.asc("token")).limit(_COOC_TOP)
    vd = dt.join(F.broadcast(vocab.select("token")), "token")
    total = dt.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    a = vd.select("doc_id", F.col("token").alias("t1"))
    b = vd.select("doc_id", F.col("token").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    v1 = vocab.select(F.col("token").alias("t1"), F.col("n_docs_tok").alias("n_docs_t1"))
    v2 = vocab.select(F.col("token").alias("t2"), F.col("n_docs_tok").alias("n_docs_t2"))
    out = (
        pairs.join(F.broadcast(v1), "t1")
        .join(F.broadcast(v2), "t2")
        .crossJoin(F.broadcast(total))
    )
    lift = (F.col("n_both").cast("double") * F.col("n_docs").cast("double")) / (
        F.col("n_docs_t1").cast("double") * F.col("n_docs_t2").cast("double")
    )
    return out.select(
        "t1", "t2", "n_both", "n_docs_t1", "n_docs_t2", lift.alias("lift")
    )


def _graph_stats_oracle() -> str:
    from .registry import ALL_ORACLE_SQL

    # capped generator, not the uncapped exact join: at sf1 the
    # single-node oracle exhausted disk spilling the uncapped
    # shingle self-join (BENCH_SF1 class c) while Spark ran it in ~6 s;
    # the uncapped twin stays certified by ns_dedup_ngram_jaccard itself,
    # and capped pairs are the production graph input anyway
    pairs = ALL_ORACLE_SQL["ns_dedup_ngram_jaccard_capped"]
    return f"""
    WITH p AS (SELECT id_a, id_b FROM ({pairs}) __pairs),
    e AS (
        SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
        FROM p WHERE id_a <> id_b
    ),
    deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b FROM e
        ) GROUP BY 1
    ),
    ds AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MAX(d) AS BIGINT) AS max_degree,
               CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN (SELECT a AS b, b AS c FROM e) e2 USING (b)
        JOIN (SELECT a, b AS c FROM e) e3 USING (a, c)
    )
    SELECT n_nodes, n_edges, max_degree, n_wedges, n_triangles
    FROM ds, ec, tri
    """


def _pagerank_fixed_oracle(n_iter: int = 3) -> str:
    """Unrolled fixed-point power method over the MinHash pair graph —
    pure BIGINT arithmetic round-for-round identical to
    operators/components.py::pagerank_fixed_point (the kmeans/BPE unroll
    pattern; the doubled undirected graph has no sinks, so the dangling
    term is identically zero and elides)."""
    from .registry import ALL_ORACLE_SQL

    pairs = ALL_ORACLE_SQL["ns_dedup_minhash_lsh"]
    scale, d_num, d_den = 10**12, 85, 100
    ctes = [
        f"WITH pr AS ({pairs})",
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pr"
        " UNION ALL SELECT id_b, id_a FROM pr)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg"
        " FROM edges GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS r"
        " FROM nodes, nt)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"s{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM(r{i-1}.r // d.out_deg) AS BIGINT) AS s"
            f" FROM edges e JOIN r{i-1} ON r{i-1}.node = e.src"
            " JOIN deg d ON d.src = e.src GROUP BY 1)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node,"
            f" CAST((({d_den} - {d_num}) * {scale} // {d_den}) // nt.n"
            f" + ({d_num} * COALESCE(s{i}.s, 0)) // {d_den} AS BIGINT) AS r"
            f" FROM nodes LEFT JOIN s{i} USING (node), nt)"
        )
    return (
        ",\n    ".join(ctes)
        + f"\n    SELECT node, r AS rank_units FROM r{n_iter}"
    )


@parity(
    "ns_dedup_pagerank_fixed",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_pagerank_fixed_oracle(),
)
def ns_dedup_pagerank_fixed(spark, sf_dir):
    """Fixed-point PageRank over the MinHash near-dup pair graph —
    the ITERATIVE algorithm made hash-certifiable: rank carried as BIGINT
    micro-units (10^12 = total mass), contributions as exact integer
    floor divisions, damping as the rational 85/100 — bit-identical
    across engines and execution orders, so the 3-round power method
    unrolls into a DuckDB CTE chain and value-hashes exactly (the float
    twin ns_dedup_pagerank stays rows-only by nature; this one proves
    the same plan shape cross-engine)."""
    from ..operators.components import pagerank_fixed_point

    pairs = td.minhash_lsh_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        num_hashes=NUM_HASHES, bands=BANDS, min_matching=8,
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_fixed_point(both, n_iter=3, checkpoint_every=3)


@parity("ns_dedup_pagerank", driver=False)  # rows-only: iterative float loop
def ns_dedup_pagerank(spark, sf_dir):
    """PageRank centrality of the near-dup pair graph (operators/
    components.py pagerank): the documents most entangled in duplicate
    clusters rank highest — a curation signal for which survivor to keep
    (or which boilerplate hub to drop). Edges from the MinHash-LSH
    candidate pairs (the cheapest generator); undirected -> each pair
    contributes both directions. Iterative power method, rows-only by
    nature (shuffle-order float sums); exactness vs a Python reference
    proven to 1e-9 in tests/test_components.py."""
    from ..operators.components import pagerank

    pairs = td.minhash_lsh_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        num_hashes=NUM_HASHES, bands=BANDS, min_matching=8,
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(both, n_iter=3, checkpoint_every=3)
    return pr.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(25)


@parity(
    "ns_dedup_graph_stats",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_graph_stats_oracle(),
)
def ns_dedup_graph_stats(spark, sf_dir):
    """Structural report of the near-dup pair graph (operators/
    components.py graph_stats): node/edge counts, max degree, wedges and
    triangles via the edge-iterator join — tight duplicate clusters are
    triangle-dense, boilerplate skew shows as degree blowup. Integer
    outputs, engine-exact. Pairs come from the jaccard generator with the
    cap PINNED at 5 — not the corpus-adaptive production default
    (adaptive_max_shingle_freq, certified separately by
    ns_dedup_ngram_jaccard_adaptive) — so the oracle twin stays
    deterministic and single-node-feasible at sf >= 1."""
    from ..operators.components import graph_stats

    pairs = td.ngram_jaccard_pairs(
        _docs2(spark, sf_dir), "doc_id", "text",
        shingle_len=3, min_jaccard=0.6, max_shingle_freq=5,
    )
    return graph_stats(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )


@parity(
    "ns_text_c4_filters",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="""
    WITH base AS (
        SELECT doc_id,
               string_split(replace(text, ' value ', '.' || chr(10)), chr(10)) AS lines
        FROM documents
    ),
    cls AS (
        SELECT doc_id, lines,
               list_filter(lines, x ->
                   len(string_split_regex(trim(x), ' +')) >= 5
                   AND (trim(x) LIKE '%.' OR trim(x) LIKE '%!' OR trim(x) LIKE '%?')
                   AND NOT contains(lower(x), 'slow')) AS kept_l,
               list_filter(lines, x ->
                   len(string_split_regex(trim(x), ' +')) < 5) AS short_l,
               list_filter(lines, x ->
                   len(string_split_regex(trim(x), ' +')) >= 5
                   AND NOT (trim(x) LIKE '%.' OR trim(x) LIKE '%!' OR trim(x) LIKE '%?'))
                   AS nopunct_l,
               list_filter(lines, x ->
                   len(string_split_regex(trim(x), ' +')) >= 5
                   AND (trim(x) LIKE '%.' OR trim(x) LIKE '%!' OR trim(x) LIKE '%?')
                   AND contains(lower(x), 'slow')) AS block_l
        FROM base
    )
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept_l) AS BIGINT) AS n_kept,
           CAST(len(short_l) AS BIGINT) AS n_short,
           CAST(len(nopunct_l) AS BIGINT) AS n_nopunct,
           CAST(len(block_l) AS BIGINT) AS n_blocklist,
           COALESCE(array_to_string(kept_l, chr(10)), '') AS kept_text
    FROM cls
    """,
)
def ns_text_c4_filters(spark, sf_dir):
    """C4-style line-level quality filtering (functions/text.py
    c4_line_filters): per-line keep/drop with first-failing-rule
    attribution (short / no terminal punctuation / blocklist phrase — the
    blocklist word here is 'slow', present in the corpus). The driver corpus
    is single-line, so line structure is injected in-query — ' value ' →
    '.\\n' (literal left-to-right replace, identical both engines) — the
    same inject-then-operate pattern the dedup oracles use. Four O(n_lines)
    array passes per row over ONE projected line array; zero shuffle."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(
            F.replace(F.col("text"), F.lit(" value "), F.lit(".\n")), "\n"
        ).alias("lines"),
    )
    stats = tx.c4_line_filters(F.col("lines"), min_words=5, blocklist=("slow",))
    return docs.select(
        "doc_id",
        stats["n_lines"].alias("n_lines"),
        F.size(stats["kept_lines"]).cast("long").alias("n_kept"),
        stats["n_short"].alias("n_short"),
        stats["n_nopunct"].alias("n_nopunct"),
        stats["n_blocklist"].alias("n_blocklist"),
        F.array_join(stats["kept_lines"], "\n").alias("kept_text"),
    )


@parity(
    "ns_text_line_dedup",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="""
    WITH base AS (
        SELECT doc_id,
               list_append(
                   string_split(replace(text, ' value ', '.' || chr(10)), chr(10)),
                   'subscribe to our newsletter today.') AS lines
        FROM documents
    ),
    ln AS (
        SELECT doc_id,
               UNNEST(lines) AS line,
               generate_subscripts(lines, 1) AS pos
        FROM base
    ),
    keyed AS (
        SELECT doc_id, pos, line, md5(lower(trim(line))) AS lkey FROM ln
    ),
    drop_keys AS (
        SELECT lkey FROM keyed GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 25
    ),
    kept AS (
        SELECT k.doc_id, k.pos, k.line
        FROM keyed k
        WHERE NOT EXISTS (SELECT 1 FROM drop_keys d WHERE d.lkey = k.lkey)
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               array_to_string(list(line ORDER BY pos), chr(10)) AS kept_text
        FROM kept GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(len(b.lines) AS BIGINT) AS n_lines,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(b.lines) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
           COALESCE(a.kept_text, '') AS kept_text
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def ns_text_line_dedup(spark, sf_dir):
    """Corpus-level frequent-line removal (operators/text_dedup.py
    frequent_line_removal — the RefinedWeb/Dolma boilerplate-line pass):
    lines appearing in more than 25 distinct documents drop from every
    document, survivors reassemble in order. The driver corpus is
    single-line, so line structure injects in-query (' value ' → '.\\n',
    the c4-filter pattern) plus a universal footer line appended to every
    document — guaranteed cross-corpus boilerplate the pass must remove.
    One line-key shuffle + a broadcast anti-join + one per-doc reassembly
    shuffle."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.split(
                F.replace(F.col("text"), F.lit(" value "), F.lit(".\n")), "\n"
            ),
            F.array(F.lit("subscribe to our newsletter today.")),
        ).alias("lines"),
    )
    return td.frequent_line_removal(docs, "doc_id", "lines", max_doc_freq=25)


@parity(
    "ns_text_bpe_pairs",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS toks FROM documents
    ),
    pairs AS (
        SELECT UNNEST(CASE WHEN len(toks) >= 2 THEN
            list_transform(generate_series(1, len(toks) - 1),
                           i -> array_to_string(toks[i:i+1], ' '))
            ELSE [] END) AS pair
        FROM toks
    ),
    counts AS (
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank,
           pair, cnt
    FROM counts
    ORDER BY cnt DESC, pair ASC
    LIMIT 20
    """,
)
def ns_text_bpe_pairs(spark, sf_dir):
    """Corpus-wide adjacent WORD-pair counts — the merge-count primitive
    applied at word granularity (classic subword BPE counts within-word
    character pairs instead: that trainer is ns_text_bpe_learn, verified
    against a Python reference). Tokens project once; pairs are the
    existing 2-gram shingle HOF (zero shuffle until the pair groupBy);
    ranked top-20 with tie-break on the pair string so the surface is
    deterministic."""
    toksed = table(spark, sf_dir, "documents").select(
        tx.tokens(F.col("text")).alias("toks")
    )
    pairs = toksed.select(
        F.explode(tx.shingles_from_tokens(F.col("toks"), 2)).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    # global top-k via orderBy+limit -> TakeOrderedAndProject (each map task
    # pre-trims to its own top 20); the rank window then runs on 20 rows
    top = counts.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(20)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "pair", "cnt"
    )


@parity(
    "ns_corpus_datacard",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="""
    WITH per_doc AS (
        SELECT doc_id, lang, n_chars,
               sha256(text) AS h,
               len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
                   AS n_toks
        FROM documents
    ),
    core AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_texts,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        FROM per_doc
    ),
    langs AS (
        SELECT lang, COUNT(*) AS c FROM per_doc GROUP BY 1
    ),
    top_lang AS (
        SELECT lang, c FROM langs ORDER BY c DESC, lang ASC LIMIT 1
    )
    SELECT n_docs, n_distinct_texts,
           CAST(CAST(n_docs - n_distinct_texts AS DECIMAL(18,6))
                / n_docs AS DOUBLE) AS exact_dup_frac,
           total_chars, total_tokens,
           CAST(CAST(total_tokens AS DECIMAL(18,6)) / n_docs AS DOUBLE)
               AS mean_tokens_per_doc,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM langs) AS n_langs,
           (SELECT lang FROM top_lang) AS top_lang,
           CAST(CAST((SELECT c FROM top_lang) AS DECIMAL(18,6))
                / n_docs AS DOUBLE) AS top_lang_frac
    FROM core
    """,
)
def ns_corpus_datacard(spark, sf_dir):
    """One-row corpus data card — the summary a training-data team stamps
    on a dataset release: document/dedup counts, token and char totals,
    language concentration. ONE scan feeds a single aggregate (count +
    count_distinct + sums); the language distribution is a 5-ish-row agg
    joined back as a broadcast. Ratios pin through DECIMAL division then
    DOUBLE, the registry rule."""
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "n_chars",
        F.sha2(F.col("text"), 256).alias("h"),
        F.size(F.filter(tx.tokens(F.col("text")), lambda t: t != "")).alias(
            "n_toks"
        ),
    )
    core = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("h").alias("n_distinct_texts"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").alias("total_tokens"),
    )
    langs = per_doc.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    top = langs.orderBy(F.col("c").desc(), F.col("lang").asc()).limit(1)
    n_langs = langs.agg(F.count(F.lit(1)).alias("n_langs"))
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    return (
        core.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(n_langs))
        .select(
            "n_docs",
            "n_distinct_texts",
            (dec(F.col("n_docs") - F.col("n_distinct_texts")) / F.col("n_docs"))
            .cast("double")
            .alias("exact_dup_frac"),
            "total_chars",
            "total_tokens",
            (dec(F.col("total_tokens")) / F.col("n_docs"))
            .cast("double")
            .alias("mean_tokens_per_doc"),
            "n_langs",
            F.col("lang").alias("top_lang"),
            (dec(F.col("c")) / F.col("n_docs")).cast("double").alias("top_lang_frac"),
        )
    )


@parity("ns_text_compression_ratio", driver=False)  # rows-only: zlib kernel
def ns_text_compression_ratio(spark, sf_dir):
    """Compression-ratio quality signal (operators/quality_kernels.py —
    the Gopher/Dolma curation heuristic): repetitive or templated text
    compresses far below natural prose. Arrow-batched zlib kernel, no
    shuffle; rows-only (no zlib in DuckDB), byte-exactness vs direct zlib
    calls pytest-pinned. Returns the 50 most-compressible docs
    (boilerplate suspects) deterministically."""
    from ..operators.quality_kernels import compression_ratio

    docs = table(spark, sf_dir, "documents")
    out = compression_ratio(docs, "doc_id", "text")
    return (
        out.filter(F.col("compression_ratio").isNotNull())
        .orderBy(F.col("compression_ratio").asc(), F.col("doc_id").asc())
        .limit(50)
    )


_BPE_N_MERGES, _BPE_MIN_FREQ = 8, 2


def _bpe_learn_oracle(n_merges: int, min_freq: int) -> str:
    """Unrolled-CTE DuckDB twin of the iterative BPE trainer (the pattern
    ns_sim_kmeans_assign established: a FIXED bounded iteration over
    deterministic integer state unrolls into a CTE chain, making the
    trainer's full output hash-certifiable cross-engine).

    Each word's segmentation is one STRING with every symbol wrapped in
    chr(1) delimiters (``\\x01sym\\x01`` concatenated) — the DOUBLED
    delimiter between adjacent symbols makes DuckDB's leftmost
    non-overlapping ``replace()`` exactly the greedy left-to-right merge
    the Spark array fold applies ("a a a a" -> "aa aa", never "aa a a",
    and no shared-boundary miss on odd runs). chr(1) cannot occur in a
    symbol: tokens come from whitespace-split text and the generator's
    corpus is printable ASCII (pinned by
    tests/test_multimodal.py::test_documents_corpus_stays_ascii).
    Every CTE is MATERIALIZED — each round references its predecessor
    through 2 paths, so inlined CTEs would expand the base scan
    exponentially in the round count."""
    parts = [
        f"""
    wf AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT UNNEST(string_split(lower(text), ' ')) AS word
            FROM documents
        ) WHERE word <> '' GROUP BY 1
    ),
    seg0 AS MATERIALIZED (
        SELECT word, freq,
               list_reduce(
                   list_transform(
                       list_transform(generate_series(1, length(word)),
                                      i -> word[i:i]) || ['</w>'],
                       s -> chr(1) || s || chr(1)),
                   (x, y) -> x || y) AS seg
        FROM wf
    )"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""
    syms{r} AS MATERIALIZED (
        SELECT list_filter(string_split(seg, chr(1)), x -> x <> '') AS syms,
               freq
        FROM seg{r}
    ),
    pc{r} AS (
        SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT UNNEST(list_transform(generate_series(1, len(syms) - 1),
                          i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS p,
                   freq
            FROM syms{r} WHERE len(syms) >= 2
        ) GROUP BY 1, 2
    ),
    top{r} AS MATERIALIZED (
        SELECT a, b, cnt FROM pc{r} WHERE cnt >= {min_freq}
        ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    seg{r + 1} AS MATERIALIZED (
        SELECT word, freq,
               COALESCE(
                   replace(seg,
                           chr(1) || (SELECT a FROM top{r}) || chr(1) || chr(1)
                                  || (SELECT b FROM top{r}) || chr(1),
                           chr(1) || (SELECT a FROM top{r})
                                  || (SELECT b FROM top{r}) || chr(1)),
                   seg) AS seg
        FROM seg{r}
    )"""
        )
    rounds = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a, b, a || b AS merged, cnt"
        f" FROM top{r}"
        for r in range(n_merges)
    )
    return "WITH" + ",".join(parts) + "\n" + rounds


@parity(
    "ns_text_bpe_learn",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle=_bpe_learn_oracle(_BPE_N_MERGES, _BPE_MIN_FREQ),
)
def ns_text_bpe_learn(spark, sf_dir):
    """Full BPE merge-rule induction (operators/bpe.py bpe_learn — the
    Sennrich word-frequency formulation: ONE corpus shuffle, then
    vocabulary-sized merge rounds). The trainer is a fixed bounded
    iteration over deterministic integer state (count-desc, (a, b)-lex
    tie-breaks), so its DuckDB twin unrolls the rounds as a CTE chain —
    the full ordered merge-rule table is hash-certified cross-engine
    through ns_text_digest; exactness vs the classic algorithm is
    additionally property-proven in tests/test_bpe.py. The early-stop
    (no pair reaching min_freq) maps to an empty top-CTE whose NULL
    scalar subqueries make every later round's replace() a no-op and
    contribute zero output rows — identical to the Spark break."""
    from ..operators.bpe import bpe_learn

    docs = table(spark, sf_dir, "documents")
    merges, _segs = bpe_learn(docs, "text", n_merges=8, min_freq=2)
    return spark.createDataFrame(
        [(m["round"], m["a"], m["b"], m["merged"], m["cnt"]) for m in merges],
        "round long, a string, b string, merged string, cnt long",
    )


@parity(
    "ns_vocab_coverage",
    driver=False,  # driver slot: folded into ns_text_digest
    oracle="""
    WITH t AS (
        SELECT UNNEST(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
    ranked AS (
        SELECT token, cnt, total_tokens,
               CAST(row_number() OVER w AS BIGINT) AS rank,
               CAST(SUM(cnt) OVER w AS BIGINT) AS cum_cnt
        FROM counts CROSS JOIN tot
        WINDOW w AS (ORDER BY cnt DESC, token ASC)
    )
    SELECT rank, token, cnt, total_tokens,
           CAST(floor((cum_cnt * 1000000) / total_tokens) AS BIGINT)
               AS coverage_ppm
    FROM ranked WHERE rank <= 20
    """,
)
def ns_vocab_coverage(spark, sf_dir):
    """Tokenizer-prep vocabulary induction report: the top-V corpus tokens
    with cumulative coverage (integer parts-per-million — engine-exact).
    The quantity a tokenizer build reads to size its vocabulary (coverage
    at V ⇒ OOV rate = 1 − coverage). One token-wide groupBy shuffle; the
    ranked cumsum runs on the VOCABULARY (counts table), which is
    vocabulary-sized, never corpus-sized."""
    from pyspark.sql.window import Window

    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("cnt").over(Window.partitionBy())
    return (
        counts.withColumn("total_tokens", total)
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))).cast("long"))
        .withColumn("cum_cnt", F.sum("cnt").over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "rank", "token", "cnt", "total_tokens",
            F.floor((F.col("cum_cnt") * F.lit(1_000_000)) / F.col("total_tokens"))
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Driver-slot composite: the text-analysis family in ONE oracle-paired entry
# (SURVEY.md §8 50-entry driver window). Each member probe's full result set
# is content-checksummed identically in both engines (registry.digest_frame),
# so a green digest row certifies the same values as the individual probes.
# --------------------------------------------------------------------------

_TEXT_DIGEST = [
    (
        "ns_text_c4_filters",
        [
            ("doc_id", "s"), ("n_lines", "s"), ("n_kept", "s"),
            ("n_short", "s"), ("n_nopunct", "s"), ("n_blocklist", "s"),
            ("kept_text", "s"),
        ],
    ),
    (
        "ns_text_cooccurrence",
        [
            ("t1", "s"), ("t2", "s"), ("n_both", "s"),
            ("n_docs_t1", "s"), ("n_docs_t2", "s"), ("lift", "d"),
        ],
    ),
    (
        "ns_dedup_graph_stats",
        [
            ("n_nodes", "s"), ("n_edges", "s"), ("max_degree", "s"),
            ("n_wedges", "s"), ("n_triangles", "s"),
        ],
    ),
    (
        "ns_dedup_winnowing",
        [
            ("id_a", "s"), ("id_b", "s"), ("n_shared", "s"),
            ("n_fp_a", "s"), ("n_fp_b", "s"), ("containment", "d"),
        ],
    ),
    ("ns_dedup_pagerank_fixed", [("node", "s"), ("rank_units", "s")]),
    (
        "ns_dedup_simhash_adaptive",
        [("id_a", "s"), ("id_b", "s"), ("hamming", "s")],
    ),
    (
        "ns_text_quality_stats",
        [
            ("doc_id", "s"), ("n_chars", "s"), ("n_tokens", "s"),
            ("n_distinct_tokens", "s"), ("avg_token_len", "d"),
            ("alpha_ratio", "d"), ("stopword_ratio", "d"),
            ("fingerprint", "s"), ("bpe_ish_tokens", "s"),
        ],
    ),
    ("ns_text_language_id", [("lang", "s"), ("predicted_lang", "s"), ("doc_cnt", "s")]),
    (
        "ns_text_topk_quality_by_lang",
        [("lang", "s"), ("rank", "s"), ("doc_id", "s"), ("quality", "d")],
    ),
    (
        "ns_text_normalize_scrub",
        [("doc_id", "s"), ("clean_text", "s"), ("raw_len", "s")],
    ),
    (
        "ns_text_chunking",
        [("doc_id", "s"), ("chunk_idx", "s"), ("chunk_text", "s"), ("n_tokens", "s")],
    ),
    (
        "ns_text_cdc_chunking",
        [("doc_id", "s"), ("chunk_idx", "s"), ("chunk_text", "s"), ("n_tokens", "s")],
    ),
    (
        "ns_chunk_dedup",
        [("content_hash", "s"), ("survivor_id", "s"), ("dup_cnt", "s")],
    ),
    (
        "ns_chunk_dedup_cdc",
        [("content_hash", "s"), ("survivor_id", "s"), ("dup_cnt", "s")],
    ),
    (
        "ns_text_remove_spans",
        [
            ("doc_id", "s"), ("cleaned_text", "s"), ("n_chunks", "s"),
            ("n_kept_chunks", "s"), ("n_tokens_removed", "s"),
        ],
    ),
    (
        "ns_text_line_dedup",
        [
            ("doc_id", "s"), ("n_lines", "s"), ("n_kept", "s"),
            ("n_dropped", "s"), ("kept_text", "s"),
        ],
    ),
    ("ns_text_bpe_pairs", [("rank", "s"), ("pair", "s"), ("cnt", "s")]),
    (
        "ns_text_bpe_learn",
        [("round", "s"), ("a", "s"), ("b", "s"), ("merged", "s"), ("cnt", "s")],
    ),
    (
        "ns_corpus_datacard",
        [
            ("n_docs", "s"), ("n_distinct_texts", "s"), ("exact_dup_frac", "d"),
            ("total_chars", "s"), ("total_tokens", "s"),
            ("mean_tokens_per_doc", "d"), ("n_langs", "s"),
            ("top_lang", "s"), ("top_lang_frac", "d"),
        ],
    ),
    (
        "ns_vocab_coverage",
        [
            ("rank", "s"), ("token", "s"), ("cnt", "s"),
            ("total_tokens", "s"), ("coverage_ppm", "s"),
        ],
    ),
    (
        "ns_profile_columns",
        [
            ("col_name", "s"), ("n_rows", "s"), ("n_nonnull", "s"),
            ("n_nulls", "s"), ("null_frac", "d"), ("n_distinct", "s"),
            ("min_value", "s"), ("max_value", "s"),
        ],
    ),
]


def _text_digest_oracle() -> str:
    from .registry import digest_union_oracle

    return digest_union_oracle(_TEXT_DIGEST)


@parity("ns_text_digest", oracle=_text_digest_oracle())
def ns_text_digest(spark, sf_dir):
    """Text-analysis family in one driver slot: quality signals +
    fingerprint + token estimate, stopword language-ID, per-language top-k
    quality ranking, normalize/PII-scrub, fixed-token overlapping chunking,
    and sub-document chunk dedup — each probe's full result set
    content-checksummed in both engines."""
    from .registry import digest_union

    return digest_union(spark, sf_dir, _TEXT_DIGEST)


@parity(
    "ns_sample_stratified",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""
    WITH bucketed AS (
        SELECT lang, doc_id, {_md5h('CAST(doc_id AS VARCHAR)', 100)} AS bucket
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS sampled_docs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM bucketed
    WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
    GROUP BY 1
    """,
)
def ns_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: per-language rates (50% en, 20%
    others) via md5 bucket — reproducible across engines/runs/cluster sizes,
    no RNG; the train/eval-split primitive."""
    d = table(spark, sf_dir, "documents")
    bucket = tx.sample_bucket(F.col("doc_id"))
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return (
        d.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@parity(
    "ns_sample_exact_k",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle="""
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                             doc_id) AS rk
        FROM documents
    ) WHERE rk <= 30
    """,
)
def ns_sample_exact_k(spark, sf_dir):
    """Exact-k stratified sampling (functions/text.py sample_exact_k):
    EXACTLY 30 docs per language, chosen deterministically by md5 order —
    the eval-set construction primitive (a rate-based sample can't promise
    fixed per-stratum counts). One window shuffle; WindowGroupLimit
    truncates to k per stratum on the map side."""
    d = table(spark, sf_dir, "documents")
    return tx.sample_exact_k(d, ["lang"], "doc_id", 30).select("lang", "doc_id")


# the dedup-closure CTE chain shared by the components probe above and the
# survivor-policy probe below (docs2 corpus -> jaccard pairs -> recursive
# min-label walk -> per-doc component id)
_COMPONENTS_CTES = f"""
    WITH RECURSIVE docs2 AS ({_DOCS2}),
    toks AS (SELECT doc_id, {_TOKS} AS toks FROM docs2),
    sh_all AS (
        SELECT DISTINCT doc_id AS doc, UNNEST({_SHINGLES}) AS shingle FROM toks
    ),
    keep AS (
        SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= 5
    ),
    sh AS (SELECT doc, shingle FROM sh_all JOIN keep USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
    common AS (
        SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc < b.doc
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common
        JOIN sizes sa ON sa.doc = id_a
        JOIN sizes sb ON sb.doc = id_b
        WHERE CAST(n_common AS DOUBLE)
              / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.6
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    walk(node, comp) AS (
        SELECT doc_id, doc_id FROM docs2
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    ),
    comp AS (SELECT node AS doc_id, MIN(comp) AS component_id FROM walk GROUP BY node)
"""



@parity(
    "ns_dedup_components",
    oracle=f"""{_COMPONENTS_CTES}
    SELECT doc_id, component_id,
           COUNT(*) OVER (PARTITION BY component_id) AS component_size
    FROM comp
    """,
)
def ns_dedup_components(spark, sf_dir):
    """Dedup-group closure: n-gram-Jaccard pairs -> connected components
    (large-star/small-star), every doc labeled with its canonical survivor
    (component min) and group size. Oracle: recursive min-label walk over
    the pair set with the cap PINNED at 5 — the uncapped shingle
    self-join exhausts single-node oracle disk at sf >= 1, and pinning
    keeps the oracle twin deterministic; the corpus-adaptive production
    default is certified separately by ns_dedup_ngram_jaccard_adaptive,
    the uncapped twin by ns_dedup_ngram_jaccard."""
    from pyspark.sql import Window

    from ..operators.components import connected_components

    docs = _docs2(spark, sf_dir)
    pairs = td.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_len=3, min_jaccard=0.6,
        max_shingle_freq=5,
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=docs.select(F.col("doc_id").alias("node")),
    )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .cast("long")
        .alias("component_size"),
    )


@parity(
    "ns_dedup_survivor_policy",
    driver=False,  # driver slot: folded into ns_curation_digest
    oracle=f"""{_COMPONENTS_CTES},
    scored AS (
        SELECT c.doc_id, c.component_id,
               CAST(length(d.text) AS BIGINT) AS score
        FROM comp c JOIN docs2 d USING (doc_id)
    ),
    surv AS (
        SELECT component_id, doc_id AS survivor_id FROM (
            SELECT component_id, doc_id,
                   row_number() OVER (PARTITION BY component_id
                        ORDER BY score DESC, doc_id) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT s.doc_id, s.component_id, s.score, surv.survivor_id,
           s.doc_id = surv.survivor_id AS is_kept
    FROM scored s JOIN surv USING (component_id)
    """,
)
def ns_dedup_survivor_policy(spark, sf_dir):
    """Quality-aware canonical selection (operators/components.py
    component_survivors): per dedup component keep the HIGHEST-scoring
    member (here score = text length, so the fullest copy survives; ties
    to the lowest id) instead of the naive lowest-id survivor — the
    production near-dup policy. One score join + one map-side max_by per
    component + a component-keyed join back; nothing quadratic in
    cluster width. Oracle: the components recursive walk + arg-max over
    the CAPPED pair set (max_shingle_freq=5 — see ns_dedup_components)."""
    from ..operators.components import component_survivors, connected_components

    docs = _docs2(spark, sf_dir)
    pairs = td.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_len=3, min_jaccard=0.6,
        max_shingle_freq=5,
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=docs.select(F.col("doc_id").alias("node")),
    )
    scores = docs.select("doc_id", F.length("text").cast("long").alias("score"))
    return component_survivors(comp, scores)


@parity(
    "ns_doc_curation_funnel",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, {_TOKS} AS toks,
               trim(regexp_replace(regexp_replace(lower(
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                       '[0-9][0-9 -]{{11,}}[0-9]', '<NUMBER>', 'g')),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text
        FROM documents
    ),
    scored AS (
        SELECT doc_id, clean_text, toks,
               len(toks) AS n_tokens,
               CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS alpha_ratio,
               CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
               len(list_filter(toks, t -> t IN ({_STOP_EN}))) AS s_en,
               len(list_filter(toks, t -> t IN ({_STOP_ES}))) AS s_es,
               len(list_filter(toks, t -> t IN ({_STOP_DE}))) AS s_de,
               {_md5h('CAST(doc_id AS VARCHAR)', 100)} AS bucket
        FROM base
    ),
    flagged AS (
        SELECT doc_id, clean_text, toks, bucket,
               CAST(distinct_ratio * alpha_ratio AS DECIMAL(18,12)) AS quality,
               CASE WHEN greatest(s_en, s_es, s_de) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_es, s_de) THEN 'en'
                    WHEN s_es = greatest(s_en, s_es, s_de) THEN 'es'
                    ELSE 'de' END AS predicted_lang,
               (n_tokens >= 20 AND alpha_ratio >= 0.5) AS q_pass
        FROM scored
    ),
    pooled AS (
        SELECT *,
               q_pass AND predicted_lang IN ('en', 'es') AS pool,
               MIN(CASE WHEN q_pass AND predicted_lang IN ('en', 'es')
                        THEN doc_id END)
                   OVER (PARTITION BY sha256(clean_text)) AS pool_survivor
        FROM flagged
    ),
    final AS (
        SELECT *,
               pool AND doc_id = pool_survivor AS survives,
               pool AND doc_id = pool_survivor
                    AND bucket < CASE WHEN predicted_lang = 'en' THEN 50 ELSE 20 END
                   AS sampled
        FROM pooled
    )
    SELECT predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS total_docs,
           CAST(SUM(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS after_quality,
           CAST(SUM(CASE WHEN pool THEN 1 ELSE 0 END) AS BIGINT) AS after_lang,
           CAST(SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT) AS after_dedupe,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
           CAST(COALESCE(SUM(CASE WHEN sampled THEN
               list_sum(list_transform(toks, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))
               END), 0) AS BIGINT) AS token_budget,
           CAST(round(COALESCE(SUM(CASE WHEN sampled THEN quality END), 0), 6) AS DOUBLE) AS quality_sum
    FROM final
    GROUP BY predicted_lang
    """,
)
def ns_doc_curation_funnel(spark, sf_dir):
    """The composed training-data curation pipeline in ONE query, with
    per-stage funnel accounting per detected language: quality gate
    (>=20 tokens, >=50% alpha) -> language gate (en/es) -> exact dedupe on
    normalized+scrubbed text (min-doc_id survivor within the passing pool)
    -> deterministic stratified sample (md5 bucket, 50% en / 20% es) ->
    final token budget (BPE-ish estimate) + quality mass.

    This is the report a data-curation run actually publishes: how many
    documents each stage dropped and what the surviving token budget is.
    Single pass over the corpus: the only shuffles are the dedupe-hash
    window and the final groupBy; every gate is a map-side flag, so the
    funnel costs the same as the most expensive single stage. Conditional
    aggregation gives all stage counts without re-scanning (no per-stage
    jobs); quality mass sums DECIMAL(18,12) per-row values
    (order-independent exact), pins the sum via round(.., 6), and renders
    DOUBLE per the oracle convention.
    """
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", tx.tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    stats = tx.quality_stats(F.col("text"), toks=toks)
    clean = tx.normalize_text(tx.scrub_pii_ish(F.col("text")))
    scored = d.select(
        "doc_id",
        "text",
        clean.alias("clean_text"),
        stats["n_tokens"].alias("n_tokens"),
        stats["alpha_ratio"].alias("alpha_ratio"),
        # scale 12, not 6: at sf1 ~5 of 45k quality quotients land on
        # scale-6 half-way boundaries where the engines' double->decimal
        # casts disagree by 1e-6 each; at scale 12 a disagreement is 1e-12
        # and the round(sum, 6) output pin absorbs it (sum-at-12/
        # pin-output-at-6 — the embedding_stats discipline)
        (
            (stats["n_distinct_tokens"].cast("double") / stats["n_tokens"].cast("double"))
            * stats["alpha_ratio"]
        )
        .cast("decimal(18,12)")
        .alias("quality"),
        tx.language_id(F.col("text"), toks=toks).alias("predicted_lang"),
        tx.sample_bucket(F.col("doc_id")).alias("bucket"),
        tx.bpe_ish_token_count(F.col("text"), toks=toks).alias("bpe_tokens"),
    )
    q_pass = (F.col("n_tokens") >= 20) & (F.col("alpha_ratio") >= 0.5)
    pool = q_pass & F.col("predicted_lang").isin("en", "es")
    w = Window.partitionBy(F.sha2(F.col("clean_text"), 256))
    pooled = scored.select(
        "*",
        q_pass.alias("q_pass"),
        pool.alias("pool"),
        F.min(F.when(pool, F.col("doc_id"))).over(w).alias("pool_survivor"),
    )
    survives = F.col("pool") & (F.col("doc_id") == F.col("pool_survivor"))
    rate = F.when(F.col("predicted_lang") == "en", 50).otherwise(20)
    sampled = survives & (F.col("bucket") < rate)
    return (
        pooled.select("*", survives.alias("survives"), sampled.alias("sampled"))
        .groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_docs"),
            F.sum(F.when(F.col("q_pass"), 1).otherwise(0)).cast("long").alias("after_quality"),
            F.sum(F.when(F.col("pool"), 1).otherwise(0)).cast("long").alias("after_lang"),
            F.sum(F.when(F.col("survives"), 1).otherwise(0)).cast("long").alias("after_dedupe"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0)).cast("long").alias("sampled_docs"),
            F.coalesce(F.sum(F.when(F.col("sampled"), F.col("bpe_tokens"))), F.lit(0))
            .cast("long")
            .alias("token_budget"),
            # round(.., 6) is the output pin: Spark decimal HALF_UP ==
            # DuckDB round() (half away from zero) — verified on ties;
            # a plain DECIMAL rescale CAST would NOT agree (DuckDB
            # truncates decimal->decimal downscale)
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("sampled"), F.col("quality"))),
                    F.lit(0),
                ),
                6,
            )
            .cast("double")
            .alias("quality_sum"),
        )
    )


# --------------------------------------------------------------------------
# Driver-slot composite: capped + uncapped jaccard in one oracle-paired
# query (keeps the driver's 50-entry verification window open, SURVEY.md §8).
# --------------------------------------------------------------------------

_JACCARD_MODES = [
    ("uncapped", "ns_dedup_ngram_jaccard"),
    ("capped", "ns_dedup_ngram_jaccard_capped"),
    ("adaptive", "ns_dedup_ngram_jaccard_adaptive"),
]


def _jaccard_modes_oracle() -> str:
    from .registry import ALL_ORACLE_SQL

    return "\nUNION ALL\n".join(
        f"SELECT '{mode}' AS mode, id_a, id_b, n_common, jaccard "
        f"FROM ({ALL_ORACLE_SQL[name]}) __{mode}"
        for mode, name in _JACCARD_MODES
    )


@parity("ns_dedup_ngram_jaccard_modes", oracle=_jaccard_modes_oracle())
def ns_dedup_ngram_jaccard_modes(spark, sf_dir):
    """Exact n-gram Jaccard pairs three ways — uncapped posting-list join,
    the fixed max_shingle_freq=5 stop-shingle cap, and the production
    corpus-adaptive cap (max(8, ceil(n/1000))) — unioned with a mode label
    so one driver slot certifies all three universes."""
    from .registry import ALL_QUERIES

    out = None
    for mode, name in _JACCARD_MODES:
        d = ALL_QUERIES[name](spark, sf_dir).select(
            F.lit(mode).alias("mode"), "id_a", "id_b", "n_common", "jaccard"
        )
        out = d if out is None else out.unionByName(d)
    return out


# --------------------------------------------------------------------------
# Corpus-statistics scoring (operators/scoring.py): BM25 retrieval and the
# unigram-LM quality signal. Scores are rational arithmetic over exact
# integers in a pinned association order, so both engines agree bit-for-bit
# (the module doc explains why ln-idf / log-perplexity stay off the parity
# surface).
# --------------------------------------------------------------------------

_BM25_TERMS = ["spark", "join", "vector"]
_BM25_K = 10
# mirrors operators/scoring.py bm25_topk with k1=1.2, b=0.75, idf="odds"
_BM25_SCORE_SQL = " + ".join(
    f"((((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE)) + 0.5::DOUBLE)"
    f" / (CAST(df_{i} AS DOUBLE) + 0.5::DOUBLE))"
    f" * (CAST(tf_{i} AS DOUBLE) * 2.2::DOUBLE))"
    f" / (CAST(tf_{i} AS DOUBLE) + (1.2::DOUBLE * (0.25::DOUBLE"
    f" + (0.75::DOUBLE * (CAST(dl AS DOUBLE)"
    f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))"
    for i in range(len(_BM25_TERMS))
)


@parity(
    "ns_text_bm25_topk",
    # COALESCE mirrors the operator's NULL-text-as-empty-doc rule (no NULL
    # text in the driver corpus, but the contract stays aligned)
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         string_split(lower(COALESCE(text, '')), ' ') AS toks
                  FROM documents),
    base AS (
        SELECT doc_id AS id, CAST(len(toks) AS BIGINT) AS dl,
               {", ".join(f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{i}" for i, t in enumerate(_BM25_TERMS))}
        FROM toks
    ),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS sum_dl,
               {", ".join(f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}" for i in range(len(_BM25_TERMS)))}
        FROM base
    ),
    scored AS (
        SELECT id, dl,
               {_BM25_SCORE_SQL} AS score,
               CAST({" + ".join(f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_BM25_TERMS)))} AS BIGINT)
                   AS matched_terms
        FROM base, st
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank,
           id, score, dl, matched_terms
    FROM scored
    QUALIFY rank <= {_BM25_K}
    """,
)
def ns_text_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval (terms: spark/join/vector, k1=1.2, b=0.75,
    rational odds-idf for cross-engine bit-parity): one corpus-stats
    aggregate (N, Σdl, per-term df in a single pass), broadcast back, pure
    map-side scoring, TakeOrdered top-10 — two scans, zero token shuffles
    at any corpus size."""
    from ..operators.scoring import bm25_topk

    return bm25_topk(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        _BM25_TERMS, k=_BM25_K,
    )


@parity(
    "ns_text_unigram_lm",
    oracle=f"""
    WITH tt AS (
        SELECT UNNEST({_TOKS}) AS token FROM documents WHERE doc_id % 3 <> 0
    ),
    vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tt GROUP BY 1),
    tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens FROM vocab),
    ex AS (
        SELECT doc_id AS id, UNNEST({_TOKS}) AS token
        FROM documents WHERE doc_id % 3 = 0
    ),
    j AS (
        SELECT id, v.freq, t.total_tokens
        FROM ex LEFT JOIN vocab v USING (token) CROSS JOIN tot t
    )
    SELECT id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN freq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           CAST(SUM(COALESCE(freq, 0)) AS BIGINT) AS sum_freq,
           CAST(MIN(freq) AS BIGINT) AS min_freq,
           CAST(MAX(freq) AS BIGINT) AS max_freq,
           CAST(SUM(CAST(COALESCE(CAST(freq AS DOUBLE) / CAST(total_tokens AS DOUBLE),
                                  0.0::DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_token_prob
    FROM j GROUP BY id
    """,
)
def ns_text_unigram_lm(spark, sf_dir):
    """Unigram-LM quality scoring (the CCNet perplexity-proxy shape) on a
    train/score split: vocabulary from docs with doc_id % 3 != 0, scored
    docs are the rest. One vocabulary-sized shuffle builds the table; the
    broadcast join + per-doc re-aggregate shuffles one compact row per
    document. Integer frequency anchors + a DECIMAL-pinned mean token
    probability keep the surface hash-deterministic (mean ln-surprisal is
    the production knob, off the parity surface)."""
    from ..operators.scoring import unigram_lm_scores, unigram_table

    d = table(spark, sf_dir, "documents")
    vocab = unigram_table(d.filter(F.col("doc_id") % 3 != 0), "text")
    return unigram_lm_scores(
        d.filter(F.col("doc_id") % 3 == 0), "doc_id", "text", vocab=vocab
    )
