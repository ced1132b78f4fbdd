"""Text-analysis column expressions (north-star LLM-data operators).

All pure ``pyspark.sql.functions`` compositions — JVM-side, codegen-friendly,
no Python in the hot path. Each primitive has an exact DuckDB twin (the
parity oracles in plans/parity_text.py) built on the same md5-based integer
hash (scalars.md5_long), so results are cross-engine deterministic.

Scale notes: everything here is embarrassingly parallel per row (no shuffle);
the shuffles happen in the dedupe operators that consume these primitives.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime for minhash/fingerprint modular arithmetic. Small enough that
# a*h + b stays < 2^62 (no BIGINT overflow in either engine).
MERSENNE31 = 2_147_483_647
FP_PRIME = 1_000_000_007

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
STOPWORDS_ES = ("el", "la", "de", "y", "que", "los")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def token_hashes(
    text: Column, modulus: int = MERSENNE31, *, toks: Column | None = None
) -> Column:
    """Per-token cross-engine integer hashes (md5-prefix based).

    Pass ``toks`` (a projected token-array column) in hot paths so the
    tokenizer isn't re-evaluated inside downstream HOF consumers.
    """
    from .scalars import md5_long

    return F.transform(
        toks if toks is not None else tokens(text),
        lambda t: md5_long(t, modulus=modulus),
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array column:
    ``['a b c', 'b c d', ...]``.

    ``toks`` should be a PROJECTED column (attribute), not an inline
    ``split(...)`` expression: the slice lambda references it once per gram,
    and Catalyst re-evaluates outer expressions inside higher-order-function
    lambdas — an inline tokenizer here re-splits the text k times per row.

    Texts shorter than ``n`` tokens yield an empty array (guarded because
    Spark's ``sequence(1, 0)`` counts DOWN rather than returning empty).
    """
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles straight from a text column.

    Convenience form — it inlines the tokenizer into the per-gram lambda
    (re-split per gram). Hot paths should project :func:`tokens` as a
    column and call :func:`shingles_from_tokens` on the attribute instead.
    """
    return shingles_from_tokens(tokens(text), n)


def shingle_hashes(text: Column, n: int = 3, modulus: int = MERSENNE31) -> Column:
    from .scalars import md5_long

    return F.transform(shingles(text, n), lambda s: md5_long(s, modulus=modulus))


def minhash_signature(hashed_shingles: Column, params: list[tuple[int, int]]) -> Column:
    """MinHash signature: for each (a, b), min over shingles of (a*h+b) % P.

    ``params`` are engine constants (deterministic, shared with the oracle).
    Empty shingle sets yield P (the max sentinel) so empty docs never
    collide with real ones by accident.

    Single ``F.aggregate`` fold: one pass over the shingle array computes all
    k slots at once. The naive per-slot ``array_min(transform(...))`` form
    inlines the whole shingle+md5 subtree k times (Catalyst does not CSE
    across higher-order functions) and was ~25x slower.
    """
    init = F.array(*[F.lit(MERSENNE31).cast("long") for _ in params])
    return F.aggregate(
        hashed_shingles,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31)
                    for a, b in params
                ]
            ),
            lambda x, y: F.least(x, y),
        ),
    )


def simhash32(text: Column) -> Column:
    """32-bit SimHash over token hashes.

    bit b is set when sum over tokens of ±1 (by the token hash's bit b) is
    positive; near-duplicates differ in few bits (hamming via bit_count).
    """
    hs = token_hashes(text)
    # Single fold: acc is a 32-slot vote vector; finish packs positive votes
    # into the signature bits. (32 separate per-bit aggregates re-inlined the
    # token-hash subtree 32x — same trap as minhash_signature.)
    votes = F.aggregate(
        hs,
        F.array(*[F.lit(0).cast("long") for _ in range(32)]),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for b in range(32)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    weighted = F.zip_with(
        votes,
        F.array(*[F.lit(1 << b).cast("long") for b in range(32)]),
        lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def fingerprint(
    text: Column, prime: int = FP_PRIME, *, toks: Column | None = None
) -> Column:
    """Order-sensitive rolling document fingerprint:
    fold((acc * 31 + h_token) % P) over token hashes."""
    hs = token_hashes(text, modulus=prime, toks=toks)
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(prime),
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_scores(
    text: Column, *, toks: Column | None = None
) -> dict[str, Column]:
    """Stopword-list language-ID scores (n-gram-free heuristic).

    Each score is a separate HOF filter (codegen-fallback: no subexpression
    sharing of HOF children) — pass a projected ``toks`` column so the text
    isn't re-split once per language list.
    """
    toks = toks if toks is not None else tokens(text)
    return {
        "en": _stopword_hits(toks, STOPWORDS_EN),
        "es": _stopword_hits(toks, STOPWORDS_ES),
        "de": _stopword_hits(toks, STOPWORDS_DE),
    }


def language_id(text: Column, *, toks: Column | None = None) -> Column:
    """argmax of language_scores with deterministic tie order en > es > de;
    'und' (undetermined) when no stopword hits at all."""
    s = language_scores(text, toks=toks)
    best = F.greatest(s["en"], s["es"], s["de"])
    return (
        F.when(best == 0, "und")
        .when(s["en"] == best, "en")
        .when(s["es"] == best, "es")
        .otherwise("de")
    )


def quality_stats(
    text: Column, *, toks: Column | None = None
) -> dict[str, Column]:
    """Quality-scoring signals: lengths, word stats, alpha/stopword ratios.

    Ratios are double-typed per-row arithmetic (IEEE-identical across
    engines). The token array feeds several HOF consumers (three stopword
    filters, distinct, size) that each re-evaluate an inline tokenizer —
    pass a projected ``toks`` column in hot paths.
    """
    toks = toks if toks is not None else tokens(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    stop_all = (
        _stopword_hits(toks, STOPWORDS_EN)
        + _stopword_hits(toks, STOPWORDS_ES)
        + _stopword_hits(toks, STOPWORDS_DE)
    )
    return {
        "n_chars": n_char.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "avg_token_len": (
            (n_char - (n_tok - 1)).cast("double") / n_tok.cast("double")
        ),
        "alpha_ratio": alpha_chars.cast("double") / n_char.cast("double"),
        "stopword_ratio": stop_all.cast("double") / n_tok.cast("double"),
    }


def bpe_ish_token_count(text: Column, *, toks: Column | None = None) -> Column:
    """LLM-token estimate: count of word pieces after splitting on
    whitespace and breaking words into runs of <=4 chars (a BPE-ish regex
    proxy: ceil(len/4) per word)."""
    toks = toks if toks is not None else tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )


def ngram_repetition_stats(text: Column, n: int) -> dict[str, Column]:
    """Gopher-style repetition signals over word n-grams (one doc, one row).

    - ``dup_frac``: fraction of n-gram occurrences that are repeats of an
      earlier occurrence (``1 - distinct/total``).
    - ``top_frac``: fraction of occurrences covered by the single most
      frequent n-gram.

    Both are the per-document repetition filters of a training-data quality
    pipeline (highly repetitive machine-generated text scores high). Pure
    higher-order array expressions: zero shuffle, whole-stage codegen, one
    pass per row.

    Shape matters here: the naive form — ``filter(ng, x == d)`` nested
    inside ``transform(array_distinct(ng), d -> ...)`` — re-inlines the
    whole shingle subtree per lambda invocation (Catalyst does not CSE
    across higher-order functions) and measured ~80x slower. Instead the
    gram array is SORTED once and a single struct-accumulator fold walks
    adjacent elements: equal neighbors extend a run, the longest run IS the
    top-gram count, and run starts count the distinct grams — O(k log k)
    per row, with the gram array referenced from a separate projection so
    it is computed exactly once (CollapseProject keeps multi-referenced
    non-cheap expressions un-inlined).

    Docs shorter than ``n`` tokens have no n-grams: both fractions are 0.0
    (not NULL) so downstream threshold filters treat them as non-repetitive.

    For hot paths, project the gram array as a named column first and feed
    it to :func:`_repetition_from_grams` directly (as ns_repetition_signals
    does) — this convenience wrapper inlines the shingle subtree into each
    of its two references.
    """
    return _repetition_from_grams(shingles(text, n))


def repetition_fold(ng: Column) -> Column:
    """One-pass repetition fold over a gram-array column: returns a struct
    ``(total, max_run, n_distinct)`` where ``max_run`` is the occurrence
    count of the most frequent gram (longest equal-run in the sorted array)
    and ``n_distinct`` the distinct-gram count.

    Project THIS as a named column, then derive fractions from its fields
    (:func:`repetition_fracs`) in a later select — field access on a struct
    attribute is free, whereas accessing two fields of this expression
    inline would run the whole fold twice.
    """
    # NULL sentinel, not '': a genuine empty-string first gram (possible
    # when a caller feeds n=1 "grams" of empty tokens) must start a run,
    # and '' == '' would silently continue one. NULL == x is NULL, which
    # F.when treats as false -> first element always starts run 1.
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("max_run"),
        F.lit(0).cast("long").alias("n_distinct"),
        F.lit(0).cast("long").alias("total"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["max_run"], run).alias("max_run"),
            (acc["n_distinct"] + F.when(same, 0).otherwise(1))
            .cast("long")
            .alias("n_distinct"),
            (acc["total"] + 1).alias("total"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            acc["total"].alias("total"),
            acc["max_run"].alias("max_run"),
            acc["n_distinct"].alias("n_distinct"),
        )

    # total is counted inside the accumulator so the returned struct is ONE
    # aggregate expression — any extra reference (e.g. a separate size(ng))
    # would re-inline the whole fold.
    return F.aggregate(F.array_sort(ng), zero, step, finish)


def repetition_fracs(fold_col: Column) -> dict[str, Column]:
    """Final repetition signals from a projected :func:`repetition_fold`
    struct column (cheap field accesses only)."""
    total = fold_col["total"]
    no_grams = total == 0
    return {
        "n_ngrams": total,
        "dup_frac": F.when(no_grams, F.lit(0.0)).otherwise(
            (total - fold_col["n_distinct"]).cast("double") / total.cast("double")
        ),
        "top_frac": F.when(no_grams, F.lit(0.0)).otherwise(
            fold_col["max_run"].cast("double") / total.cast("double")
        ),
    }


def _repetition_from_grams(ng: Column) -> dict[str, Column]:
    """Convenience inline variant (duplicates the fold per field — use the
    fold/fracs two-stage form in hot paths)."""
    return repetition_fracs(repetition_fold(ng))


def normalize_text(text: Column) -> Column:
    """Canonical text cleaning: lowercase, strip non-alphanumerics (keep
    spaces), collapse whitespace runs, trim. The standard pre-tokenization
    normalizer of a training-data pipeline; pure JVM regexp ops."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def scrub_pii_ish(text: Column) -> Column:
    """Redact email-shaped and long-digit-run substrings (credit-card/phone
    shaped) with typed placeholders — the lexical first pass of a PII scrub.
    A real pipeline adds NER-based passes downstream; this layer is the
    cheap, deterministic, regex-only stage that runs on every byte."""
    t = F.regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    t = F.regexp_replace(t, "[0-9][0-9 -]{11,}[0-9]", "<NUMBER>")
    return t


def sample_bucket(key: Column, modulus: int = 100) -> Column:
    """Deterministic sampling bucket in [0, modulus): md5-derived, so the
    same row lands in the same bucket in every engine and every run —
    reproducible train/eval splits without RNG state."""
    from .scalars import md5_long

    return md5_long(key.cast("string"), modulus=modulus)


def sample_exact_k(
    df, strata_cols: list[str], id_col: str, k: int
):
    """EXACTLY ``k`` rows per stratum (fewer only when the stratum is
    smaller), chosen deterministically by md5 order of the id — the
    eval-set construction primitive, complementing the rate-based
    :func:`sample_bucket` (a rate can't promise "exactly 500 per
    language"). No RNG: the same k rows come back on any engine, run, or
    cluster layout.

    One shuffle (the per-stratum window). At 100 TB strata are typically
    few and wide: the md5 sort key spreads ties uniformly, and the rank
    filter cuts to k rows per stratum at the window operator — Spark's
    WindowGroupLimit pushes the top-k into the shuffle's map side, so the
    exchange never carries whole strata for small k.
    """
    from pyspark.sql.window import Window

    from .scalars import md5_long

    w = Window.partitionBy(*strata_cols).orderBy(
        md5_long(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def chunk_bounds(toks: Column, chunk_tokens: int, overlap: int = 0) -> Column:
    """Chunk-start offsets (1-based, into the token array) for fixed-size
    overlapping windows: starts at 1, 1+stride, 1+2*stride, ... with
    ``stride = chunk_tokens - overlap``. A document shorter than one chunk
    yields the single start 1 (empty docs too — the chunker emits one empty
    chunk so every document stays addressable downstream).

    Pure map-side expression — the chunk fan-out happens via explode in the
    caller, so a 100 TB corpus chunks with zero shuffle.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    n = F.size(toks)
    # number of chunks = 1 + ceil(max(n - chunk_tokens, 0) / stride)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = (
        F.lit(1) + F.ceil(extra.cast("double") / F.lit(stride)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride + 1
    )


def chunk_documents(
    df, id_col: str, text_col: str, chunk_tokens: int = 128, overlap: int = 16
):
    """Split documents into fixed-token overlapping chunks — the
    context-window packing precursor (long-document training shards, RAG
    indexing). Returns ``(id_col, chunk_idx, chunk_text, n_tokens)`` with
    chunk_idx 0-based in document order.

    Deterministic and engine-portable: whitespace tokens, slice windows,
    no RNG. Tokens project once per row; the explode fans out start
    offsets only (generator-adjacent expressions re-evaluate per exploded
    row — the slice happens AFTER the explode, referencing attributes).
    """
    toksed = df.select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        "__toks",
        F.posexplode(
            chunk_bounds(F.col("__toks"), chunk_tokens, overlap)
        ).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return toksed.select(
        id_col,
        F.col("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def cdc_chunk_documents(
    df, id_col: str, text_col: str, divisor: int = 8
):
    """Content-defined chunking: boundaries fall AFTER any token whose
    hash is ``0 mod divisor`` (expected chunk length = ``divisor``
    tokens), so chunk boundaries are a function of CONTENT, not position
    — the property fixed-window chunking lacks. Insert a sentence at the
    top of a document and every fixed window shifts (all chunk hashes
    change, chunk-level dedup finds nothing); with CDC only the chunks up
    to the next boundary change and every later chunk hash survives —
    the rolling-hash trick of rsync/LBFS applied to token streams, which
    is what makes chunk-level dedup robust on edited/boilerplate-wrapped
    documents.

    Returns ``(id_col, chunk_idx, chunk_text, n_tokens)``, chunk_idx
    0-based. Purely map-side HOFs over ONE projected token array (hash
    filter for boundary positions, zip_with over start/end position
    arrays, slice per chunk); deterministic md5 token hashes shared with
    the DuckDB oracle.

    Case fidelity: ``chunk_text`` preserves the SOURCE case — tokens
    come from a raw whitespace split, and only the boundary hash
    lowercases its token. Boundary positions are therefore identical to
    a fully-lowercased chunking (same chunks, same ``n_tokens``), but a
    downstream cleaner that reassembles documents from kept chunks
    (``remove_shared_spans``) returns the original text, not a
    case-folded copy. Consumers that want case-insensitive chunk
    CONTENT identity (dedup, span frequency) must lowercase the chunk
    text in their own hash."""
    from .scalars import md5_long

    toks = F.col("__toks")
    # guard: sequence(1, 0) counts DOWN to [1, 0] and element_at(toks, 0)
    # throws — the same trap shingles_from_tokens guards. tokens()=split
    # never yields an empty array today, but a tokenizer change must not
    # turn this probe into a runtime crash.
    positions = F.when(
        F.size(toks) >= 1, F.sequence(F.lit(1), F.size(toks))
    ).otherwise(F.array().cast("array<int>"))
    bpos = F.filter(
        positions,
        lambda i: md5_long(F.lower(F.element_at(toks, i))) % divisor == 0,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(F.size(toks)))
    # a boundary on the LAST token leaves a trailing empty (start > end)
    # pair — drop it with the zip_with null and the filter below
    chunks = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.when(
                e >= s, F.array_join(F.slice(toks, s, e - s + 1), " ")
            ),
        ),
        lambda c: c.isNotNull(),
    )
    return (
        df.select(id_col, F.split(F.col(text_col), " ").alias("__toks"))
        .select(id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .select(
            id_col,
            "chunk_idx",
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias(
                "n_tokens"
            ),
        )
    )


# --------------------------------------------------------------------------
# C4-style line-level quality filtering (Raffel et al. 2020 §2.2): drop
# boilerplate lines by rule before document-level filters run. Rules apply
# per line in a FIXED order so each dropped line has exactly one attributed
# reason (first failing rule wins) and the per-rule counters partition
# n_lines exactly.
# --------------------------------------------------------------------------

C4_BLOCKLIST = ("lorem ipsum", "javascript", "{")


def _line_word_count(line: Column) -> Column:
    return F.size(F.split(F.trim(line), " +"))


def _line_ends_terminal(line: Column) -> Column:
    t = F.trim(line)
    return t.endswith(".") | t.endswith("!") | t.endswith("?")


def _line_blocklisted(line: Column, blocklist: tuple[str, ...]) -> Column:
    lowered = F.lower(line)
    hit = F.lit(False)
    for phrase in blocklist:
        hit = hit | lowered.contains(phrase)
    return hit


def c4_line_filters(
    lines: Column,
    *,
    min_words: int = 5,
    blocklist: tuple[str, ...] = C4_BLOCKLIST,
) -> dict[str, Column]:
    """C4-style line filters over a PROJECTED line-array column.

    Rule order (first failing rule attributes the drop):
    1. ``short``     — fewer than ``min_words`` whitespace words;
    2. ``nopunct``   — does not end in terminal punctuation (. ! ?);
    3. ``blocklist`` — contains a boilerplate phrase (case-insensitive).

    Returns column expressions ``kept_lines`` (order-preserving array of
    surviving lines), ``n_lines``, ``n_short``, ``n_nopunct``,
    ``n_blocklist`` — counters partition the input exactly
    (``n_lines == size(kept_lines) + n_short + n_nopunct + n_blocklist``).

    ``lines`` must be a projected attribute (e.g. ``split`` materialized by
    a prior ``select``), not an inline expression: each rule is a separate
    array pass, and Catalyst re-evaluates outer expressions inside HOF
    lambdas. Four O(n_lines) passes per row, zero shuffle — line filtering
    at 100 TB is embarrassingly parallel.
    """

    def short(line: Column) -> Column:
        return _line_word_count(line) < min_words

    def nopunct(line: Column) -> Column:
        return ~short(line) & ~_line_ends_terminal(line)

    def blocked(line: Column) -> Column:
        return (
            ~short(line)
            & _line_ends_terminal(line)
            & _line_blocklisted(line, blocklist)
        )

    def kept(line: Column) -> Column:
        return (
            ~short(line)
            & _line_ends_terminal(line)
            & ~_line_blocklisted(line, blocklist)
        )

    count = lambda pred: F.size(F.filter(lines, pred)).cast("long")  # noqa: E731
    return {
        "kept_lines": F.filter(lines, kept),
        "n_lines": F.size(lines).cast("long"),
        "n_short": count(short),
        "n_nopunct": count(nopunct),
        "n_blocklist": count(blocked),
    }
