"""Corpus-statistics document scoring: BM25 retrieval and unigram-LM
quality scores.

Two operators that share a shape — a tiny corpus-statistics aggregate
joined back against a map-side per-document scoring pass:

- :func:`bm25_topk`: classic BM25 keyword retrieval for a constant query
  term set. Pass 1 computes N, Σdl and per-term document frequencies in ONE
  aggregate over a map-side projection (per-term tf columns are HOF filter
  counts — no explode, no shuffle of tokens). The 1-row stats frame is
  broadcast back; scoring is pure per-row double arithmetic and the global
  top-k runs as TakeOrdered (per-partition partial top-k, no full sort
  shuffle). At 100 TB: two corpus scans, zero token shuffles, a k-row
  result.

- :func:`unigram_lm_scores`: the CCNet-style perplexity-proxy quality
  signal — score each document by its tokens' corpus frequencies. Pass 1
  builds the unigram table (one groupBy token — the only token-wide
  shuffle, bounded by vocabulary size); pass 2 explodes doc tokens and
  broadcast-joins the vocabulary (vocabularies are tiny relative to any
  corpus; for vocabularies past broadcast size swap in a shuffle join —
  semantics unchanged), then re-aggregates per doc with map-side partial
  aggregation (exploded tokens of one doc stay in their partition, so the
  doc-level shuffle carries one compact row per document).

Cross-engine determinism (plans/registry.py rules): every score is built
from exact integers via IEEE double division/multiplication in a pinned
association order, so DuckDB reproduces them bit-for-bit. BM25's textbook
``ln``-idf is NOT IEEE-pinned across engines (libm vs Math.log may differ
in the last ulp), so the parity surface uses the rational "odds" idf
``(N - df + 0.5) / (df + 0.5)`` — same monotone ordering, same saturation
behavior; ``idf="ln"`` (ln(1 + odds), the Robertson-Spärck-Jones form)
stays available for production use where cross-engine bit-parity is not a
requirement. The unigram scorer exposes integer/rational outputs (token
frequencies and a mean token probability) rather than log-perplexity for
the same reason; ``surprisal=True`` adds the ln-based mean surprisal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf: str = "odds",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a constant query-term set.

    Returns ``(rank, id, score, dl, matched_terms)`` ordered by
    ``(score DESC, id)``. ``idf="odds"`` uses the rational
    ``(N - df + 0.5) / (df + 0.5)`` (cross-engine bit-deterministic);
    ``idf="ln"`` uses ``ln(1 + odds)`` (textbook BM25+).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if idf not in ("odds", "ln"):
        raise ValueError("idf must be 'odds' or 'ln'")

    # NULL text scores as an empty document (dl=1 single empty token,
    # tf=0) instead of propagating NULL through every stat — keeps the
    # whole output non-null and cross-engine deterministic
    toksed = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    )
    base = toksed.select(
        "id",
        F.size("__toks").cast("long").alias("dl"),
        *[
            _tf(F.col("__toks"), t).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("long").alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    dl_d = F.col("dl").cast("double")
    # norm is shared by every term's denominator: k1 * (1 - b + b * dl/avgdl)
    norm = F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * (dl_d / avgdl)))

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        df_d = F.col(f"df_{i}").cast("double")
        odds = (F.col("n_docs").cast("double") - df_d + F.lit(0.5)) / (
            df_d + F.lit(0.5)
        )
        idf_c = F.log(F.lit(1.0) + odds) if idf == "ln" else odds
        return (idf_c * (tf * F.lit(k1 + 1.0))) / (tf + norm)

    score = term_score(0)
    for i in range(1, len(query_terms)):
        score = score + term_score(i)
    matched = sum(
        [(F.col(f"tf_{i}") > 0).cast("long") for i in range(len(query_terms))],
        F.lit(0).cast("long"),
    )

    topk = (
        scored.select(
            "id",
            score.alias("score"),
            "dl",
            matched.cast("long").alias("matched_terms"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "id", "score", "dl", "matched_terms"
    )


def unigram_table(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram frequency table ``(token, freq)`` plus the corpus
    total attached to every row (``total_tokens``) — one token-wide
    groupBy shuffle, vocabulary-sized output."""
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    total = vocab.agg(F.sum("freq").cast("long").alias("total_tokens"))
    return vocab.crossJoin(F.broadcast(total))


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    surprisal: bool = False,
) -> DataFrame:
    """Per-document unigram-LM quality signals against ``vocab`` (defaults
    to a table built from ``docs`` itself — self-scoring, the common
    quality-filter setup; pass a reference-corpus table to score against a
    clean distribution à la CCNet).

    Returns ``(id, n_tokens, oov_tokens, sum_freq, min_freq, max_freq,
    mean_token_prob)``: integer frequency anchors plus the arithmetic mean
    of per-token probabilities ``freq/total`` (exact-sum via DECIMAL(18,6)
    per-token pinning, so the double is cross-engine deterministic). With
    ``surprisal=True`` adds ``mean_surprisal`` = mean of ``-ln(freq/total)``
    over the IN-VOCAB tokens (the perplexity proxy; ln is not bit-pinned
    across engines — keep it out of hash-checked parity surfaces).
    Out-of-vocabulary tokens count in ``oov_tokens`` and contribute
    probability 0 to ``mean_token_prob``; they are excluded from
    ``mean_surprisal`` (no defined surprisal) — filter on
    ``oov_tokens / n_tokens`` alongside it.
    """
    if vocab is None:
        vocab = unigram_table(docs, text_col)

    ex = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    joined = ex.join(F.broadcast(vocab), "token", "left")
    prob = F.col("freq").cast("double") / F.col("total_tokens").cast("double")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("freq").isNull().cast("long")).cast("long").alias("oov_tokens"),
        F.sum(F.coalesce(F.col("freq"), F.lit(0))).cast("long").alias("sum_freq"),
        F.min("freq").cast("long").alias("min_freq"),
        F.max("freq").cast("long").alias("max_freq"),
        (
            F.sum(F.coalesce(prob, F.lit(0.0)).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_token_prob"),
    ]
    if surprisal:
        # surprisal is undefined for OOV tokens (-ln 0); average over the
        # IN-VOCAB tokens only — dividing by all tokens would DEFLATE the
        # signal exactly for OOV-heavy junk. Combine with oov_tokens /
        # n_tokens downstream for the full quality picture; a doc with no
        # in-vocab tokens reports NULL (no distribution to score against).
        aggs.append(
            (
                F.sum(-F.log(prob)).cast("double")
                / F.count(F.col("freq")).cast("double")
            ).alias("mean_surprisal")
        )
    return joined.groupBy("id").agg(*aggs)
