"""Byte-pair-encoding merge-rule induction (tokenizer training prep).

Classic BPE (Sennrich et al. 2016, ACL — public algorithm) never iterates
over the corpus: it collapses the corpus to the DISTINCT-WORD frequency
table once, seeds each word as a character sequence (+ an end-of-word
marker), then repeatedly merges the most frequent adjacent symbol pair,
weighting pair counts by word frequency.

Scale posture: the corpus contributes exactly ONE shuffle (the word-count
groupBy); every merge round then runs over the vocabulary-sized
segmentation table — pair counts are a vocab-row explode + sum(freq)
aggregate, the argmax is a 1-row TakeOrdered collect, and the merge
application is a per-word array fold over character-length arrays (tiny).
Each round re-seeds the table through an eager ``localCheckpoint`` so k
rounds never stack k nested plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx

END_OF_WORD = "</w>"


def _char_symbols(word: Column) -> Column:
    """A word's seed segmentation: its character sequence plus the
    end-of-word marker (shared by training seed and encoder OOV fallback)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens of lowercased text (the shared
    tokenizer, empty tokens dropped) — the one corpus-wide pass BPE
    training needs."""
    return (
        df.select(F.explode(tx.tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_segmentation(vocab: DataFrame) -> DataFrame:
    """(word, freq, symbols): each word as its character sequence plus the
    end-of-word marker."""
    return vocab.select(
        "word", "freq", _char_symbols(F.col("word")).alias("symbols")
    )


def _pair_counts(segs: DataFrame) -> DataFrame:
    s = F.col("symbols")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("a"), F.element_at(s, i + 1).alias("b")
        ),
    )
    return (
        segs.filter(F.size(s) >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(segs: DataFrame, a: str, b: str) -> DataFrame:
    """Replace adjacent (a, b) with the merged symbol a+b, left-to-right
    non-overlapping — the array fold a greedy scan requires ("a a a" with
    pair (a,a) merges positions 1-2, not 2-3). Arrays are character-length,
    so the fold's copy-per-step cost is bounded by max word length."""
    merged = a + b
    la, lb = F.lit(a), F.lit(b)

    def step(acc, x):
        can_merge = (
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb)
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    folded = F.aggregate(
        F.col("symbols"), F.array().cast("array<string>"), step
    )
    return segs.select("word", "freq", folded.alias("symbols"))


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    segs: DataFrame,
) -> DataFrame:
    """Encode a corpus with a learned segmentation table: each word maps to
    its symbol sequence via a BROADCAST join of the vocabulary (the
    dictionary is vocabulary-sized — it broadcasts at any corpus scale);
    out-of-vocabulary words fall back to their raw character sequence plus
    the end-of-word marker. Token order is preserved through a
    (pos, symbols) sort in the per-document re-aggregation — the one
    corpus shuffle, keyed by document.

    Returns ``(id, bpe_tokens, n_bpe_tokens)`` — one row per input
    document, including documents with NULL/empty/whitespace-only text
    (empty token array), per the repo's one-row-per-input convention.
    """
    ids = df.select(F.col(id_col).alias("__doc"))
    toks = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.posexplode(tx.tokens(F.col(text_col))).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    joined = toks.join(
        F.broadcast(segs.select("word", "symbols")), "word", "left"
    ).select(
        "__doc",
        "pos",
        F.coalesce(F.col("symbols"), _char_symbols(F.col("word"))).alias("symbols"),
    )
    agg = joined.groupBy("__doc").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "symbols"))),
                lambda s: s["symbols"],
            )
        ).alias("bpe_tokens")
    )
    empty = F.array().cast("array<string>")
    return ids.join(agg, "__doc", "left").select(
        F.col("__doc").alias(id_col),
        F.coalesce("bpe_tokens", empty).alias("bpe_tokens"),
        F.size(F.coalesce("bpe_tokens", empty)).cast("long").alias("n_bpe_tokens"),
    )


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_freq: int = 2,
) -> tuple[list[dict], DataFrame]:
    """Learn up to ``n_merges`` BPE merge rules from a corpus.

    Ties break deterministically (count desc, then (a, b) lexicographic),
    so retraining on the same corpus is bit-identical. Stops early when no
    pair reaches ``min_freq``. Returns ``(merges, segmentation)`` where
    ``merges`` is the ordered rule list (round, a, b, merged, cnt) and
    ``segmentation`` the final (word, freq, symbols) table.
    """
    segs = seed_segmentation(word_frequency_table(df, text_col))
    segs = segs.localCheckpoint(eager=True)
    merges: list[dict] = []
    for r in range(n_merges):
        top = (
            _pair_counts(segs)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append(
            {"round": r, "a": a, "b": b, "merged": a + b, "cnt": cnt}
        )
        # eager checkpoint: truncates the fold-on-fold lineage so round k
        # analyzes a 1-round plan, not a k-round tower
        segs = _apply_merge(segs, a, b).localCheckpoint(eager=True)
    return merges, segs
