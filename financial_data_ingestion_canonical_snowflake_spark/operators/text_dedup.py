"""Document-deduplication operators for LLM-data pipelines.

Four strategies, cheapest to most semantic:

- exact           sha-256 content hash groupBy (one shuffle)
- minhash_lsh     shingle MinHash signatures banded into LSH buckets;
                  candidate pairs only within a bucket (no O(n^2) pass)
- simhash         32-bit SimHash + hamming distance; prefix-bucketed
- ngram_jaccard   exact Jaccard over word shingles via shared-shingle join

Scale posture: every strategy avoids the quadratic cross join — candidates
come from equi-joins on bucket/shingle keys, which shuffle-partition cleanly
at 100 TB. Skewed buckets (a shingle appearing in millions of docs) should
be guarded with a frequency cap (``max_shingle_freq``) — stop-shingles are
dropped like stop-words.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars, text

# Deterministic MinHash parameters, shared verbatim with the DuckDB oracle
# (generated from a fixed linear recurrence; no RNG at import time).
def minhash_params(k: int = 16) -> list[tuple[int, int]]:
    params = []
    a, b = 1_103_515_245, 12_345
    for _ in range(k):
        params.append((a % text.MERSENNE31, b % text.MERSENNE31))
        a = (a * 1_664_525 + 1_013_904_223) % text.MERSENNE31
        b = (b * 22_695_477 + 1) % text.MERSENNE31
    return [(max(p_a, 1), p_b) for p_a, p_b in params]


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact content dedup: one row per distinct text hash with the survivor
    (min id — deterministic) and the duplicate count.

    ``payload_cols`` ride along with the SURVIVOR row (``min_by`` on the
    id — deterministic under unique ids): the columns a curation pipeline
    wants to keep for the representative document (lang, source, quality
    score) without a join back to the corpus."""
    h = scalars.sha256_hex(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"), *payload_cols)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
            *[F.min_by(c, F.col(id_col)).alias(c) for c in payload_cols],
        )
    )


def with_minhash_signature(
    df: DataFrame, text_col: str, num_hashes: int = 16, shingle_len: int = 3
) -> DataFrame:
    # tokens project as a real column first: the shingle slice-lambda then
    # references an attribute instead of re-splitting the text per gram
    # (outer expressions inside HOF lambdas are re-evaluated per element).
    # The temp column name is uniquified against the caller's schema so a
    # real "__toks" column is never clobbered.
    toks_col = "__toks"
    while toks_col in df.columns:
        toks_col += "_"
    toksed = df.withColumn(toks_col, text.tokens(F.col(text_col)))
    hashed = F.transform(
        text.shingles_from_tokens(F.col(toks_col), shingle_len),
        lambda s: scalars.md5_long(s, modulus=text.MERSENNE31),
    )
    sig = text.minhash_signature(hashed, minhash_params(num_hashes))
    return toksed.withColumn("minhash_sig", sig).drop(toks_col)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_len: int = 3
) -> DataFrame:
    """``(doc, minhash_sig)`` signature table for a corpus — the
    materialized artifact an incremental dedup pipeline persists between
    batches (signatures are tiny: num_hashes longs per doc)."""
    return with_minhash_signature(df, text_col, num_hashes, shingle_len).select(
        F.col(id_col).alias("doc"), "minhash_sig"
    )


def _banded(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    return sigs.select(
        "doc",
        "minhash_sig",
        F.posexplode(
            F.array(
                *[
                    F.array_join(
                        F.slice(F.col("minhash_sig"), b * rows_per_band + 1, rows_per_band),
                        "-",
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )


def _matching_minhashes() -> F.Column:
    """Full-signature agreement count for a (sig_a, sig_b) pair — computed
    MAP-SIDE, before any pair dedupe, so the dedupe shuffle carries
    (id_a, id_b, one long) instead of two 16-long signature arrays (the
    pattern similarity.lsh_topk_multiprobe established)."""
    return F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("long")


def _dedupe_scored_pairs(scored: DataFrame, min_matching: int) -> DataFrame:
    # A pair colliding in k bands appears k times with the SAME score;
    # max-agg on the id pair is the dedupe (no array-carrying distinct).
    return (
        scored.groupBy("id_a", "id_b")
        .agg(F.max("matching_minhashes").alias("matching_minhashes"))
        .filter(F.col("matching_minhashes") >= min_matching)
    )


def _cap_banded(
    frames: list[DataFrame], max_bucket_width: int | None
) -> list[DataFrame]:
    """Drop LSH buckets wider than ``max_bucket_width`` docs — counted over
    the COMBINED corpus (all frames), so the full and incremental paths
    agree on which buckets are degenerate.

    A boilerplate-heavy corpus (thousands of byte-identical license pages —
    the normal case at web scale) lands every copy in one ``(band,
    band_key)`` bucket; the self-join is |bucket|^2 rows on ONE shuffle
    partition. Buckets wider than the cap carry no *near*-dup signal the
    cheaper exact pre-pass (``exact_dedup``) doesn't already catch, so they
    are dropped like stop-shingles (``max_shingle_freq``).
    """
    if max_bucket_width is None:
        return frames
    if len(frames) == 1:
        # Single-frame (full self-join) fast path: a window count over the
        # bucket key instead of a groupBy+join — ONE shuffle on exactly the
        # partitioning the pair join needs next, so both join sides reuse
        # the capped frame's exchange and the guard costs no extra pass.
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_key")
        return [
            frames[0]
            .withColumn("__bucket_width", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_width") <= max_bucket_width)
            .drop("__bucket_width")
        ]
    # Multi-frame (incremental) path: widths count over the COMBINED key
    # stream, so a key-union aggregate is genuinely needed.
    keys = frames[0].select("band", "band_key")
    for f in frames[1:]:
        keys = keys.unionByName(f.select("band", "band_key"))
    keep = (
        keys.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("__bucket_width"))
        .filter(F.col("__bucket_width") <= max_bucket_width)
        .select("band", "band_key")
    )
    # equi-join on the bucket key: co-partitions with the pair join that
    # follows, so the cap rides the shuffle the join needs anyway
    return [f.join(keep, ["band", "band_key"]) for f in frames]


def minhash_lsh_pairs_from_sigs(
    sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    min_matching: int = 8,
    max_bucket_width: int | None = 10_000,
) -> DataFrame:
    """LSH candidate pairs over an existing ``(doc, minhash_sig)`` table.

    ``max_bucket_width`` (default on) skips degenerate buckets — see
    ``_cap_banded``. Run ``exact_dedup`` first on corpora with massive
    verbatim duplication; the cap assumes exact copies were already folded.
    """
    banded = _banded(sigs, bands, num_hashes // bands)
    (banded,) = _cap_banded([banded], max_bucket_width)
    left = banded.select(
        F.col("doc").alias("id_a"), F.col("minhash_sig").alias("sig_a"), "band", "band_key"
    )
    right = banded.select(
        F.col("doc").alias("id_b"), F.col("minhash_sig").alias("sig_b"), "band", "band_key"
    )
    scored = (
        left.join(right, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _matching_minhashes().alias("matching_minhashes"))
    )
    return _dedupe_scored_pairs(scored, min_matching)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_matching: int = 8,
    shingle_len: int = 3,
    max_bucket_width: int | None = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Two docs land in the same bucket when one band (num_hashes/bands
    consecutive signature slots) agrees exactly; pairs are then scored by
    full-signature agreement and filtered to ``min_matching``/num_hashes.
    Buckets wider than ``max_bucket_width`` docs are skipped (see
    ``_cap_banded``). Returns (id_a, id_b, matching_minhashes), id_a < id_b.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_len)
    # Signatures feed BOTH sides of the bucket self-join; without a persist
    # the shingle+md5+fold pipeline (the dominant cost) runs twice. At real
    # scale this step is a materialized signature table — persist() is the
    # in-session equivalent (MEMORY_AND_DISK, LRU-evicted).
    sigs = sigs.persist()
    return minhash_lsh_pairs_from_sigs(
        sigs, num_hashes, bands, min_matching, max_bucket_width
    )


def minhash_lsh_pairs_incremental(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    min_matching: int = 8,
    max_bucket_width: int | None = 10_000,
    persist: bool = True,
) -> DataFrame:
    """Incremental dedup: candidate pairs INVOLVING a new batch, against a
    persisted corpus signature table — without recomputing or re-joining
    the corpus against itself.

    Pairs within the corpus are already known from previous batches, so the
    bucket join is new x (corpus + new) instead of the full self-join: the
    corpus side contributes only bucket probes (its signatures were
    computed once, at its own ingest). Union the result with the
    previously-known pairs to maintain the full pair set batch over batch
    — at 100 TB this is the only affordable dedup cadence: per-batch cost
    scales with the batch, not the corpus.

    ``max_bucket_width`` counts bucket width over corpus + new combined
    (matching what the full self-join would cap), so full and incremental
    runs over the same snapshot drop the same degenerate buckets.

    ``persist=True`` caches the banded new-batch frame (it feeds three
    join sides); the cache lives until the session evicts it — a driver
    looping over many batches should pass ``persist=False`` or call
    ``spark.catalog.clearCache()`` between batches.

    Returns (id_a, id_b, matching_minhashes), id_a < id_b, covering
    new-vs-corpus and new-vs-new pairs.
    """
    rpb = num_hashes // bands
    nb = _banded(new_sigs, bands, rpb)
    if persist:
        nb = nb.persist()
    cb = _banded(corpus_sigs, bands, rpb)
    if max_bucket_width is not None:
        # Cap on combined (corpus + new) width like the full self-join
        # would — but count ONLY buckets the new batch touches: buckets
        # without a new-side row produce no pairs here, so capping them is
        # a no-op, and restricting first keeps the width shuffle
        # batch-proportional (a full-corpus groupBy per batch would defeat
        # the whole incremental design). The corpus side pays one extra
        # key-projection scan, never an extra corpus-wide shuffle.
        nb_keys = nb.select("band", "band_key").distinct()
        touched = cb.select("band", "band_key").join(nb_keys, ["band", "band_key"])
        keep = (
            nb.select("band", "band_key")
            .unionByName(touched)
            .groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("__bucket_width"))
            .filter(F.col("__bucket_width") <= max_bucket_width)
            .select("band", "band_key")
        )
        nb = nb.join(keep, ["band", "band_key"])
        cb = cb.join(keep, ["band", "band_key"])
    cross = (
        nb.select(F.col("doc").alias("id_n"), F.col("minhash_sig").alias("sig_n"), "band", "band_key")
        .join(
            cb.select(
                F.col("doc").alias("id_c"), F.col("minhash_sig").alias("sig_c"), "band", "band_key"
            ),
            on=["band", "band_key"],
        )
        .filter(F.col("id_n") != F.col("id_c"))
        .select(
            F.least("id_n", "id_c").alias("id_a"),
            F.greatest("id_n", "id_c").alias("id_b"),
            F.zip_with(F.col("sig_n"), F.col("sig_c"), lambda x, y: x == y).alias("__m"),
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.filter(F.col("__m"), lambda m: m)).cast("long").alias("matching_minhashes"),
        )
    )
    within_new = (
        nb.select(F.col("doc").alias("id_a"), F.col("minhash_sig").alias("sig_a"), "band", "band_key")
        .join(
            nb.select(
                F.col("doc").alias("id_b"), F.col("minhash_sig").alias("sig_b"), "band", "band_key"
            ),
            on=["band", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _matching_minhashes().alias("matching_minhashes"))
    )
    return _dedupe_scored_pairs(cross.unionByName(within_new), min_matching)


def frequent_line_removal(
    df: DataFrame,
    id_col: str,
    lines_col: str,
    max_doc_freq: int = 10,
) -> DataFrame:
    """Corpus-level boilerplate line removal (the RefinedWeb/Dolma line-dedup
    pass): a line whose normalized form (lower + trim) appears in more than
    ``max_doc_freq`` DISTINCT documents is dropped from every document; the
    surviving lines reassemble in original order.

    Scale posture: the line-frequency aggregate is the only corpus-wide
    shuffle keyed by line (md5 of the normalized line — the shuffle carries a
    32-char key, never the line text). The *drop set* (lines OVER the cap) is
    small in kind even when massive in volume — boilerplate is by definition
    few distinct strings — so it broadcasts into a map-side anti-join; the
    reassembly then shuffles each document's kept lines once, keyed by
    document. The exploded frame feeds both the frequency pass and the
    anti-join, so it persists for the job (MEMORY_AND_DISK, LRU-evicted).

    Returns ``(id, n_lines, n_kept, n_dropped, kept_text)`` — one row per
    input document, including documents whose every line was dropped. A
    NULL lines array reads as zero lines; NULL line elements normalize to
    the empty string (so they count, drop, and reassemble like any other
    line instead of vanishing from ``array_join`` while still being
    counted).
    """
    base = df.select(
        F.col(id_col).alias("__doc"),
        F.coalesce(F.col(lines_col), F.array()).alias("__lines"),
    )
    exploded = (
        base.select("__doc", F.posexplode("__lines").alias("pos", "__raw"))
        .withColumn("line", F.coalesce(F.col("__raw"), F.lit("")))
        .drop("__raw")
        .withColumn("lkey", F.md5(F.lower(F.trim(F.col("line")))))
        .persist()
    )
    drop_keys = (
        exploded.groupBy("lkey")
        .agg(F.count_distinct("__doc").alias("line_df"))
        .filter(F.col("line_df") > max_doc_freq)
        .select("lkey")
    )
    kept = exploded.join(F.broadcast(drop_keys), "lkey", "left_anti")
    agg = kept.groupBy("__doc").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__kept_text"),
    )
    sizes = base.select("__doc", F.size("__lines").cast("long").alias("n_lines"))
    return sizes.join(agg, "__doc", "left").select(
        F.col("__doc").alias(id_col),
        "n_lines",
        F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_lines") - F.coalesce("__n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("__kept_text", F.lit("")).alias("kept_text"),
    )


def adaptive_prefix_bits(n: int) -> int:
    """Corpus-scaled SimHash bucket width: smallest ``b`` with
    ``256 * 2**b >= n``, clamped to [8, 24] — the adaptive_num_planes
    formula with a 256-bucket floor, in exact integer arithmetic so the
    DuckDB twin's threshold-CASE agrees at every n. Expected bucket
    width lands in (128, 256] above the clamp floor; a FIXED prefix
    keeps bucket count constant while width grows ∝ n, turning the
    within-bucket pair join quadratic (measured: the fixed-8-bit probe
    cost 7.18x for 3.33x data at the sf3->sf10 step, BENCH_SF3.json)."""
    import math

    p = max(0, (max(1, math.ceil(n / 256)) - 1).bit_length())
    return min(24, max(8, p))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    prefix_bits: int | str = "adaptive",
) -> DataFrame:
    """SimHash near-dup pairs bucketed by the signature's top bits.

    Candidates share the ``prefix_bits`` high bits (an LSH on hamming
    locality: near-identical docs rarely differ in the high bits); exact
    hamming distance (bit_count of xor) filters within the bucket. The
    default ``"adaptive"`` derives the prefix width from the corpus
    count (:func:`adaptive_prefix_bits`, one count job) so bucket width
    stays ~256 at any scale; pass an int to pin it, or ``0`` for the
    exhaustive variant. The count runs over the PERSISTED signature
    projection (not the raw input lineage), so an expensive upstream
    plan — a generated or unioned corpus — executes once: the count
    materializes the cache the self-join then reuses.
    """
    sigs = df.select(
        F.col(id_col).alias("doc"), text.simhash32(F.col(text_col)).alias("simhash")
    ).persist()  # both sides of the bucket self-join — see minhash_lsh_pairs
    if prefix_bits == "adaptive":
        prefix_bits = adaptive_prefix_bits(sigs.count())
    bucket = F.shiftright(F.col("simhash"), 32 - prefix_bits) if prefix_bits else F.lit(0)
    sigs = sigs.withColumn("bucket", bucket)
    a = sigs.select(
        F.col("doc").alias("id_a"), F.col("simhash").alias("sim_a"), "bucket"
    )
    b = sigs.select(
        F.col("doc").alias("id_b"), F.col("simhash").alias("sim_b"), "bucket"
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def adaptive_max_shingle_freq(n: int) -> int:
    """Corpus-scaled stop-shingle cap: ``max(8, ceil(n / 1000))`` — a
    shingle shared by more than ~0.1% of the corpus is boilerplate, not
    near-dup signal, and its posting list is what turns the shingle
    self-join quadratic. Exact integer arithmetic so the DuckDB oracle
    mirrors it as ``GREATEST(8, (COUNT(*) + 999) // 1000)`` at every n,
    boundaries included (the adaptive_num_planes discipline). Unlike a
    FIXED cap, the fraction keeps the capped universe meaningful at any
    scale: cap 5 on a 50k-doc corpus deletes nearly every shingle, while
    0.1% keeps exactly the heavy tail out of the join."""
    return max(8, (n + 999) // 1000)


def _capped_postings(
    postings: DataFrame, key: str, cap: int, hot_key_guard: bool | None
) -> DataFrame:
    """Apply a frequency cap (drop keys with > ``cap`` postings) in one of
    two physically different but result-identical shapes — shared by the
    n-gram Jaccard and winnowing pair generators; the policy that picks a
    shape is documented on ``ngram_jaccard_pairs`` (``hot_key_guard``).

    NULL keys: both shapes KEEP a NULL posting key (a window partition is
    a valid NULL group; an anti-join never matches NULL against the hot
    set) where the pre-r15 aggregate+join shape dropped it — callers'
    keys are non-null by construction (token concatenations / hashes),
    pinned here so a future extractor change can't silently alter
    jaccard denominators (ADVICE r15).
    """
    if hot_key_guard:
        # Skew-proof pre-drop: exact counts via hash aggregate (map-side
        # partial aggregation reduces even the hottest key to one row per
        # input partition before the count's exchange, which then carries
        # only (distinct key, count) rows); the over-cap set — tiny by
        # definition, the cap admits ~0.1% of the corpus in adaptive mode
        # — broadcasts into a map-side ANTI join that removes hot
        # postings BEFORE any data shuffle, so no task ever materializes
        # a super-hot posting list; the repartition hash-distributes the
        # survivors on the pair join's own key (what the window shape's
        # exchange provides) and residual width is bounded by the cap.
        # The raw posting frame persists first so the pre-count and the
        # capped flow share ONE extraction (the r15 lesson: double
        # extraction measured +25% at sf0.1).
        postings = postings.persist()
        hot = (
            postings.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > cap)
            .select(key)
        )
        return postings.join(F.broadcast(hot), key, "left_anti").repartition(
            key
        )
    # window count (r15): ONE shuffle on exactly the key the pair
    # self-join needs next — extraction evaluates once with no extra
    # cache, at the cost of routing each key's full posting list through
    # one task before the cap applies
    from pyspark.sql.window import Window

    w = Window.partitionBy(key)
    return (
        postings.withColumn("__w", F.count(F.lit(1)).over(w))
        .filter(F.col("__w") <= cap)
        .drop("__w")
    )


#: corpus size (docs) at which the cap's hot-key pre-drop engages by
#: default (adaptive mode, where the count is already known). Below it, a
#: hot posting list tops out at corpus size — a bounded straggler the
#: window-count shape absorbs — and the guard's extra pass over the
#: postings (one cached-read aggregate + cache materialization, measured
#: +12-15% per query at sf0.1) buys nothing. Above it, a boilerplate
#: shingle's posting list (the adaptive cap admits 0.1% of docs, so a HOT
#: key is strictly bigger — millions of rows at 2M+ docs) would buffer on
#: ONE window task before being dropped; the pre-drop removes it before
#: any data shuffle for a cost that amortizes to noise at that scale.
HOT_KEY_GUARD_MIN_DOCS = 2_000_000


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    min_jaccard: float = 0.6,
    max_shingle_freq: int | str | None = "adaptive",
    hot_key_guard: bool | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shared-shingle equi-join.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over DISTINCT shingles.
    Only pairs sharing >= 1 shingle are ever materialized.

    ``max_shingle_freq`` drops degenerate stop-shingles ("the quick brown")
    whose posting lists are quadratic in the self-join — at 100 TB a single
    million-doc shingle would dominate the whole job. The default
    ``"adaptive"`` derives the cap from the corpus count
    (:func:`adaptive_max_shingle_freq`, ~0.1% of docs, floor 8 — one
    count job); a shingle shared that widely carries no near-dup signal:
    any pair above ``min_jaccard`` shares many rarer shingles too, so the
    pair survives through those. Pass an int to pin the cap, or ``None``
    to opt into the exact uncapped join on bounded corpora. In adaptive
    mode the count runs over a PERSISTED token projection (not the raw
    input lineage), so an expensive upstream plan executes once — the
    count materializes the cache the shingle explode then reads.

    ``hot_key_guard`` (r16, VERDICT r15 #2): how the cap is physically
    applied. ``False`` — a window count on the posting key (one shuffle,
    reused by the pair self-join), which routes every key's FULL posting
    list — a pathologically hot boilerplate shingle included — through
    one task before dropping it; fine while posting lists are bounded.
    ``True`` — a skew-proof pre-drop: exact counts via a hash aggregate
    (map-side partial aggregation reduces even the hottest key to one
    row per input partition before its exchange), the tiny over-cap set
    broadcast into a map-side anti-join that removes hot postings BEFORE
    any data shuffle; costs one extra cached pass over the postings.
    ``None`` (default) auto-selects: guard on once an adaptive-mode
    corpus reaches ``HOT_KEY_GUARD_MIN_DOCS`` (where a hot posting list
    is big enough to straggle a task and the extra pass is noise),
    window below it and for pinned caps (no count available — pass
    ``True`` explicitly when a pinned-cap corpus is hot-key-prone).
    Identical results either way (exact counts, same ``> cap`` drop
    set; pinned in tests/test_curation.py).
    """
    base = df.select(
        F.col(id_col).alias("doc"), text.tokens(F.col(text_col)).alias("__toks")
    )
    if max_shingle_freq == "adaptive":
        # persisted only on this path — with a pinned cap there is no
        # second pass to share, and caching token arrays isn't free. The
        # cache outlives the call (the returned frame reads it lazily);
        # the session owner drops it between families (bench.py / the
        # driver clearCache per query).
        base = base.persist()
        n_docs = base.count()
        max_shingle_freq = adaptive_max_shingle_freq(n_docs)
        if hot_key_guard is None:
            hot_key_guard = n_docs >= HOT_KEY_GUARD_MIN_DOCS
    sh = (
        base
        .select(
            "doc",
            F.explode(
                F.array_distinct(
                    text.shingles_from_tokens(F.col("__toks"), shingle_len)
                )
            ).alias("shingle"),
        )
    )
    if max_shingle_freq is not None:
        sh = _capped_postings(sh, "shingle", max_shingle_freq, hot_key_guard)
    # consumed 3x (sizes + both join sides) — persist like the LSH signatures
    sh = sh.persist()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    common = (
        sh.select(F.col("doc").alias("id_a"), "shingle")
        .join(sh.select(F.col("doc").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"doc": "id_a", "n_shingles": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "n_shingles": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select(
        "id_a", "id_b", "n_common", "jaccard"
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """``(doc, fingerprint)`` — the winnowed k-gram hash set per document
    (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003).

    Each position's word-``k``-gram hashes; every ``window`` consecutive
    hashes contribute their MINIMUM to the fingerprint set. The winnowing
    guarantee: two documents sharing any token run of length
    ``window + k - 1`` share at least one fingerprint — SUBSTRING-level
    duplicate sensitivity (quoted paragraphs, boilerplate spans) that
    whole-document MinHash dilutes away, at ~1/window the fingerprint
    density of the full shingle set.

    Purely map-side: one token projection, one hash pass, one O(n*window)
    sliding-min HOF, one distinct-explode. The hash array is PROJECTED
    before the sliding-min lambda (Catalyst re-evaluates captured outer
    expressions inside HOF lambdas — the O(n^2) trap functions/text.py
    documents). Docs shorter than ``k`` tokens emit nothing; docs with
    fewer than ``window`` grams emit their single overall minimum.
    """
    hs = (
        df.select(
            F.col(id_col).alias("doc"),
            text.tokens(F.col(text_col)).alias("__toks"),
        )
        .select(
            "doc",
            F.transform(
                text.shingles_from_tokens(F.col("__toks"), k),
                lambda s: scalars.md5_long(s, modulus=text.MERSENNE31),
            ).alias("hs"),
        )
    )
    n = F.size(F.col("hs"))
    mins = (
        F.when(
            n >= window,
            F.transform(
                F.sequence(F.lit(1), n - (window - 1)),
                lambda i: F.array_min(F.slice(F.col("hs"), i, window)),
            ),
        )
        .when(n > 0, F.array(F.array_min(F.col("hs"))))
        .otherwise(F.array().cast("array<long>"))
    )
    return hs.select(
        "doc", F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = 10_000,
    hot_key_guard: bool | None = None,
) -> DataFrame:
    """Substring-overlap candidate pairs from shared winnowing fingerprints:
    ``(id_a, id_b, n_shared, n_fp_a, n_fp_b, containment)`` where
    ``containment = n_shared / min(|A|, |B|)`` — the partial-overlap score
    (a short doc quoted whole inside a long one scores ~1.0, where Jaccard
    would score near 0).

    Same scale shape as :func:`ngram_jaccard_pairs`: a posting-list
    equi-join on the fingerprint, with ``max_fp_freq`` dropping degenerate
    boilerplate fingerprints whose posting lists go quadratic (cap ON by
    default; sizes count the CAPPED sets on both engines).
    ``hot_key_guard`` selects the skew-proof cap shape exactly as on
    ``ngram_jaccard_pairs``; the cap here is pinned (no corpus count is
    taken), so the default ``None`` stays on the window shape — pass
    ``True`` on a corpus whose boilerplate fingerprints go hot.
    """
    fp = winnowing_fingerprints(df, id_col, text_col, k=k, window=window)
    if max_fp_freq is not None:
        fp = _capped_postings(fp, "fingerprint", max_fp_freq, hot_key_guard)
    fp = fp.persist()  # consumed 3x: sizes + both join sides
    sizes = fp.groupBy("doc").agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    pairs = (
        fp.select(F.col("doc").alias("id_a"), "fingerprint")
        .join(fp.select(F.col("doc").alias("id_b"), "fingerprint"), "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.withColumnsRenamed({"doc": "id_a", "n_fp": "n_fp_a"}), "id_a"
        )
        .join(
            sizes.withColumnsRenamed({"doc": "id_b", "n_fp": "n_fp_b"}), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("n_shared").cast("double")
                / F.least("n_fp_a", "n_fp_b").cast("double")
            ).alias("containment"),
        )
    )


def remove_shared_spans(
    df: DataFrame | None,
    id_col: str,
    text_col: str,
    divisor: int = 8,
    max_doc_freq: int = 1,
    chunks: DataFrame | None = None,
    freq: DataFrame | None = None,
) -> DataFrame:
    """Substring-dedup REMEDIATION (the RefinedWeb / Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" removal
    step, at CDC-chunk granularity): drop every content-defined chunk
    whose content occurs in more than ``max_doc_freq`` distinct documents,
    and reassemble each document from its surviving chunks in order —
    shared boilerplate SPANS disappear from every document that carries
    them while the unique prose around them survives.

    CDC chunking (functions/text.py:cdc_chunk_documents) is what makes
    chunk-content frequency a faithful span detector: boundaries are a
    function of content, so the same boilerplate paragraph yields the
    same chunk hashes in every document regardless of position — the
    insertion-robustness that fixed windows lack. Compare
    ``frequent_line_removal`` (same policy at LINE granularity — only
    catches boilerplate that is line-aligned).

    Returns one row per input document:
    ``(id_col, cleaned_text, n_chunks, n_kept_chunks, n_tokens_removed)``
    with ``cleaned_text = ''`` for documents made entirely of shared
    spans.

    Case fidelity: ``cleaned_text`` preserves the SOURCE case of every
    kept span (chunking tokenizes without case-folding; only the
    frequency hash lowercases), but it IS a whitespace-NORMALIZED
    reconstruction — runs of whitespace/newlines inside and between kept
    chunks collapse to single spaces. Span detection itself is
    case-insensitive: two documents sharing a boilerplate paragraph that
    differs only in casing still both lose it.

    Scale shape: chunking is map-side HOFs (zero shuffle); then three
    keyed shuffles — the chunk-hash frequency groupBy (map-side partial
    agg collapses each partition to its distinct hashes), the
    chunks-to-frequency equi-join on the hash (hot boilerplate hashes are
    exactly the skewed keys AQE skew-join splits), and the per-document
    reassembly groupBy. Nothing reaches the driver.

    The chunk frame feeds BOTH the frequency side and the scored side, so
    when derived inline its lineage (text scan + per-token-md5 chunking)
    executes twice — free CPU-parallel map work, but two passes over the
    corpus. At scale, chunk once with ``cdc_chunk_documents`` (same
    ``divisor``!), persist/checkpoint it, reuse it for chunk-level dedup
    AND pass it here as ``chunks`` to make this operator single-pass.

    An incrementally-ingested corpus passes BOTH ``chunks`` and ``freq``
    from the stream-maintained state tables
    (streaming/chunk_freq_stream.py::CdcChunkSink): ``chunks`` is the
    running chunk table, ``freq`` a ``(chunk_hash, doc_freq)`` frame
    (chunk_hash = md5_long of the LOWERCASED chunk text — the sink's
    convention). With ``freq`` supplied the corpus-wide frequency
    groupBy is skipped entirely, so span removal over a maintained
    corpus costs one join + one reassembly — no full rechunk, no full
    recount. A chunk absent from ``freq`` is treated as unseen
    (doc_freq 0 → kept).
    """
    from ..functions.scalars import md5_long
    from ..functions.text import cdc_chunk_documents

    if chunks is None:
        if df is None:
            raise ValueError("remove_shared_spans: pass df or chunks")
        chunks = cdc_chunk_documents(df, id_col, text_col, divisor=divisor)
    chunks = chunks.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        "n_tokens",
        # case-insensitive span identity; chunk_text itself keeps source case
        md5_long(F.lower(F.col("chunk_text"))).alias("__h"),
    )
    if freq is None:
        # two consumers of the chunk frame (frequency side + scored side):
        # persist so the text-scan + per-token-md5 chunking pipeline runs
        # once, not twice (r15 — the docstring's "two passes over the
        # corpus" note is now only true for callers that bypass this by
        # passing their own un-persisted chunk frame WITH a freq table)
        chunks = chunks.persist()
        freq = (
            chunks.select("__h", id_col)
            .distinct()
            .groupBy("__h")
            .agg(F.count(F.lit(1)).cast("long").alias("__doc_freq"))
        )
        freq_join = "inner"  # internally derived: every hash present
    else:
        freq = freq.select(
            F.col("chunk_hash").alias("__h"),
            F.col("doc_freq").cast("long").alias("__doc_freq"),
        )
        freq_join = "left"  # external table may lag the chunk frame
    kept = F.coalesce(F.col("__doc_freq"), F.lit(0)) <= max_doc_freq
    scored = chunks.join(freq, "__h", freq_join).select(
        id_col,
        "chunk_idx",
        F.when(kept, F.col("chunk_text")).alias("__kept_text"),
        kept.alias("__kept"),
        "n_tokens",
    )
    pieces = F.array_sort(
        F.collect_list(F.struct(F.col("chunk_idx"), F.col("__kept_text")))
    )
    return scored.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(pieces, lambda s: s["__kept_text"].isNotNull()),
                lambda s: s["__kept_text"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("__kept").cast("long")).cast("long").alias("n_kept_chunks"),
        F.coalesce(
            F.sum(F.when(~F.col("__kept"), F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("n_tokens_removed"),
    )
