"""BPE merge-rule induction (operators/bpe.py) vs a pure-Python reference
implementation of the classic algorithm."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_data_ingestion_canonical_snowflake_spark.operators.bpe import (
    END_OF_WORD,
    bpe_learn,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _python_bpe(texts, n_merges, min_freq):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                vocab[w] += 1
    segs = {w: [*w, END_OF_WORD] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # count desc, then (a, b) lexicographic — the operator's tie-break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b, a + b, cnt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs, vocab


def test_bpe_known_corpus(spark):
    # "low" x5, "lower" x2: classic worked example — 'l o' then 'lo w'
    texts = ["low low low", "low low lower", "lower"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, segs = bpe_learn(df, "text", n_merges=3, min_freq=2)
    got = [(m["a"], m["b"], m["cnt"]) for m in merges]
    assert got[0] == ("l", "o", 7)
    assert got[1] == ("lo", "w", 7)
    assert got[2] == ("low", END_OF_WORD, 5)
    final = {r["word"]: list(r["symbols"]) for r in segs.collect()}
    assert final["low"] == ["low" + END_OF_WORD]
    assert final["lower"] == ["low", "e", "r", END_OF_WORD]


@SETTINGS
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ab", "aba", "bb", "abab", "ba", "a"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_bpe_matches_python_reference(spark, texts, n):
    """Merge sequence AND final segmentation equal the classic algorithm,
    including overlapping-run greediness ('a a a' cases) and tie-breaks."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, segs = bpe_learn(df, "text", n_merges=n, min_freq=2)
    ref_merges, ref_segs, ref_vocab = _python_bpe(texts, n, min_freq=2)
    assert [(m["a"], m["b"], m["merged"], m["cnt"]) for m in merges] == ref_merges
    got = {r["word"]: (r["freq"], list(r["symbols"])) for r in segs.collect()}
    assert got == {w: (ref_vocab[w], ref_segs[w]) for w in ref_vocab}


def test_bpe_encode_known_and_oov(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.bpe import (
        bpe_encode,
    )

    train = spark.createDataFrame(
        [("low low low", ), ("low low lower", ), ("lower", )], "text string"
    )
    _merges, segs = bpe_learn(train, "text", n_merges=3, min_freq=2)
    corpus = spark.createDataFrame(
        [(1, "low lower"), (2, "Low UNSEEN")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bpe_encode(corpus, "doc_id", "text", segs).collect()}
    assert list(got[1]["bpe_tokens"]) == [
        "low" + END_OF_WORD, "low", "e", "r", END_OF_WORD
    ]
    # case-folded "low" hits the vocab; OOV falls back to chars + marker
    assert list(got[2]["bpe_tokens"]) == [
        "low" + END_OF_WORD, "u", "n", "s", "e", "e", "n", END_OF_WORD
    ]
    assert got[2]["n_bpe_tokens"] == 8

    # the dictionary side must BROADCAST (vocabulary-sized at any corpus scale)
    plan = (
        bpe_encode(corpus, "doc_id", "text", segs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bpe_encode_keeps_tokenless_docs(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.bpe import (
        bpe_encode,
    )

    train = spark.createDataFrame([("low",)], "text string")
    _m, segs = bpe_learn(train, "text", n_merges=1, min_freq=1)
    corpus = spark.createDataFrame(
        [(1, "low"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(corpus, "doc_id", "text", segs).collect()}
    assert set(got) == {1, 2, 3, 4}  # one row per input doc, always
    for d in (2, 3, 4):
        assert got[d]["n_bpe_tokens"] == 0 and list(got[d]["bpe_tokens"]) == []
