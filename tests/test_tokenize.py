"""BPE tokenizer training (operators/tokenize.py) against a direct
Python reference implementation of Sennrich et al.'s algorithm."""

import pytest
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.tokenize import (
    END_OF_WORD,
    bpe_token_counts,
    bpe_train,
)


def _ref_bpe(corpus_words, num_merges):
    """Reference BPE: word-freq table, arg-max adjacent pair with
    (freq desc, left, right) tie-break, greedy left-to-right merge."""
    from collections import Counter

    freq = Counter(corpus_words)
    vocab = {w: list(w) + [END_OF_WORD] for w in freq}
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        if not pairs:
            break
        (l, r), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = l + r
        merges.append((step, l, r, merged, f))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


WORDS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    + ["new"] * 2
)


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(WORDS[:9])), (1, " ".join(WORDS[9:]))],
        "doc_id long, text string",
    )
    model = bpe_train(docs, "text", num_merges=8)
    got = [
        (r.step, r.merge_left, r.merge_right, r.merged, r.freq)
        for r in model.merges.orderBy("step").collect()
    ]
    want, ref_vocab = _ref_bpe(WORDS, 8)
    assert got == want
    got_vocab = {
        r["w"]: r["syms"] for r in model.vocab.collect()
    }
    assert got_vocab == ref_vocab


def test_bpe_greedy_merge_is_left_to_right(spark):
    """'aaaa' under merge (a,a): greedy non-overlapping scan yields
    [aa, aa, </w>], and 'aaa' yields [aa, a, </w>]."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    model = bpe_train(docs, "text", num_merges=1)
    rule = model.merges.collect()[0]
    assert (rule.merge_left, rule.merge_right) == ("a", "a")
    vocab = {r["w"]: r["syms"] for r in model.vocab.collect()}
    assert vocab["aaaa"] == ["aa", "aa", END_OF_WORD]
    assert vocab["aaa"] == ["aa", "a", END_OF_WORD]


def test_bpe_empty_and_exhausted_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    model = bpe_train(empty, "text", num_merges=4)
    assert model.merges.count() == 0
    assert model.vocab.count() == 0
    assert bpe_token_counts(empty, model.vocab).count() == 0

    # single 1-char word: pairs exhaust after merging with </w>
    one = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    m = bpe_train(one, "text", num_merges=5).merges.collect()
    assert len(m) == 1  # (x, </w>) then nothing left to merge
    assert (m[0].merge_left, m[0].merge_right) == ("x", END_OF_WORD)


def test_bpe_token_counts_shrink_with_merges(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(WORDS)) for i in range(4)],
        "doc_id long, text string",
    )
    m0 = bpe_train(docs, "text", num_merges=0)
    m8 = bpe_train(docs, "text", num_merges=8)
    c0 = {
        r.doc_id: r.n_tokens
        for r in bpe_token_counts(docs, m0.vocab).collect()
    }
    c8 = {
        r.doc_id: r.n_tokens
        for r in bpe_token_counts(docs, m8.vocab).collect()
    }
    n_words = len(WORDS)
    n_chars = sum(len(w) for w in WORDS)
    for d in range(4):
        # zero merges: chars + one end-of-word marker per word
        assert c0[d] == n_chars + n_words
        # merges only ever shrink counts, never below one per word
        assert n_words <= c8[d] < c0[d]
    # repartitioned input trains the identical table (determinism)
    m8b = bpe_train(docs.repartition(7), "text", num_merges=8)
    assert sorted(map(tuple, m8b.merges.collect())) == sorted(
        map(tuple, m8.merges.collect())
    )
