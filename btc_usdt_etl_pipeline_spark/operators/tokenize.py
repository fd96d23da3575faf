"""Subword tokenizer training (north star §2B — LLM-data text ops).

Byte-pair-encoding vocabulary training (Sennrich, Haddow & Birch,
ACL 2016 — the GPT-2/Llama tokenizer family's training rule) over a
document corpus, plus corpus token-counting with the trained vocabulary.
The reference pipeline counts tokens with a whitespace/regex heuristic;
this module trains a REAL merge table so token budgets reflect the
tokenizer the downstream model will actually use.

Algorithm (classic BPE):

1. word-frequency table: lowercase, split on ``[^a-z0-9]+``, count —
   the corpus collapses to a VOCABULARY-sized table (at 100 TB the word
   histogram fits in single-digit GB: natural-language vocabularies
   grow ~ Heaps' law, sublinearly in corpus size).
2. each word becomes its character sequence plus an ``</w>``
   end-of-word marker.
3. ``num_merges`` rounds: count adjacent symbol pairs weighted by word
   frequency, pick the most frequent pair (ties broken lexicographically
   so the result is a pure function of the corpus), replace it greedily
   left-to-right in every word.

Scale shape: after step 1 EVERYTHING is vocabulary-sized.  Each round
is one map-side-combined aggregation over the checkpointed symbol
table, one ``TakeOrderedAndProject`` for the arg-max pair, and one
narrow projection applying the merge via the ``aggregate`` HOF (JVM
codegen, no Python).  The only driver traffic is the k winning rules —
one row per merge round (metadata-scale, like the k-means centroids:
the sequential arg-max decision IS the algorithm; even multi-machine
BPE trainers synchronize on it).  The corpus itself is touched exactly
once, by the word count.

Determinism/oracle story: pair counts are integer sums; the arg-max
tie-break is total (freq desc, left, right); the greedy merge is
defined left-to-right, so ``aaa`` under merge ``(a,a)`` becomes
``[aa, a]``.  A SQL oracle replays training exactly by unrolling the
fixed ``num_merges`` rounds as chained CTEs (same construction as the
PageRank oracle, ``__spark_entry__._pagerank_oracle_sql``).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


class BpeModel(NamedTuple):
    """Result of :func:`bpe_train`.

    ``merges``: one row per learned rule —
    ``(step, merge_left, merge_right, merged, freq)``; ``step`` is the
    1-based training order (= merge priority at encode time).
    ``vocab``: the final segmentation of every corpus word —
    ``(w, cnt, syms)`` with ``syms`` the word's symbol sequence after
    all merges; ``size(syms)`` is the word's token count.
    """

    merges: DataFrame
    vocab: DataFrame


def _word_counts(
    docs: DataFrame, text_col: str, max_word_len: int
) -> DataFrame:
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("w")
        )
        .filter(
            (F.length("w") >= 1) & (F.length("w") <= max_word_len)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_step(left: str, right: str, merged: str):
    """Greedy left-to-right single-rule application as an ``aggregate``
    HOF step: if the accumulator's last symbol is ``left`` and the
    incoming symbol is ``right``, fuse them — the fused symbol can then
    seed a FURTHER fuse only if it equals ``left`` again, which is
    exactly the textbook non-overlapping scan."""

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return step


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 12,
    max_word_len: int = 30,
) -> BpeModel:
    """Train a BPE merge table on ``docs[text_col]``.

    Stops early (deterministically) if the corpus runs out of adjacent
    pairs before ``num_merges`` rounds.  ``max_word_len`` bounds the
    per-word symbol array (and drops pathological unbroken blobs — the
    same guard every production tokenizer trainer applies); the oracle
    must filter identically.
    """
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    spark = docs.sparkSession
    words = _word_counts(docs, text_col, max_word_len)
    # char split: Spark's split-by-empty-pattern yields the codepoint
    # array with no trailing empty element (tested); append the
    # end-of-word marker so suffix merges ("er</w>") can form
    syms = words.select(
        "w",
        "cnt",
        F.concat(
            F.split("w", ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    ).localCheckpoint()

    merge_rows: list[tuple[int, str, str, str, int]] = []
    for step_no in range(1, num_merges + 1):
        pairs = (
            syms.select(
                "cnt",
                # adjacent pairs via zip of the two off-by-one slices —
                # NOT sequence(1, size-1): Spark's sequence(1, 0) is
                # the DESCENDING [1, 0] (step auto-negates), which
                # indexes out of bounds once a word collapses to a
                # single symbol; zero-length slices zip to [] instead
                F.explode(
                    F.expr(
                        "zip_with(slice(syms, 1, size(syms) - 1),"
                        " slice(syms, 2, size(syms) - 1),"
                        " (l, r) -> struct(l, r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("freq"))
        )
        # arg-max pair: TakeOrderedAndProject over the vocabulary-sized
        # pair table; ONE row to the driver per round (the next round's
        # merge literals), never data-scale
        best = pairs.orderBy(F.desc("freq"), "l", "r").limit(1).collect()
        if not best:
            break
        left, right, freq = best[0]["l"], best[0]["r"], best[0]["freq"]
        merged = left + right
        merge_rows.append((step_no, left, right, merged, int(freq)))
        syms = syms.select(
            "w",
            "cnt",
            F.aggregate(
                F.expr("slice(syms, 2, size(syms) - 1)"),
                F.array(F.element_at(F.col("syms"), 1)),
                _merge_step(left, right, merged),
            ).alias("syms"),
        ).localCheckpoint()

    merges = spark.createDataFrame(
        merge_rows,
        "step int, merge_left string, merge_right string,"
        " merged string, freq bigint",
    )
    return BpeModel(merges=merges, vocab=syms)


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 30,
) -> DataFrame:
    """Per-document token counts under a trained BPE vocabulary —
    ``(doc_id, n_words, n_tokens)``.

    The corpus is scanned once; the trained ``vocab`` (word → final
    symbol count) is BROADCAST into the per-occurrence join, so the
    only shuffle is the final doc-keyed aggregation.  Applying the
    merge table to a word the trainer has already segmented would
    recompute what ``vocab`` stores — the join IS the encode step for
    in-corpus text.  Documents with no in-vocabulary words drop out
    (no words ⇒ no token count), matching the oracle's inner join.
    """
    occurrences = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("w"),
    ).filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
    per_word = F.broadcast(
        vocab.select("w", F.size("syms").alias("_n_toks"))
    )
    return (
        occurrences.join(per_word, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_n_toks").cast("long").alias("n_tokens"),
        )
    )
