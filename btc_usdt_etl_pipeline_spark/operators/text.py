"""Text analysis operators for training-data pipelines (north star §2B).

All pure column expressions (JVM-side, codegen-friendly): language ID by
stopword-hit ratio, quality scoring, token counting (whitespace + a
BPE-ish regex), and rolling-hash document fingerprinting.  Designed to run
as a single projection pass over a 100 TB ``documents`` table — no
shuffles, no UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from btc_usdt_etl_pipeline_spark.operators.dedup import tokens

#: Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
#: (Real deployments swap in a fastText-style model — not in this container.)
STOPWORDS: Mapping[str, Sequence[str]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"),
    "fr": ("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "un", "una", "para", "en"),
}

#: BPE-ish token regex: word pieces, numbers, or single non-space symbols —
#: a public approximation of GPT-2-style pre-tokenization.
BPE_ISH_PATTERN = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(tokens(col, lowercase=False))


def bpe_ish_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0), lambda t: t != "")
    )


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    tok = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))


def language_id(
    col: Column | str, langs: Sequence[str] = ("en", "de", "fr", "es")
) -> Column:
    """Pick the language whose stopword list hits most tokens; 'und'
    (undetermined) when nothing hits."""
    scored = F.array(
        *[
            F.struct(
                stopword_hits(col, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in langs
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(
    text_col: str = "text",
) -> Callable[[DataFrame], DataFrame]:
    """Standard quality-filter features: length, token stats, punctuation /
    alpha / stopword ratios, mean token length — one projection pass."""

    def _t(df: DataFrame) -> DataFrame:
        c = F.col(text_col)
        tok = tokens(text_col, lowercase=False)
        n_chars = F.length(c)
        n_tokens = F.size(tok)
        n_alpha = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
        n_punct = F.length(F.regexp_replace(c, r"[^\p{P}]", ""))
        en_sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        n_stop = F.size(
            F.filter(tokens(text_col), lambda t: F.array_contains(en_sw, t))
        )
        return (
            df.withColumn("n_chars_calc", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens.cast("long"))
            .withColumn(
                "mean_token_len",
                F.when(
                    n_tokens > 0,
                    (n_chars - (n_tokens - 1)).cast("double") / n_tokens,
                ),
            )
            .withColumn(
                "alpha_ratio",
                n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)),
            )
            .withColumn(
                "punct_ratio",
                n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
            )
            .withColumn(
                "stopword_ratio",
                n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)),
            )
        )

    return _t


def fingerprint(
    text_col: str = "text", out: str = "fingerprint"
) -> Callable[[DataFrame], DataFrame]:
    """64-bit content fingerprint: xxhash64 over the normalized token
    stream (case/punct/whitespace-insensitive exact-dup key)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(
            out, F.xxhash64(F.array_join(tokens(text_col), " "))
        )

    return _t
