"""Text analysis operators: quality scoring, language ID, token counting,
document fingerprinting.

All pure column expressions (whole-stage codegen; no UDFs) so they run at
scan speed over a 100 TB documents table — these are the per-document map
stage of a training-data pipeline and must not shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pathhier_spark.functions.text import STOPWORDS

# tiny per-language function-word lists for the n-gram/stopword heuristic
# language-ID (public common knowledge; deterministic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def with_quality_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Quality-scoring features: char/token counts, mean token length,
    punctuation ratio, stopword ratio, distinct-token ratio. The composite
    `quality_score` is a simple deterministic blend for filtering."""
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    out = (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "mean_token_len",
            F.when(n_tokens > 0, (F.length(F.concat_ws("", toks))).cast("double") / n_tokens)
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn("distinct_ratio", distinct_ratio)
    )
    return out.withColumn(
        "quality_score",
        F.round(
            0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            + 0.3 * F.col("distinct_ratio")
            + 0.3 * (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))),
            6,
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by fraction of its
    marker words present; predict the argmax (ties -> lexicographic lang).
    Emits lang_pred and per-language scores."""
    toks = F.array_distinct(_tokens(text_col))
    out = df
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_lit = F.array(*[F.lit(w) for w in markers])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.array_intersect(toks, marker_lit)).cast("double") / len(markers),
        )
    best = None
    for lang in sorted(LANG_MARKERS):
        s = F.col(f"score_{lang}")
        if best is None:
            best = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(s > best["s"], F.struct(s.alias("s"), F.lit(lang).alias("l"))).otherwise(best)
    return out.withColumn("lang_pred", best["l"])


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish subword
    estimate (word-piece count ~ ceil(len/4) per word — the standard
    chars/4 heuristic, computed exactly per token)."""
    toks = _tokens(text_col)
    return df.withColumn("ws_tokens", F.size(toks).cast("long")).withColumn(
        "bpe_tokens_est",
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        ),
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 (lexicographic)
    over each sliding window of `window` tokens, collected as a sorted
    distinct set. md5 hex strings are engine-portable (DuckDB computes the
    identical value for the oracle check). Robust to small edits; equality
    of fingerprints => near-identical docs."""
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return df.withColumn(
        "fingerprint", F.sort_array(F.array_distinct(F.slice(F.sort_array(grams), 1, 16)))
    )
