"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (no Python in the hot path): token counting,
quality scoring, language ID (n-gram heuristic), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# must match the oracle SQL list exactly
STOPWORDS = ["the", "a", "an", "of", "in", "on", "and", "or", "to", "is",
             "was", "for", "with", "that", "it"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def _n_tokens(col):
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(col))
    ).cast("long")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (BPE-ish regex count available via
    ``regex_token_counts``)."""
    return df.withColumn("n_tokens", _n_tokens(F.col(text_col)))


def regex_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count (BPE proxy for training-cost estimation):
    letter runs, digit runs and punctuation runs count as one token each —
    one JVM-side regexp_count, no UDF."""
    return df.withColumn(
        "n_subword_tokens",
        F.regexp_count(
            F.col(text_col), F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
        ).cast("long"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features,
    rounded to 6dp for cross-engine stability."""
    c = F.col(text_col)
    toks = _tokens(c)
    n = _n_tokens(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    non_space_len = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return (
        df.withColumn("n_chars_obs", F.length(c).cast("long"))
        .withColumn(
            "stopword_ratio",
            F.round(n_stop / F.greatest(n, F.lit(1)).cast("double"), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(non_space_len / F.greatest(n, F.lit(1)).cast("double"), 6),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """S6-style language ID via stopword-profile voting (deterministic
    n-gram/stopword heuristic — no external lib). Emits ``lang_pred``."""
    profiles = {
        "en": ["the", "and", "of", "to", "is", "was", "with"],
        "de": ["der", "die", "und", "das", "ist", "mit", "von"],
        "fr": ["le", "la", "et", "les", "des", "est", "avec"],
        "es": ["el", "la", "los", "las", "es", "con", "por"],
    }
    toks = _tokens(F.lower(F.col(text_col)))

    def member_of(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda x: F.array_contains(arr, x)

    scores = [
        F.size(F.filter(toks, member_of(words))).alias(f"score_{lang}")
        for lang, words in profiles.items()
    ]
    langs = list(profiles)
    df2 = df.select("*", *scores)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return df2.withColumn("lang_pred", pred).drop(*[f"score_{l}" for l in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: xxhash64 of the normalized token stream —
    whitespace/case-insensitive rolling-hash analog, JVM-side."""
    norm = F.concat_ws(" ", _tokens(F.lower(F.col(text_col))))
    return df.withColumn("fingerprint", F.xxhash64(norm))
