"""Text-analysis operators for the training-data pipeline (task brief):
language ID, quality scoring, token counting, document fingerprinting.

All hot-path logic is JVM-side column expressions (split/regexp/aggregate);
nothing is per-row Python.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for an n-gram-free heuristic langid;
# deterministic and dependency-free (public common stopwords)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "una", "con", "para"],
}


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(text_col), r"[^\p{L}\p{N}]+")


def language_id(text_col: Column) -> Column:
    """Heuristic language id: the language whose marker-word hit count is
    highest ('und' when all zero).  Pure array expressions — one pass."""
    toks = _tokens(text_col)

    def hit(words):
        # closure factory (PySpark lambda-arity introspection; see dedup.py)
        return lambda t: t.isin(*words)

    scores = [
        F.struct(
            F.size(F.filter(toks, hit(tuple(words)))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-approximating count: word-piece regex (letters runs, digit runs,
    single punctuation) — a deterministic proxy for tokenizer budgeting."""
    return F.size(F.regexp_extract_all(
        text_col, F.lit(r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"), F.lit(0)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1] (heuristics in the C4/Gopher tradition, simplified)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(F.filter(toks, lambda x: x != ""))
    en = _LANG_MARKERS["en"]
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*en)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), F.lit(0)))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def fingerprint(text_col: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — the exact-dedup key (content-stable: normalization makes
    it robust to whitespace-only edits)."""
    normalized = F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")
    return F.xxhash64(normalized)


def with_textstats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (quality_features(docs, text_col)
            .withColumn("lang_detected", language_id(F.col(text_col)))
            .withColumn("n_tokens_ws", token_count(F.col(text_col)))
            .withColumn("n_tokens_bpe", bpe_ish_token_count(F.col(text_col)))
            .withColumn("fingerprint", fingerprint(F.col(text_col))))
