"""Text-analysis operators for a training-data pipeline (north star).

All built from JVM-side ``pyspark.sql.functions`` — no Python UDFs in any
hot path, so every expression stays inside whole-stage codegen and scales
linearly with executors. Regexes are RE2-compatible (simple classes /
alternations) so the DuckDB oracle can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "\\s+"
PUNCT_RE = "[!?.,;:]"
ALPHA_RE = "[A-Za-z]"
UPPER_RE = "[A-Z]"
# Tiny per-language stopword sets for the heuristic language scorer.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "nicht"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (BPE-ish regex split)."""
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def _ratio(num: Column, den: Column) -> Column:
    return F.round(num.cast("double") / F.greatest(den, F.lit(1)).cast("double"), 6)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha / mean-word-length quality signals.

    The classic cheap quality filters (C4/Gopher-style): documents that are
    too short, all punctuation, or have degenerate words get low scores.
    """
    t = F.col(text_col)
    n_char = char_count(t)
    n_tok = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(ALPHA_RE), 0))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(UPPER_RE), 0))
    return (
        df.withColumn("n_chars_obs", n_char.cast("bigint"))
        .withColumn("n_tokens", n_tok.cast("bigint"))
        .withColumn("punct_ratio", _ratio(n_punct, n_char))
        .withColumn("alpha_ratio", _ratio(n_alpha, n_char))
        .withColumn("upper_ratio", _ratio(n_upper, n_char))
        .withColumn("mean_word_len", _ratio(n_alpha, n_tok))
    )


def lang_score(col: Column, lang: str) -> Column:
    """Stopword-hit count for one language (n-gram-free heuristic)."""
    pattern = "\\b(" + "|".join(LANG_STOPWORDS[lang]) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern))).cast("bigint")


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits.

    Deterministic tie-break: language name ascending (stable across
    engines). Unknown when no stopword hits at all.
    """
    t = F.col(text_col)
    out = df
    for lang in sorted(LANG_STOPWORDS):
        out = out.withColumn(f"score_{lang}", lang_score(t, lang))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_STOPWORDS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of whitespace-collapsed,
    lowercased text. md5 (not xxhash) so external systems reproduce it."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), TOKEN_SPLIT_RE, " ")
    return F.md5(normalized)
