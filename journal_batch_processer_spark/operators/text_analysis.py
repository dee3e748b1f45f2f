"""Text analysis for training-data pipelines: token stats, quality
scoring, language id, fingerprinting.

Everything is built from dialect-portable primitives (split on a
literal space, list filters, md5, integer ratios) so the DuckDB
oracles compute the same bits — and everything stays in whole-stage
codegen; no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
}


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    # total non-space chars / token count — integer-derived, exact
    avg_len = (n_chars - (n_tokens - 1)) / n_tokens
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        avg_len.alias("avg_token_len"),
    )


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length + stopword-ratio heuristic quality score in [0, 1]."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stop = _count_in(toks, STOPWORDS)
    stop_ratio = stop / n
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    score = F.lit(0.5) * len_score + F.lit(0.5) * stop_ratio
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        stop.alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language id (n-gram-free heuristic): argmax of
    marker hits with a fixed tie order; zero hits → 'und'."""
    toks = _tokens(F.col(text_col))
    counts = {lang: _count_in(toks, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:  # fixed order: later wins only on strict >
        c = counts[lang]
        is_better = c > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, c).otherwise(best_n)
    return df.select(
        F.col(id_col),
        *[counts[lang].alias(f"n_{lang}") for lang in LANG_MARKERS],
        best.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization + md5 content fingerprint — the join key for
    cross-corpus exact dedup at scale (16-byte shuffle key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
