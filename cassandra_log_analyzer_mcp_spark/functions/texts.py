"""Text-analysis Column expressions: tokenization, shingles, quality,
language-ID — SURVEY §2D. All JVM-side (regexp/array functions inside
whole-stage codegen); shared constants drive both the Spark exprs and
the DuckDB oracle SQL so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokens
TOKEN_REGEX = r"\S+"
#: BPE-ish pre-tokenizer: letter runs, single digits, single symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
#: punctuation-ish characters for quality scoring
PUNCT_REGEX = r"[^A-Za-z0-9\s]"

#: per-language stopword lists for the n-gram-heuristic language ID.
#: Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "a"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
    "es": ["el", "los", "las", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "ist", "nicht"],
    "zh": ["的", "了", "是", "我", "不"],
}
#: stopword list used by the quality score (English, matches oracle)
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def lang_pattern(lang: str) -> str:
    words = "|".join(LANG_STOPWORDS[lang])
    # \b is ASCII-only in RE2/Java — fine for latin scripts; for zh the
    # characters are unambiguous without boundaries.
    return rf"\b({words})\b" if lang != "zh" else f"({words})"


def quality_stop_pattern() -> str:
    return rf"\b({'|'.join(QUALITY_STOPWORDS)})\b"


def tokens_col(text: Column = None) -> Column:
    t = F.col("text") if text is None else text
    return F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)


def count_matches(pattern: str, text: Column = None) -> Column:
    t = F.col("text") if text is None else text
    return F.size(F.regexp_extract_all(t, F.lit(pattern), 0))


def shingles_col(tokens: Column, k: int) -> Column:
    """Array of k-token shingles (space-joined); empty when < k tokens.

    Explicit when-guard because Spark's sequence(1, n) DESCENDS for
    n < 1 (it would emit [1, 0]) — unlike DuckDB's range().
    """
    n = F.size(tokens)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(tokens, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
