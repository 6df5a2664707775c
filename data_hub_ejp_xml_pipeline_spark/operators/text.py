"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting. All single-pass JVM column expressions."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
}

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _hits(words: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(t) for t in vocab])
    return F.size(F.filter(words, lambda x: F.array_contains(arr, x)))


def quality_metrics(df: DataFrame, text_col: str = "text",
                    n_chars_col: str | None = "n_chars") -> DataFrame:
    """Length / stopword heuristics + a quality label."""
    w = F.split(text_col, " ")
    n_words = F.size(w)
    n_chars = F.col(n_chars_col) if n_chars_col else F.length(text_col)
    ratio = _hits(w, STOPWORDS) / n_words
    return df.withColumns(
        {
            "n_words": n_words,
            "chars_per_word": F.round(n_chars / n_words, 4),
            "stopword_ratio": F.round(ratio, 4),
            "quality_label": F.when((n_words >= 20) & (ratio > 0.01), "good").otherwise("low"),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit argmax with deterministic first-wins tie-break."""
    w = F.split(text_col, " ")
    scores = {lang: _hits(w, toks) for lang, toks in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit("unk")
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn("pred_lang", expr)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return df.withColumns(
        {
            "ws_tokens": F.size(F.split(text_col, " ")),
            "re_tokens": F.size(
                F.regexp_extract_all(text_col, F.lit(TOKEN_PATTERN), F.lit(0))
            ),
        }
    )


def fingerprint(text_col: str = "text") -> Column:
    """Whitespace-normalized content hash (rolling-hash analog)."""
    return F.md5(F.regexp_replace(F.lower(text_col), r"\s+", " "))
