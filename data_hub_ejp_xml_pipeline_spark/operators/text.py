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


def token_vocab(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-``k`` regex tokens of the lowercased text
    by frequency (ties broken by token, so the cut is deterministic).
    One explode + one map-side-combining count shuffle; the top-k is a
    TakeOrdered (per-partition heaps + a driver merge of k rows), never
    a full sort — the 100 TB shape of every vocab/BPE-seed build."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0)
            )
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(k)
    )


def fingerprint(text_col: str = "text") -> Column:
    """Whitespace-normalized content hash (rolling-hash analog). The
    whitespace class is EXPLICIT so both regex engines agree: Java's
    \\s includes \\x0B (vertical tab), RE2's does not."""
    return F.md5(F.regexp_replace(F.lower(text_col), "[ \\t\\n\\f\\r]+", " "))


# deliberately simple, engine-portable patterns (same regex dialect subset
# in Spark/ICU and DuckDB/RE2): the point is the scrubbing DATAFLOW shape
PII_EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
PII_NUMBER_PATTERN = "[0-9]{9,}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email addresses and long digit runs; emit per-doc counts and
    the redacted-text fingerprint. Pure JVM regex — one pass, no shuffle.

    Counts reconcile with the redactions: n_long_numbers is counted AFTER
    email redaction (a digit run inside an email is one <EMAIL>, not also
    a <NUM>), so summing <EMAIL>/<NUM> tokens in the output always matches
    the reported counts."""
    after_email = F.regexp_replace(text_col, PII_EMAIL_PATTERN, "<EMAIL>")
    redacted = F.regexp_replace(after_email, PII_NUMBER_PATTERN, "<NUM>")
    return df.withColumns(
        {
            "n_emails": F.size(
                F.regexp_extract_all(text_col, F.lit(PII_EMAIL_PATTERN), F.lit(0))
            ),
            "n_long_numbers": F.size(
                F.regexp_extract_all(after_email, F.lit(PII_NUMBER_PATTERN), F.lit(0))
            ),
            "redacted_fp": F.md5(redacted),
        }
    )


def train_val_split(id_col: str = "doc_id", val_pct: int = 10) -> Column:
    """Deterministic, engine-portable split assignment: md5(id) → 28-bit
    int → mod 100. Stable across runs/engines (the property a training
    pipeline needs so a document never migrates between splits).
    Column-valued, like ``fingerprint`` — bound to whatever DataFrame it
    is selected from."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
    return F.when(
        F.pmod(h.cast("long"), F.lit(100)) < val_pct, F.lit("val")
    ).otherwise(F.lit("train"))


def contaminated_docs(
    df: DataFrame,
    probe_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: documents sharing ≥1 k-gram with the
    probe set (e.g. eval-set shingles). probe_shingles: a 1-column ``s``
    DataFrame, broadcast — the corpus side is the big one and it never
    shuffles more than its own exploded shingles."""
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import shingle_table

    sh = shingle_table(df, id_col=id_col, text_col=text_col, k=k)
    return (
        sh.join(F.broadcast(probe_shingles), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_unigram_max: float = 0.2, dup_bigram_max: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): the
    fraction of the document taken by its single most frequent word, and
    the fraction of duplicated word bigrams — the two cheapest signals
    for boilerplate/keyword-stuffed documents in a training corpus.

    Shapes: top-unigram needs real counting — explode → two partial-agg
    groupBys (scale-safe, map-side combined); the bigram ratio never
    explodes at all (``size - size(array_distinct)`` on the shingle
    array). Thresholds label rows rather than dropping them, so the same
    pass feeds both filtering and corpus diagnostics."""
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import shingles

    w = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col).alias("doc_id"), w.alias("w"))
    top = (
        base.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mc"), F.sum("c").alias("n_words"))
    )
    bg = base.select(
        "doc_id",
        (F.size("w") - 1).alias("nb"),
        F.size(shingles(F.col("w"), 2)).alias("nb_distinct"),
    )
    dup_frac = F.when(
        F.col("nb") >= 1, (F.col("nb") - F.col("nb_distinct")) / F.col("nb")
    ).otherwise(F.lit(0.0))
    top_frac = F.col("mc") / F.col("n_words")
    return (
        top.join(bg, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.round(top_frac, 4).alias("top_unigram_frac"),
            F.round(dup_frac, 4).alias("dup_bigram_frac"),
            F.when(
                (top_frac > top_unigram_max) | (dup_frac > dup_bigram_max),
                F.lit("repetitive"),
            ).otherwise(F.lit("ok")).alias("repetition_label"),
        )
    )
