"""Sequence packing for tokenized training data.

The engine's target table holds pre-tokenized documents
(``doc_id, tokens array<int32>, n_tok, source`` — BASELINE input hint);
training consumption needs fixed-length sequences. Two packing semantics:

* **chunked** (``pack_chunked``) — the standard GPT-pretraining shape:
  documents are concatenated in a deterministic order within each
  ``group_col`` stream and cut at fixed ``max_tokens`` boundaries;
  documents may straddle chunks. Pure DataFrame ops: one window cumsum
  per group + a ``sequence()`` explode of the chunk span — ONE shuffle,
  no Python, exactly reproducible by the DuckDB oracle.

* **greedy next-fit** (``pack_greedy``) — whole documents only: a new
  sequence starts when the next document would overflow ``max_tokens``.
  Inherently a sequential recurrence, so it runs as a grouped-map pandas
  kernel per group (groups are independent streams — the parallelism is
  across groups, the recurrence stays inside one Arrow batch). Oversized
  documents (> max_tokens) get a sequence of their own.

At 100 TB: ``group_col`` (e.g. ``source``) is the unit of parallelism and
ordering; both forms shuffle once on it. The chunked form stays entirely
in whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_chunked(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    group_col: str = "source",
) -> DataFrame:
    """Concat-then-chunk packing: per group (ordered by id), documents are
    laid head-to-tail on a token axis and cut every ``max_tokens``.

    Returns one row per (document × chunk it overlaps):
    ``group, chunk_id, doc_id, tok_start, tok_end`` where tok_start/tok_end
    are the token span OF THE DOCUMENT that lands in this chunk
    (0-based, end-exclusive).
    """
    w = W.partitionBy(group_col).orderBy(id_col)
    laid = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.col(n_tok_col).alias("n_tok"),
        (F.sum(n_tok_col).over(w) - F.col(n_tok_col)).alias("g_start"),
    ).filter(F.col("n_tok") > 0)
    first_chunk = F.floor(F.col("g_start") / max_tokens)
    last_chunk = F.floor((F.col("g_start") + F.col("n_tok") - 1) / max_tokens)
    chunks = laid.select(
        "group",
        "doc_id",
        "n_tok",
        "g_start",
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * max_tokens
    chunk_hi = chunk_lo + max_tokens
    return chunks.select(
        "group",
        "chunk_id",
        "doc_id",
        (F.greatest(chunk_lo, F.col("g_start")) - F.col("g_start")).alias("tok_start"),
        (
            F.least(chunk_hi, F.col("g_start") + F.col("n_tok")) - F.col("g_start")
        ).alias("tok_end"),
    )


def chunk_sliding(
    df: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-document sliding context windows with overlap — the
    long-document squeeze every LM data pipeline runs before packing
    (HF ``return_overflowing_tokens`` shape): chunk ``i`` covers token
    span ``[i*stride, min(i*stride + window, n))`` for every
    ``i*stride < n``. A short document yields one (partial) chunk;
    overlap is ``window - stride`` tokens.

    Pure JVM expressions — a ``sequence()`` explode per document, no
    shuffle at all (the explode is row-local); at 100 TB this is a
    map-only pass whose output is ~``n/stride`` rows per document.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    n = F.col("_n")
    i = F.col("chunk_id")
    return (
        df.select(
            F.col(id_col).alias(id_col),
            F.col(n_tok_col).cast("long").alias("_n"),
        )
        .filter(n > 0)
        .select(
            id_col,
            "_n",
            F.explode(
                F.sequence(F.lit(0).cast("long"),
                           F.floor((n - 1) / stride).cast("long"))
            ).alias("chunk_id"),
        )
        .select(
            id_col,
            i,
            (i * stride).alias("tok_start"),
            F.least(i * stride + window, n).alias("tok_end"),
            (F.least(i * stride + window, n) - i * stride).alias("chunk_tok"),
        )
    )


def pack_chunked_stats(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    group_col: str = "source",
) -> DataFrame:
    """Per-chunk rollup of ``pack_chunked``: document count, token count,
    fill ratio (the final chunk of each group may be partial)."""
    spans = pack_chunked(df, max_tokens, id_col, n_tok_col, group_col)
    return spans.groupBy("group", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("n_tokens"),
        F.round(
            F.sum(F.col("tok_end") - F.col("tok_start")) / F.lit(float(max_tokens)), 4
        ).alias("fill_ratio"),
    )


def pack_chunked_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """Assemble the ACTUAL packed training sequences, not just spans: per
    chunk, the concatenation (in doc order) of each overlapping document's
    token slice. Returns ``group, chunk_id, n_docs, n_tokens, tokens``
    where ``tokens`` is the chunk's token array (exactly ``max_tokens``
    long except each group's final partial chunk).

    Pure DataFrame ops end-to-end: the span layout is ``pack_chunked``
    (window cumsum + sequence explode), the per-doc slice is
    ``F.slice(tokens, tok_start+1, tok_end-tok_start)`` (1-based), and the
    chunk assembly is ``flatten(array_sort(collect_list(struct(doc_id,
    slice))))`` — doc order inside the chunk is restored by the struct
    sort, so the aggregation itself needs no ordering guarantee. One
    shuffle (on group for the window) + one aggregation by (group,
    chunk_id); token bytes move through the shuffle once, which is the
    floor for any reorganization from doc-major to chunk-major layout.
    """
    n_tok = F.size(F.col(tokens_col))
    spans = pack_chunked(
        df.select(
            F.col(group_col), F.col(id_col), F.col(tokens_col), n_tok.alias("_n_tok")
        ),
        max_tokens,
        id_col=id_col,
        n_tok_col="_n_tok",
        group_col=group_col,
    )
    # re-join the token arrays onto the spans: pack_chunked only carries
    # scalars through the window; the join is on the (group, doc) key and
    # broadcast-free (both sides are the same data, co-partitioned by the
    # window's shuffle)
    with_toks = spans.join(
        df.select(
            F.col(group_col).alias("group"),
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).alias("_toks"),
        ),
        ["group", "doc_id"],
    )
    piece = F.slice(
        F.col("_toks"), F.col("tok_start") + 1, F.col("tok_end") - F.col("tok_start")
    )
    return (
        with_toks.select("group", "chunk_id", "doc_id", piece.alias("_piece"))
        .groupBy("group", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "_piece"))),
                    lambda s: s["_piece"],
                )
            ).alias("tokens"),
        )
        .select(
            "group",
            "chunk_id",
            "n_docs",
            F.size("tokens").alias("n_tokens"),
            "tokens",
        )
    )


_GREEDY_SCHEMA_SUFFIX = [
    T.StructField("seq_id", T.LongType()),
    T.StructField("seq_used_tokens", T.LongType()),
]


def pack_greedy(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    group_col: str = "source",
) -> DataFrame:
    """Greedy next-fit packing of WHOLE documents into sequences.

    Sequential recurrence per group → grouped-map pandas kernel (the
    per-group loop is a vectorized cumsum-with-reset); output adds
    ``seq_id`` (per group, 0-based) and ``seq_used_tokens`` (running fill
    of that sequence after this document).
    """
    out_schema = T.StructType(
        [
            T.StructField("group", T.StringType()),
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("n_tok", T.LongType()),
        ]
        + _GREEDY_SCHEMA_SUFFIX
    )
    narrow = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.col(n_tok_col).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        seq_ids, used = [], []
        seq_id, fill = 0, 0
        for n in pdf["n_tok"]:
            if fill and fill + n > max_tokens:
                seq_id += 1
                fill = 0
            fill += int(n)
            seq_ids.append(seq_id)
            used.append(fill)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_used_tokens"] = pd.Series(used, dtype="int64")
        return pdf

    return narrow.groupBy("group").applyInPandas(pack_group, schema=out_schema)
