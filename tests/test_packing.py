"""Sequence packing: chunked invariants + greedy next-fit vs a python
oracle (the chunked form is also DuckDB-oracle-checked via the driver
query suite)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.operators.packing import (
    pack_chunked,
    pack_chunked_stats,
    pack_greedy,
)

L = 100  # max_tokens for tests


@pytest.fixture()
def docs(spark):
    rows = [
        ("a", "d01", 40), ("a", "d02", 40), ("a", "d03", 40),  # straddles
        ("a", "d04", 250),                                      # oversized
        ("b", "d05", 100),                                      # exact fit
        ("b", "d06", 1),
        ("c", "d07", 99),
    ]
    return spark.createDataFrame(rows, "source string, doc_id string, n_tok long")


def test_chunked_spans_are_a_partition_of_each_doc(spark, docs):
    spans = pack_chunked(docs, L, group_col="source").toPandas()
    # every document's spans cover [0, n_tok) without gaps or overlaps
    for doc_id, grp in spans.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        assert grp["tok_start"].iloc[0] == 0
        assert list(grp["tok_start"].iloc[1:]) == list(grp["tok_end"].iloc[:-1])
    # chunk boundaries: within a group, every chunk except the last holds
    # exactly L tokens
    stats = pack_chunked_stats(docs, L, group_col="source").toPandas()
    for g, grp in stats.groupby("group"):
        grp = grp.sort_values("chunk_id")
        assert (grp["n_tokens"].iloc[:-1] == L).all()
        assert grp["n_tokens"].iloc[-1] <= L
    # group totals match input totals
    totals = stats.groupby("group")["n_tokens"].sum().to_dict()
    assert totals == {"a": 370, "b": 101, "c": 99}


def test_chunked_straddle_and_oversize(spark, docs):
    spans = pack_chunked(docs, L, group_col="source").toPandas()
    d3 = spans[spans.doc_id == "d03"].sort_values("chunk_id")
    # d03 occupies tokens 80..120 in group a → straddles chunks 0 and 1
    assert list(d3["chunk_id"]) == [0, 1]
    assert list(d3["tok_start"]) == [0, 20]
    assert list(d3["tok_end"]) == [20, 40]
    d4 = spans[spans.doc_id == "d04"]
    assert len(d4) == 3  # 250 tokens starting at 120 → chunks 1,2,3


def _greedy_oracle(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    out = []
    for g, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id")
        seq, fill = 0, 0
        for _, r in grp.iterrows():
            if fill and fill + r.n_tok > max_tokens:
                seq, fill = seq + 1, 0
            fill += r.n_tok
            out.append((g, r.doc_id, seq, fill))
    return pd.DataFrame(out, columns=["group", "doc_id", "seq_id", "seq_used_tokens"])


def test_greedy_matches_python_oracle(spark, docs):
    got = (
        pack_greedy(docs, L, group_col="source")
        .select("group", "doc_id", "seq_id", "seq_used_tokens")
        .toPandas()
        .sort_values(["group", "doc_id"])
        .reset_index(drop=True)
    )
    exp = (
        _greedy_oracle(docs.toPandas(), L)
        .sort_values(["group", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # invariant: no sequence except oversized single-doc ones exceeds L
    per_seq = got.groupby(["group", "seq_id"]).agg(
        used=("seq_used_tokens", "max"), n=("doc_id", "count")
    )
    over = per_seq[per_seq.used > L]
    assert (over.n == 1).all(), "only oversized single docs may exceed max_tokens"


def test_greedy_matches_python_oracle_random(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "source": rng.choice(["s1", "s2", "s3"], 300),
            "doc_id": [f"d{i:04d}" for i in range(300)],
            "n_tok": rng.integers(1, 180, 300),
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        pack_greedy(sdf, L, group_col="source")
        .select("group", "doc_id", "seq_id", "seq_used_tokens")
        .toPandas()
        .sort_values(["group", "doc_id"])
        .reset_index(drop=True)
    )
    exp = (
        _greedy_oracle(pdf, L).sort_values(["group", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_chunked_sequences_token_equality_vs_python(spark):
    """pack_chunked_sequences emits the ACTUAL packed token arrays: for
    every (group, chunk) the tokens equal the python oracle's
    concat-in-doc-order-then-cut layout, per element."""
    import random

    from data_hub_ejp_xml_pipeline_spark.operators.packing import (
        pack_chunked_sequences,
    )

    rng = random.Random(11)
    rows = []
    tok = 0
    for g in ("a", "b", "c"):
        for i in range(rng.randint(3, 9)):
            n = rng.choice([0, 1, 7, L - 1, L, L + 13, 3 * L])
            toks = list(range(tok, tok + n))  # globally unique token ids
            tok += n
            rows.append((g, f"d{i:02d}", toks))
    df = spark.createDataFrame(rows, "source string, doc_id string, tokens array<int>")

    got = {
        (r.group, r.chunk_id): (r.n_docs, r.n_tokens, list(r.tokens))
        for r in pack_chunked_sequences(df, L).collect()
    }

    expected = {}
    for g in ("a", "b", "c"):
        stream, docs_at = [], []
        for grp, doc_id, toks in sorted(r for r in rows if r[0] == g):
            if toks:
                docs_at.append((len(stream), len(stream) + len(toks)))
                stream.extend(toks)
        for c in range(0, (len(stream) + L - 1) // L):
            lo, hi = c * L, min((c + 1) * L, len(stream))
            n_docs = sum(1 for s, e in docs_at if s < hi and e > lo)
            expected[(g, c)] = (n_docs, hi - lo, stream[lo:hi])

    assert got == expected
