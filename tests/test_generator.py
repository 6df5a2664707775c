"""Generator fixtures are deterministic and contain the mandated anomalies
(FIXTURES.md §1: replays, out-of-order, skew, deletes, phantom upserts)."""

from __future__ import annotations

import pandas as pd

from data_hub_ejp_xml_pipeline_spark.generator import (
    generate_changelog_df,
    generate_changelog_pandas,
)


def test_deterministic():
    a = generate_changelog_pandas(n_events=2000, seed=42)
    b = generate_changelog_pandas(n_events=2000, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_contains_replays_and_out_of_order():
    df = generate_changelog_pandas(n_events=2000, seed=42)
    dup = df.duplicated(subset=["doc_id", "lsn"]).sum()
    assert dup > 0, "expected replayed (duplicate) events"
    assert not df["lsn"].is_monotonic_increasing, "expected out-of-order arrivals"


def test_contains_skew_deletes_phantoms():
    df = generate_changelog_pandas(n_events=4000, seed=42)
    counts = df["doc_id"].value_counts()
    # hot keys: top-1% of docs should carry >> uniform share
    top = counts.head(max(1, len(counts) // 100)).sum()
    assert top / len(df) > 0.15, "expected hot-key skew"
    assert (df["op"] == "D").any(), "expected deletes"
    # phantom: a doc whose first (min-lsn) event is not an insert
    first = df.sort_values("lsn").drop_duplicates("doc_id", keep="first")
    assert (first["op"] != "I").any(), "expected updates/deletes to never-inserted keys"


def test_token_invariant():
    df = generate_changelog_pandas(n_events=1000, seed=42)
    live = df[df["op"] != "D"]
    assert all(len(t) == n for t, n in zip(live["tokens"], live["n_tok"]))
    assert df.loc[df["op"] == "D", "tokens"].isna().all()


def test_distributed_generator_matches_shape(spark):
    df = generate_changelog_df(spark, n_events=5000, seed=42)
    assert df.count() == 5000
    row = df.filter("op != 'D'").first()
    assert len(row.tokens) == row.n_tok
    # deterministic across invocations
    expr = "sum(pmod(xxhash64(doc_id, lsn, op), 1000000007)) h"
    h1 = df.selectExpr(expr).first().h
    h2 = generate_changelog_df(spark, n_events=5000, seed=42).selectExpr(expr).first().h
    assert h1 == h2
