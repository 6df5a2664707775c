"""LWW reduction: all four strategies == pandas oracle (token-array equality)."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.operators.lww import iter_reduce_strategies, reduce_latest
from data_hub_ejp_xml_pipeline_spark.oracle import (
    assert_final_state_equal,
    expected_final_state_pandas,
)


@pytest.mark.parametrize("strategy", list(iter_reduce_strategies()))
def test_reduce_latest_matches_oracle(spark, changelog_df, changelog_pdf, strategy):
    reduced = reduce_latest(changelog_df, strategy=strategy)
    # final state: drop deletes, project target columns
    actual = (
        reduced.filter("op != 'D'")
        .selectExpr("doc_id", "tokens", "n_tok", "source", "lsn as _lsn")
        .toPandas()
    )
    expected = expected_final_state_pandas(changelog_pdf)
    assert_final_state_equal(actual, expected)


def test_reduce_is_idempotent(spark, changelog_df):
    once = reduce_latest(changelog_df)
    twice = reduce_latest(once)
    assert once.count() == twice.count()
    h = lambda df: df.selectExpr("sum(pmod(xxhash64(doc_id, lsn, op), 1000000007)) h").first().h  # noqa: E731
    assert h(once) == h(twice)


def test_agg_plan_has_partial_aggregation(spark, changelog_df):
    """The default strategy must show two-phase hash aggregation (map-side
    partial combine) — the property that makes replays/hot keys cheap."""
    plan = reduce_latest(changelog_df, strategy="agg")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2, plan


def test_applyinpandas_guard_routes_to_hybrid_above_threshold(spark):
    """Plan gate: above APPLYINPANDAS_MAX_ROWS the guarded grouped-map
    strategy must NOT plan a single-phase FlatMapGroupsInPandas on the raw
    key (the 50x anti-pattern); it reroutes through the hybrid variant
    (vectorized MapInPandas partial + JVM final aggregate)."""
    import data_hub_ejp_xml_pipeline_spark.operators.lww as lww

    df = spark.range(0, 2000).selectExpr(
        "cast(id % 50 as string) doc_id", "id as lsn", "id as payload"
    )
    old = lww.APPLYINPANDAS_MAX_ROWS
    lww.APPLYINPANDAS_MAX_ROWS = 1000  # force "above threshold" cheaply
    try:
        routed = lww.reduce_latest(df, strategy="applyinpandas")
        plan = routed._jdf.queryExecution().executedPlan().toString()
        # hybrid shape: per-Arrow-batch MapInPandas partial + JVM final
        # aggregate; NO per-group FlatMapGroupsInPandas exchange
        assert "FlatMapGroupsInPandas" not in plan
        assert "MapInPandas" in plan
        assert "max_by" in plan or "HashAggregate" in plan or "SortAggregate" in plan
        # below threshold: raw grouped-map preserved
        small = lww.reduce_latest(df.limit(100), strategy="applyinpandas")
        small_plan = small._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in small_plan
    finally:
        lww.APPLYINPANDAS_MAX_ROWS = old

    # forced raw shape stays available for parity benchmarks
    raw = lww.reduce_latest(df, strategy="applyinpandas!")
    assert "FlatMapGroupsInPandas" in raw._jdf.queryExecution().executedPlan().toString()


def test_quadratic_neardup_guard(spark, monkeypatch):
    """q_embedding_neardup refuses the O(n^2) cross-join above its vector
    budget, pointing at the LSH path."""
    import data_hub_ejp_xml_pipeline_spark.queries as q

    monkeypatch.setattr(q, "_NEARDUP_MAX_VECS", 10)
    with pytest.raises(ValueError, match="ann_lsh"):
        q.q_embedding_neardup(spark, "/root/testdata/sf0.001")
