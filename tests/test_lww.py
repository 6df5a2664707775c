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
