"""As-of join operator: inclusive-boundary, null-when-none-precedes,
per-key isolation."""

from __future__ import annotations

import datetime as dt

from data_hub_ejp_xml_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, "a", T(2024, 1, 10)),
            (2, "a", T(2024, 1, 20)),
            (3, "a", T(2024, 1, 5)),   # before any right row → null
            (4, "b", T(2024, 1, 15)),  # key with no right rows at all
            (5, "a", T(2024, 1, 15)),  # exactly equal ts → inclusive match
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", T(2024, 1, 8), 100),
            ("a", T(2024, 1, 15), 200),
            ("c", T(2024, 1, 1), 999),  # other key never leaks
        ],
        "user_id string, o_ts timestamp, o_orderkey long",
    )
    out = {
        r.event_id: r.o_orderkey_asof
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="o_ts",
            value_cols=["o_orderkey"],
        ).collect()
    }
    assert out == {1: 100, 2: 200, 3: None, 4: None, 5: 200}


def test_asof_matched_null_value_not_carried_forward(spark):
    """A matched right row whose value column is genuinely NULL must yield
    NULL (DuckDB ASOF semantics), not the previous right row's value."""
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, "a", T(2024, 1, 20))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", T(2024, 1, 8), 100), ("a", T(2024, 1, 15), None)],
        "user_id string, o_ts timestamp, o_orderkey long",
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="o_ts",
        value_cols=["o_orderkey"],
    ).collect()
    assert rows[0].o_orderkey_asof is None
