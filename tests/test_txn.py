"""Transaction-boundary grouping: complete transactions apply atomically,
partial ones are held back intact, non-transactional rows pass through."""

from __future__ import annotations

from data_hub_ejp_xml_pipeline_spark.operators.txn import (
    complete_transactions,
    incomplete_transaction_summary,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, doc_id string, txn_id long, txn_n int"
    )


def test_complete_and_partial(spark):
    df = _df(
        spark,
        [
            (1, "a", 10, 2), (2, "b", 10, 2),          # complete pair
            (3, "c", 11, 3), (4, "d", 11, 3),          # missing 1 of 3
            (5, "e", 12, 1),                            # complete singleton
        ],
    )
    kept = {r.lsn for r in complete_transactions(df).collect()}
    assert kept == {1, 2, 5}  # txn 11's SURVIVING members held back too


def test_null_txn_passes_through(spark):
    df = _df(spark, [(1, "a", None, None), (2, "b", 7, 2)])
    kept = {r.lsn for r in complete_transactions(df).collect()}
    assert kept == {1}  # non-transactional row admitted; partial txn 7 held


def test_incomplete_summary(spark):
    df = _df(
        spark,
        [(1, "a", 10, 2), (2, "b", 10, 2), (3, "c", 11, 3), (4, "d", 11, 3)],
    )
    rows = incomplete_transaction_summary(df).collect()
    assert [(r.txn_id, r.expected, r.present, r.n_missing) for r in rows] == [
        (11, 3, 2, 1)
    ]


def test_single_shuffle_plan(spark):
    """The admission filter is ONE exchange on txn_id — no join."""
    df = _df(spark, [(1, "a", 10, 2), (2, "b", 10, 2)])
    plan = complete_transactions(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
