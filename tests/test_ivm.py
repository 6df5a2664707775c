"""Incremental view maintenance (plans/ivm.py): the per-epoch-maintained
totals table must equal a full GROUP BY recompute over the base after
every epoch, across updates, deletes, group moves, stale updates, replay
and the IVM-committed/merge-crashed window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline


def _recompute(pipe):
    return {
        r[0]: (r[1], r[2])
        for r in pipe.final_state()
        .groupBy("source")
        .agg(F.count("*").alias("cnt"), F.sum("n_tok").cast("double").alias("total"))
        .collect()
    }


def _totals(ivm):
    return {r[0]: (r[1], r[2]) for r in ivm.read_totals().collect()}


def _pipe(spark, tmp_path, ivm):
    return MergePipeline(
        spark, str(tmp_path / "tbl"), n_buckets=4, ivm_state=ivm
    )


def _epochs(changelog_df, n):
    lo, hi = changelog_df.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // n + 1
    return [
        changelog_df.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        for i in range(n)
    ]


def test_ivm_matches_recompute_every_epoch(spark, tmp_path, changelog_df):
    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="source", value_col="n_tok"
    )
    pipe = _pipe(spark, tmp_path, ivm)
    for i, batch in enumerate(_epochs(changelog_df, 3)):
        pipe.apply(batch, batch_id=i)
        assert _totals(ivm) == _recompute(pipe), f"diverged at epoch {i}"


def _one_row(spark, doc_id, n_tok, source, lsn, op):
    return spark.createDataFrame(
        [(doc_id, [1, 2], n_tok, source, lsn, op)],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string",
    )


def test_ivm_delete_group_move_and_stale(spark, tmp_path, changelog_df):
    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="source", value_col="n_tok"
    )
    pipe = _pipe(spark, tmp_path, ivm)
    pipe.apply(changelog_df, batch_id=0)
    doc = pipe.final_state().select("doc_id").orderBy("doc_id").first()[0]
    hi = changelog_df.agg(F.max("lsn")).first()[0]

    # group move: doc hops to a brand-new group with a higher LSN
    pipe.apply(_one_row(spark, doc, 7, "moved-src", hi + 1, "U"), batch_id=1)
    assert _totals(ivm) == _recompute(pipe)
    assert _totals(ivm)["moved-src"] == (1, 7.0)

    # stale update: lower LSN than the stored row — merge ignores it,
    # so the totals must not move either
    before = _totals(ivm)
    pipe.apply(_one_row(spark, doc, 999, "stale-src", hi - 1000, "U"), batch_id=2)
    assert _totals(ivm) == before
    assert "stale-src" not in _totals(ivm)

    # delete: the moved group empties and disappears from the view
    pipe.apply(_one_row(spark, doc, None, None, hi + 2, "D"), batch_id=3)
    assert _totals(ivm) == _recompute(pipe)
    assert "moved-src" not in _totals(ivm)

    # stale update against the DELETED key (lsn below the tombstone's):
    # the merge ignores it, and the IVM must see the tombstone's _lsn —
    # not treat the key as absent and count a phantom insert (the bug the
    # streaming crash test first caught)
    before = _totals(ivm)
    pipe.apply(_one_row(spark, doc, 5, "ghost-src", hi + 1, "U"), batch_id=4)
    assert _totals(ivm) == before == _recompute(pipe)
    assert "ghost-src" not in _totals(ivm)

    # resurrect: an update ABOVE the tombstone's lsn wins in the merge
    # and must re-enter the view as a fresh insert (no retraction)
    pipe.apply(_one_row(spark, doc, 11, "back-src", hi + 3, "U"), batch_id=5)
    assert _totals(ivm) == _recompute(pipe)
    assert _totals(ivm)["back-src"] == (1, 11.0)


def test_ivm_replay_and_crash_window(spark, tmp_path, changelog_df):
    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="source", value_col="n_tok"
    )
    pipe = _pipe(spark, tmp_path, ivm)
    e0, e1 = _epochs(changelog_df, 2)
    pipe.apply(e0, batch_id=0)
    want = _totals(ivm)

    # replayed epoch: both ledgers no-op, totals byte-identical
    pipe.apply(e0, batch_id=0)
    assert _totals(ivm) == want == _recompute(pipe)

    # crash window: IVM commits epoch 1, the merge never runs; the
    # replayed pipeline apply no-ops IVM on its ledger and applies the
    # merge — converging to the crash-free state
    reduced = reduce_latest(e1, key="doc_id")
    ivm.apply(reduced, pipe.table, batch_id=1)
    pipe.apply(e1, batch_id=1)
    assert _totals(ivm) == _recompute(pipe)


def test_ivm_requires_batch_id(spark, tmp_path, changelog_df):
    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="source", value_col="n_tok"
    )
    pipe = _pipe(spark, tmp_path, ivm)
    with pytest.raises(ValueError, match="batch_id"):
        pipe.apply(changelog_df, batch_id=None)
