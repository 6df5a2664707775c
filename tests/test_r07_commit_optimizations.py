"""Round-7 optimization pins: commit-path batch cache + pre-commit hook.

1. ``_commit`` persists ``updates`` across its two consumers when no
   ``stats_df`` is given — the upstream plan (reduce/decode/join) must
   execute ONCE per commit, not twice (stats pre-pass + write).
2. ``merge(pre_commit_hook=...)`` — the sidecar-overlap barrier: runs
   after the data-file write, before the manifest commit; a raise aborts
   the commit (no new version; the written files are sweepable orphans).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _batch(spark, n=100, lsn0=1):
    return spark.range(lsn0, lsn0 + n).select(
        F.col("id").alias("lsn"),
        F.lit("U").alias("op"),
        F.concat(F.lit("d-"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias(
            "doc_id"
        ),
        (F.col("id") * 2).alias("v"),
    )


def test_updates_plan_executes_once_per_commit(spark, tmp_path):
    """Without stats_df the merge must not run the batch plan twice."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), PAYLOAD, n_buckets=4)
    acc = spark.sparkContext.accumulator(0)

    def counted(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    raw = _batch(spark).repartition(4)
    batch = raw.mapInPandas(counted, schema=raw.schema)
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    reduced = reduce_latest(batch)
    t.merge(reduced, batch_id=0)
    # each input row crosses the python boundary exactly once: the first
    # consumer materializes the commit's cache, the second reads it
    assert acc.value == 100
    # the cache is released after the commit
    assert not (
        reduced.storageLevel.useMemory or reduced.storageLevel.useDisk
    )
    got = {(r["doc_id"], r["v"]) for r in t.read().collect()}
    assert len(got) == 20


def test_caller_cached_batch_is_left_alone(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), PAYLOAD, n_buckets=4)
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    reduced = reduce_latest(_batch(spark)).persist()
    try:
        t.merge(reduced, batch_id=0)
        # still cached: the commit must not unpersist a caller-owned cache
        assert reduced.storageLevel.useMemory or reduced.storageLevel.useDisk
    finally:
        reduced.unpersist()
    assert t.read().count() == 20


def test_pre_commit_hook_runs_before_pointer_swap(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), PAYLOAD, n_buckets=4)
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    seen: dict = {}

    def hook():
        # at hook time the data files are written but the pointer is not
        seen["version_at_hook"] = t.current_version()

    res = t.merge(reduce_latest(_batch(spark)), batch_id=0, pre_commit_hook=hook)
    assert seen["version_at_hook"] == 0
    assert res.applied and t.current_version() == 1


def test_pre_commit_hook_raise_aborts_commit(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), PAYLOAD, n_buckets=4)
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    t.merge(reduce_latest(_batch(spark, n=50)), batch_id=0)
    v1 = t.current_version()
    state_before = sorted(
        (r["doc_id"], r["v"], r["_lsn"]) for r in t.read().collect()
    )

    def boom():
        raise RuntimeError("sidecar failed")

    with pytest.raises(RuntimeError, match="sidecar failed"):
        t.merge(
            reduce_latest(_batch(spark, n=50, lsn0=1000)),
            batch_id=1,
            pre_commit_hook=boom,
        )
    # no new version, state unchanged, replay of the SAME epoch applies
    assert t.current_version() == v1
    assert (
        sorted((r["doc_id"], r["v"], r["_lsn"]) for r in t.read().collect())
        == state_before
    )
    res = t.merge(reduce_latest(_batch(spark, n=50, lsn0=1000)), batch_id=1)
    assert res.applied
    # the aborted attempt's files are unreferenced orphans expire sweeps
    swept = t.expire_snapshots(keep_last=1)
    assert swept["removed_files"] >= 1
    assert t.verify(deep=True)["ok"]


def test_hook_not_called_on_replay_or_empty(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), PAYLOAD, n_buckets=4)
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    t.merge(reduce_latest(_batch(spark)), batch_id=0)
    calls = []
    # replayed batch_id: early no-op, hook must not fire
    res = t.merge(
        reduce_latest(_batch(spark)), batch_id=0,
        pre_commit_hook=lambda: calls.append("replay"),
    )
    assert not res.applied and calls == []
    # empty batch: early no-op, hook must not fire
    empty = reduce_latest(_batch(spark).filter(F.lit(False)))
    res = t.merge(empty, batch_id=1, pre_commit_hook=lambda: calls.append("empty"))
    assert not res.applied and calls == []


def test_sidecar_pipeline_overlap_equivalence(spark, tmp_path):
    """MergePipeline with scd2+ivm sidecars (now overlapped on a side
    thread) produces the same base/history/totals as the r6 serial
    wiring did — pinned against an independent in-query derivation."""
    from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    root = str(tmp_path / "p")
    scd2 = Scd2State(spark, root + "/scd2", payload_schema=payload)
    ivm = IncrementalAggState(spark, root + "/ivm", group_col="grp", value_col="v")
    pipe = MergePipeline(
        spark, root + "/tbl", n_buckets=4, payload_schema=payload,
        scd2_state=scd2, ivm_state=ivm,
    )
    for i in range(3):
        batch = spark.range(i * 100 + 1, (i + 1) * 100 + 1).select(
            F.col("id").alias("lsn"),
            F.when(F.pmod(F.col("id"), F.lit(17)) == 0, F.lit("D"))
            .otherwise(F.lit("U")).alias("op"),
            F.concat(F.lit("d-"), F.pmod(F.col("id"), F.lit(30)).cast("string"))
            .alias("doc_id"),
            F.pmod(F.col("id"), F.lit(3)).cast("string").alias("grp"),
            (F.col("id") * 3).alias("v"),
        )
        pipe.apply(batch, batch_id=i)
    chk = pipe.verify(deep=True)
    assert chk["ok"], chk
    assert chk["consistency"]["ivm_mismatches"] == 0
    assert chk["consistency"]["scd2_mismatches"] == 0
    # replays after the fact still no-op everywhere
    v_base = pipe.table.current_version()
    v_hist = scd2.history.current_version()
    pipe.apply(
        spark.range(1, 101).select(
            F.col("id").alias("lsn"), F.lit("U").alias("op"),
            F.lit("d-1").alias("doc_id"), F.lit("0").alias("grp"),
            F.col("id").alias("v"),
        ),
        batch_id=0,
    )
    assert pipe.table.current_version() == v_base
    assert scd2.history.current_version() == v_hist


def test_scd2_equal_lsn_delete_replication(spark, tmp_path, changelog_df):
    """ADVICE(high) r7 fix: a replication feed's equal-LSN DELETE winner
    (the source ran delete_where — the tombstone keeps the row's LSN)
    must close the SCD2 open version in place; previously the base
    tombstoned the row while the history's open version stayed
    is_current forever."""
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
    from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    payload = T.StructType(
        [f for f in TARGET_SCHEMA.fields if f.name != "_lsn"]
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), payload, key="doc_id", n_buckets=4
    )
    src.merge(reduce_latest(changelog_df), batch_id=0)
    v1 = src.current_version()
    # row-level DELETE on the source: tombstones keep their _lsn, so the
    # changefeed renders them as op='D' at the UNCHANGED LSN
    src.delete_where("n_tok < 10")

    scd2 = Scd2State(spark, str(tmp_path / "scd2"), payload, n_buckets=4)
    pipe = MergePipeline(
        spark, str(tmp_path / "dst"), key="doc_id", n_buckets=4,
        payload_schema=payload, scd2_state=scd2, inclusive_guard=True,
    )
    pipe.apply(src.changelog_between(0, v1), batch_id=0)
    feed2 = src.changelog_between(v1)
    # the scenario must actually occur: equal-LSN deletes in the feed
    assert feed2.filter(F.col("op") == "D").count() > 0
    pipe.apply(feed2, batch_id=1)

    # history's open versions mirror the base's live rows exactly
    current = {
        (r.doc_id, r.valid_from_lsn)
        for r in scd2.read_current().select("doc_id", "valid_from_lsn").collect()
    }
    base = {
        (r.doc_id, r._lsn)
        for r in pipe.table.read().select("doc_id", "_lsn").collect()
    }
    assert current == base
    # every deleted key's version is rewritten closed at its own LSN
    # (deliberately-empty [lsn, lsn) interval: the final state AT that
    # LSN excludes the row) — none left open
    deleted_keys = {
        r.doc_id for r in feed2.filter(F.col("op") == "D").collect()
    }
    closed = scd2.read_history().filter(
        ~F.col("is_current")
        & (F.col("valid_to_lsn") == F.col("valid_from_lsn"))
    )
    assert {r.doc_id for r in closed.collect()} >= deleted_keys
    # cross-state fsck agrees
    chk = pipe.verify(deep=True)
    assert chk["ok"], chk
    # replaying both feed windows no-ops everywhere (ledger)
    v_hist = scd2.history.current_version()
    pipe.apply(src.changelog_between(0, v1), batch_id=0)
    pipe.apply(src.changelog_between(v1), batch_id=1)
    assert scd2.history.current_version() == v_hist
