"""Round-6 ADVICE fixes, pinned.

1. inclusive_guard propagates into the attached sidecar states (IVM,
   SCD2, secondary index) — a replication feed's equal-LSN content
   changes move the maintained views exactly as they move the base.
2. changelog_between emits a vacuumed tombstone's OWN LSN (not +1), so
   a later legitimate resurrect at exactly delete_lsn+1 survives a
   strict-guard consumer.
3. complete_transactions is Debezium-faithful: only the END marker
   carries the member count; replay duplicates neither inflate nor
   block admission.
4. tags.json writes are atomic (tmp + os.replace).
5. delete_where/update_where(verify_prune=True) raises when the
   prune_range hint does not subsume the predicate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import SecondaryIndexState
from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

PAYLOAD_SCHEMA = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])


# --------------------------------------------------------------- helpers
def _src_with_dml_window(spark, tmp_path, changelog_df):
    """A source table: one normal epoch, then an update_where that moves
    CONTENT (the `source` column) at unmoved LSNs. Returns (src, v1)."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    src.merge(reduce_latest(changelog_df), batch_id=0)
    v1 = src.current_version()
    src.update_where("n_tok < 10", {"source": "redacted"})
    return src, v1


def _base_rows(pipe):
    return {
        (r.doc_id, r.source, r._lsn)
        for r in pipe.table.read().select("doc_id", "source", "_lsn").collect()
    }


# ---------------------------------------------- 1. sidecar guard parity
def test_ivm_and_index_follow_inclusive_guard(spark, tmp_path, changelog_df):
    src, v1 = _src_with_dml_window(spark, tmp_path, changelog_df)
    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="source", value_col="n_tok"
    )
    idx = SecondaryIndexState(
        spark, str(tmp_path / "idx"), index_col="source", n_buckets=4
    )
    pipe = MergePipeline(
        spark, str(tmp_path / "dst"), key="doc_id", n_buckets=4,
        payload_schema=PAYLOAD_SCHEMA, ivm_state=ivm, index_state=idx,
        inclusive_guard=True,
    )
    pipe.apply(src.changelog_between(0, v1), batch_id=0)
    pipe.apply(src.changelog_between(v1), batch_id=1)

    assert _base_rows(pipe) == {
        (r.doc_id, r.source, r._lsn)
        for r in src.read().select("doc_id", "source", "_lsn").collect()
    }
    # IVM totals == a recompute over the replicated base (would diverge
    # permanently with the old strict sidecar guard: the equal-LSN group
    # moves into 'redacted' were applied to the base but skipped here)
    recomputed = {
        r[0]: (r[1], r[2])
        for r in pipe.table.read()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("n_tok").cast("double")).alias("total"))
        .collect()
    }
    totals = {r[0]: (r[1], r[2]) for r in ivm.read_totals().collect()}
    assert set(totals) == set(recomputed)
    for g, (cnt, tot) in recomputed.items():
        assert totals[g][0] == cnt
        assert totals[g][1] == pytest.approx(tot)
    assert "redacted" in totals  # the DML window actually moved groups

    # index == the base's live (source, doc_id) projection
    idx_rows = {(r[0], r[1]) for r in idx.read_index().collect()}
    base_proj = {
        (r.source, r.doc_id)
        for r in pipe.table.read().select("source", "doc_id").collect()
    }
    assert idx_rows == base_proj
    assert idx.lookup("redacted").count() == len(
        [1 for v, _ in base_proj if v == "redacted"]
    )


def test_scd2_follows_inclusive_guard(spark, tmp_path, changelog_df):
    src, v1 = _src_with_dml_window(spark, tmp_path, changelog_df)
    scd2 = Scd2State(spark, str(tmp_path / "scd2"), PAYLOAD_SCHEMA, n_buckets=4)
    pipe = MergePipeline(
        spark, str(tmp_path / "dst"), key="doc_id", n_buckets=4,
        payload_schema=PAYLOAD_SCHEMA, scd2_state=scd2, inclusive_guard=True,
    )
    pipe.apply(src.changelog_between(0, v1), batch_id=0)
    pipe.apply(src.changelog_between(v1), batch_id=1)

    # the history's CURRENT rows mirror the base exactly — the equal-LSN
    # correction rewrote each affected open version IN PLACE
    current = {
        (r.doc_id, r.source, r.valid_from_lsn)
        for r in scd2.read_history()
        .filter(F.col("is_current"))
        .select("doc_id", "source", "valid_from_lsn")
        .collect()
    }
    base = {
        (r.doc_id, r.source, r._lsn)
        for r in pipe.table.read().select("doc_id", "source", "_lsn").collect()
    }
    assert current == base
    hist = scd2.read_history()
    # no degenerate [lsn, lsn) intervals, no duplicate open versions
    assert hist.filter(
        F.col("valid_to_lsn").isNotNull()
        & (F.col("valid_to_lsn") <= F.col("valid_from_lsn"))
    ).count() == 0
    dup_open = (
        hist.filter(F.col("is_current"))
        .groupBy("doc_id").count().filter("count > 1").count()
    )
    assert dup_open == 0


def test_index_equal_lsn_flipflop_converges(spark, tmp_path):
    """Value flips A→B→A at ONE unmoved LSN across three replication
    epochs — the epoch seq column keeps the postings ordered."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=2
    )
    row = [("d1", [1, 2], 2, "A", 100, "U")]
    sch = (
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string"
    )
    src.merge(spark.createDataFrame(row, sch), batch_id=0)
    versions = [0, src.current_version()]
    for v in ("B", "A"):
        src.update_where("doc_id = 'd1'", {"source": v})
        versions.append(src.current_version())

    idx = SecondaryIndexState(
        spark, str(tmp_path / "idx"), index_col="source", n_buckets=2
    )
    pipe = MergePipeline(
        spark, str(tmp_path / "dst"), key="doc_id", n_buckets=2,
        payload_schema=PAYLOAD_SCHEMA, index_state=idx, inclusive_guard=True,
    )
    for i in range(len(versions) - 1):
        pipe.apply(src.changelog_between(versions[i], versions[i + 1]),
                   batch_id=i)
    assert {(r[0], r[1]) for r in idx.read_index().collect()} == {("A", "d1")}
    # and compaction preserves the resolution
    idx.compact(batch_id=1000)
    assert {(r[0], r[1]) for r in idx.read_index().collect()} == {("A", "d1")}


# --------------------------------- 2. vacuumed-tombstone changefeed LSN
def test_changefeed_vacuumed_tombstone_keeps_real_lsn(spark, tmp_path):
    sch = (
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string"
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=2
    )
    src.merge(spark.createDataFrame([("d1", [1], 1, "s", 5, "U")], sch), batch_id=0)
    src.merge(spark.createDataFrame([("d1", None, None, None, 9, "D")], sch),
              batch_id=1)
    v_tomb = src.current_version()  # from-side: d1 is ALREADY a tombstone
    src.vacuum_tombstones(older_than_lsn=10)
    feed = src.changelog_between(v_tomb).collect()
    assert len(feed) == 1
    assert feed[0]["op"] == "D"
    # the tombstone's own LSN — NOT 10: a resurrect at exactly 10 must win
    assert feed[0]["lsn"] == 9

    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=2
    )
    dst.merge(spark.createDataFrame([("d1", [1], 1, "s", 5, "U")], sch), batch_id=0)
    dst.merge(reduce_latest(src.changelog_between(v_tomb)), batch_id=1)
    # strict-guard resurrect at delete_lsn + 1 — the old +1 aliasing
    # rejected exactly this event
    dst.merge(spark.createDataFrame([("d1", [7], 1, "s2", 10, "U")], sch),
              batch_id=2)
    rows = dst.read().select("doc_id", "_lsn").collect()
    assert [(r.doc_id, r._lsn) for r in rows] == [("d1", 10)]


# ------------------------------------------- 3. Debezium txn semantics
def test_txn_end_marker_only_count(spark):
    from data_hub_ejp_xml_pipeline_spark.operators.txn import (
        complete_transactions,
        incomplete_transaction_summary,
    )

    df = spark.createDataFrame(
        [
            # txn 10: count only on the END marker — must admit
            (1, "a", 10, None), (2, "b", 10, 2),
            # txn 11: END marker not arrived (count nowhere) — held back
            (3, "c", 11, None), (4, "d", 11, None),
        ],
        "lsn long, doc_id string, txn_id long, txn_n int",
    )
    kept = {r.lsn for r in complete_transactions(df).collect()}
    assert kept == {1, 2}
    rows = incomplete_transaction_summary(df).collect()
    assert [(r.txn_id, r.expected, r.present) for r in rows] == [(11, None, 2)]


def test_txn_duplicates_do_not_block(spark):
    from data_hub_ejp_xml_pipeline_spark.operators.txn import complete_transactions

    df = spark.createDataFrame(
        [
            # txn 10 complete, but event lsn=1 replayed twice
            (1, "a", 10, 2), (1, "a", 10, 2), (2, "b", 10, 2),
            # txn 11 genuinely incomplete even counting the duplicate
            (3, "c", 11, 3), (3, "c", 11, 3),
        ],
        "lsn long, doc_id string, txn_id long, txn_n int",
    )
    # distinct-identity count: duplicates neither inflate nor block
    kept = [r.lsn for r in complete_transactions(df, seq_col="lsn").collect()]
    assert sorted(kept) == [1, 1, 2]
    # without seq_col the >= admission still cannot wedge txn 10
    kept2 = {r.lsn for r in complete_transactions(df).collect()}
    assert 1 in kept2 and 2 in kept2 and 3 not in kept2


# ----------------------------------------------------- 4. atomic tags
def test_tag_write_is_atomic(spark, tmp_path, changelog_df):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=2
    )
    t.merge(reduce_latest(changelog_df), batch_id=0)
    t.tag("pin")
    assert t.tags() == {"pin": t.current_version()}
    assert not os.path.exists(t._tags_path() + ".tmp")
    t.drop_tag("pin")
    assert t.tags() == {}
    assert not os.path.exists(t._tags_path() + ".tmp")


# --------------------------------------------- 5. prune_range contract
def test_verify_prune_catches_non_subsuming_hint(spark, tmp_path, changelog_df):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD_SCHEMA, key="doc_id",
        n_buckets=2, files_per_bucket=4, stats_cols=["n_tok"],
    )
    t.merge(reduce_latest(changelog_df), batch_id=0)
    # sorted compaction on n_tok → tight, DISJOINT n_tok zone maps, so a
    # narrow hint genuinely excludes files holding matches
    t.compact_files(cluster_by="n_tok")
    lo, hi = t.read().agg(F.min("n_tok"), F.max("n_tok")).first()
    assert hi > lo
    m = t.manifest()
    assert any(
        (f.get("col_stats") or {}).get("n_tok", (lo, hi))[0] > lo
        for f in m["files"]
    ), "zone maps not disjoint — the hint below would not exclude anything"
    # a hint that provably excludes matching files: predicate matches
    # everything, range covers only the low end
    with pytest.raises(ValueError, match="does not subsume"):
        t.delete_where(
            "n_tok >= 0", prune_range=("n_tok", lo, lo), verify_prune=True
        )
    # a subsuming hint passes and the DML applies
    res = t.update_where(
        f"n_tok = {hi}", {"source": "x"},
        prune_range=("n_tok", hi, hi), verify_prune=True, batch_id=1,
    )
    assert res.applied
    assert (
        t.read().filter(f"n_tok = {hi}").select("source").distinct().collect()
        == [("x",)]
    )
