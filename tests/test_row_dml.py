"""Predicate DELETE / UPDATE (SnapshotTable.delete_where / update_where).

Pins: soft-delete tombstone semantics vs the CDC merge guard, hard-delete
erasure, matched-file-only rewrites (untouched files carry by reference),
zone-map candidate pruning, the exactly-once ledger, and assignment
guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _seed(spark, root, n=40, n_buckets=4, **create_kw):
    t = SnapshotTable.create(
        spark, root, PAYLOAD, key="doc_id", n_buckets=n_buckets, **create_kw
    )
    rows = [
        (i, "U", f"k{i:03d}", "even" if i % 2 == 0 else "odd", i)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, grp string, val long"
    )
    t.merge(df, batch_id=0)
    return t


def _state(t):
    return {
        r["doc_id"]: (r["grp"], r["val"])
        for r in t.read().select("doc_id", "grp", "val").collect()
    }


def test_soft_delete_hides_rows_and_keeps_lsn_guard(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    res = t.delete_where("grp = 'odd'")
    assert res.applied
    st = _state(t)
    assert len(st) == 20 and all(g == "even" for g, _ in st.values())
    # tombstones retain the row's _lsn: an OLDER replayed event must stay
    # dead, a NEWER event must resurrect
    old = spark.createDataFrame(
        [(0, "U", "k001", "odd", 999)],
        "lsn long, op string, doc_id string, grp string, val long",
    )
    t.merge(old, batch_id=1)
    assert "k001" not in _state(t)
    new = spark.createDataFrame(
        [(100, "U", "k001", "odd", 999)],
        "lsn long, op string, doc_id string, grp string, val long",
    )
    t.merge(new, batch_id=2)
    assert _state(t)["k001"] == ("odd", 999)


def test_hard_delete_removes_bytes_from_new_snapshot(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete_where("grp = 'odd'", hard=True)
    assert len(_state(t)) == 20
    # erased even with tombstones included — the bytes are gone
    live_and_dead = t.read(include_tombstones=True).filter("grp = 'odd'")
    assert live_and_dead.count() == 0


def test_update_where_rewrites_values_not_lsn(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    before_lsn = {
        r["doc_id"]: r["_lsn"]
        for r in t.read(include_tombstones=True).select("doc_id", "_lsn").collect()
    }
    res = t.update_where(
        "grp = 'even'", {"val": F.col("val") + 1000, "grp": "EVEN"}
    )
    assert res.applied
    st = _state(t)
    assert st["k002"] == ("EVEN", 1002)
    assert st["k003"] == ("odd", 3)  # unmatched row untouched
    after_lsn = {
        r["doc_id"]: r["_lsn"]
        for r in t.read(include_tombstones=True).select("doc_id", "_lsn").collect()
    }
    assert after_lsn == before_lsn  # merge guard unchanged


def test_hard_delete_null_predicate_is_not_a_match(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    survive a hard delete — and identically whether or not they share a
    file with a TRUE match (no file-dependent loss)."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=1
    )
    rows = [
        (1, "U", "k1", "g", None),   # NULL val: predicate NULL, same file
        (2, "U", "k2", "g", 200),    # TRUE match
        (3, "U", "k3", "g", 10),     # FALSE
    ]
    t.merge(
        spark.createDataFrame(
            rows, "lsn long, op string, doc_id string, grp string, val long"
        ),
        batch_id=0,
    )
    res = t.delete_where("val >= 100", hard=True)
    assert res.applied
    assert set(_state(t)) == {"k1", "k3"}


def test_update_where_assignments_read_the_pre_image(spark, tmp_path):
    """SQL UPDATE semantics: every assignment AND the predicate evaluate
    against the pre-update row — an assignment that rewrites a column the
    predicate (or another assignment) reads must not feed back."""
    t = _seed(spark, str(tmp_path / "t"), n=6)
    res = t.update_where(
        "grp = 'odd'",
        {"grp": "renamed", "val": F.col("val") + F.length("grp")},
    )
    assert res.applied
    st = _state(t)
    # k003: odd, val 3 -> grp 'renamed', val 3 + len('odd') = 6
    # (sequential evaluation would give 3 + len('renamed') = 10, or leave
    # val untouched because the mutated predicate no longer matches)
    assert st["k003"] == ("renamed", 6)
    assert st["k002"] == ("even", 2)


def test_update_where_guards_assignments(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=4)
    with pytest.raises(ValueError, match="key/internal"):
        t.update_where("val > 0", {"doc_id": "x"})
    with pytest.raises(ValueError, match="key/internal"):
        t.update_where("val > 0", {"_lsn": 0})
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where("val > 0", {"nope": 1})


def test_matched_files_only_rewrite(spark, tmp_path):
    """Files that hold no match must carry forward BY REFERENCE (same
    path in the new manifest), not be rewritten."""
    t = _seed(spark, str(tmp_path / "t"), n=80, n_buckets=8)
    before = {f["path"] for f in t.manifest()["files"]}
    # one specific key matches -> at most that key's file(s) rewritten
    t.delete_where("doc_id = 'k007'")
    after = {f["path"] for f in t.manifest()["files"]}
    carried = before & after
    assert carried, "expected untouched files to carry forward by reference"
    assert len(before - after) <= 2  # only the matching file(s) replaced
    assert "k007" not in _state(t)
    assert len(_state(t)) == 79


def test_no_match_is_a_noop(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=8)
    v = t.current_version()
    res = t.delete_where("val > 10000")
    assert not res.applied
    assert t.current_version() == v


def test_ledgered_replay_noops(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=8)
    r1 = t.delete_where("val >= 4", batch_id=77)
    assert r1.applied and len(_state(t)) == 4
    # re-insert a row OUT of band so a buggy replay would visibly re-delete
    t.merge(
        spark.createDataFrame(
            [(200, "U", "k005", "odd", 5)],
            "lsn long, op string, doc_id string, grp string, val long",
        ),
        batch_id=78,
    )
    assert len(_state(t)) == 5
    r2 = t.delete_where("val >= 4", batch_id=77)  # replay
    assert not r2.applied
    assert len(_state(t)) == 5


def test_prune_range_limits_probe_candidates(spark, tmp_path):
    """With zone maps on `val` and a sorted layout, prune_range must cut
    the candidate list before the probe scan."""
    t = _seed(spark, str(tmp_path / "t"), n=80, n_buckets=4, stats_cols=["val"])
    t.compact_files(cluster_by="val")  # tighten the val zone maps
    m = t.manifest()
    cand = t._range_entries("val", 70, None, m)
    assert 0 < len(cand) < len(m["files"])
    res = t.delete_where(
        "val >= 70", prune_range=("val", 70, None)
    )
    assert res.applied
    st = _state(t)
    assert len(st) == 70 and max(v for _, v in st.values()) == 69


def test_dml_then_changefeed_stays_consistent(spark, tmp_path):
    """A downstream replica fed by changelog_between must converge across
    a delete_where + update_where: DML changes content without moving the
    LSN, so the feed emits flag/content diffs and the consumer applies
    them with the inclusive merge guard (exactly-once via batch_id)."""
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest

    t = _seed(spark, str(tmp_path / "t"), n=20)
    v0 = t.current_version()
    t.delete_where("val >= 15")
    t.update_where("val < 5", {"grp": "small"})
    feed = t.changelog_between(v0, t.current_version())
    ups = {r["doc_id"] for r in feed.filter("op = 'U'").collect()}
    dels = {r["doc_id"] for r in feed.filter("op = 'D'").collect()}
    assert dels == {f"k{i:03d}" for i in range(15, 20)}
    assert {f"k{i:03d}" for i in range(5)} <= ups

    # full replication round-trip: bootstrap a replica at v0, then apply
    # the DML window's feed with the inclusive guard
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), PAYLOAD, key="doc_id", n_buckets=2
    )
    dst.merge(
        reduce_latest(t.changelog_between(0, v0)), batch_id=0
    )
    dst.merge(
        reduce_latest(feed), batch_id=1, inclusive_guard=True
    )
    assert _state(dst) == _state(t)
    # a strict-guard apply of the same feed would have missed every
    # equal-LSN change — pin the failure mode the flag exists for
    dst2 = SnapshotTable.create(
        spark, str(tmp_path / "dst2"), PAYLOAD, key="doc_id", n_buckets=2
    )
    dst2.merge(reduce_latest(t.changelog_between(0, v0)), batch_id=0)
    dst2.merge(reduce_latest(feed), batch_id=1)  # strict: no-ops
    assert _state(dst2) != _state(t)
