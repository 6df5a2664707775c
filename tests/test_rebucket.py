"""Bucket-count evolution (``rebucket``) and zone-map opt-in on a live
table (``set_stats_cols``): the two knobs that let a table created at
one scale keep its pruning story at 100× the data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable
from tests.test_zone_maps import PAYLOAD, _changelog


def test_rebucket_preserves_content_and_serving(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=4
    )
    t.merge(_changelog(spark, 2_000), batch_id=0)
    deletes = _changelog(spark, 50, lsn0=10_001).withColumn("op", F.lit("D"))
    t.merge(deletes, batch_id=1)
    before = {tuple(r) for r in t.read().collect()}
    tomb_before = t.read(include_tombstones=True).count()

    res = t.rebucket(16)
    assert res.applied and t.manifest()["n_buckets"] == 16
    assert {f["bucket"] for f in t.manifest()["files"]} <= set(range(16))
    assert {tuple(r) for r in t.read().collect()} == before
    # tombstones survive the rewrite
    assert t.read(include_tombstones=True).count() == tomb_before

    # point lookups route through the NEW bucket function
    assert t.lookup(["doc-00000123"]).count() == 1
    entries = t._lookup_entries(["doc-00000123"], t.manifest())
    assert len(entries) < len(t.manifest()["files"])

    # ledger carried: replaying a pre-rebucket epoch no-ops
    assert t.merge(_changelog(spark, 2_000), batch_id=0).applied is False
    # and NEW epochs merge correctly under the new fan-out
    t.merge(_changelog(spark, 100, lsn0=20_001).withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("-new"))), batch_id=2)
    assert t.lookup(["doc-00000001-new"]).count() == 1


def test_rebucket_noop_and_validation(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=4
    )
    t.merge(_changelog(spark, 200), batch_id=0)
    assert t.rebucket(4).applied is False
    with pytest.raises(ValueError, match="n_buckets"):
        t.rebucket(0)


def test_set_stats_cols_takes_effect_on_next_rewrite(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=2,
        files_per_bucket=4,
    )
    t.merge(_changelog(spark, 1_000), batch_id=0)
    m = t.manifest()
    assert all("col_stats" not in f for f in m["files"])

    assert t.set_stats_cols(["n_tok"]).applied
    assert t.set_stats_cols(["n_tok"]).applied is False  # idempotent
    # old files unpruned-but-correct; the compaction back-fills stats
    t.compact_files(max_files_per_bucket=1)
    t.merge(_changelog(spark, 200, lsn0=5_001), batch_id=1)
    t.compact_files()
    m2 = t.manifest()
    assert all(
        "col_stats" in f and "n_tok" in f["col_stats"] for f in m2["files"]
    )
    want = t.read().filter(F.col("n_tok") <= 100).count()
    assert t.read_range("n_tok", None, 100).count() == want


def test_tags_pin_snapshots_through_expiry(spark, tmp_path):
    """Iceberg tag analog: a named snapshot survives expire_snapshots at
    any keep_last, and reads back byte-identical; dropping the tag
    releases it."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=2
    )
    t.merge(_changelog(spark, 300), batch_id=0)
    want = {tuple(r) for r in t.read().collect()}
    v = t.tag("baseline")
    assert t.tags() == {"baseline": v}

    for i in range(1, 5):
        t.merge(_changelog(spark, 100, lsn0=10_000 * i), batch_id=i)
    t.expire_snapshots(keep_last=1)

    # the tagged version still reads exactly
    assert {tuple(r) for r in t.read_tag("baseline").collect()} == want
    # untagged old versions are gone
    with pytest.raises(FileNotFoundError):
        t.manifest(v + 1)

    t.drop_tag("baseline")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.manifest(v)
    with pytest.raises(KeyError):
        t.read_tag("baseline")
    with pytest.raises(FileNotFoundError):
        t.tag("bad", version=v)  # can't tag an expired version
