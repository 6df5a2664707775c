"""CDC-out changefeed (SnapshotTable.changelog_between): replaying the
per-version feeds through a second, independent pipeline must replicate
the source table exactly — live rows AND their LSNs — across inserts,
updates, deletes (tombstone LSN carried), vacuumed deletes (synthetic
LSN), and idempotent re-application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

PAYLOAD_SCHEMA = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])


def _rows(table):
    return {
        (r.doc_id, r.n_tok, r.source, r._lsn)
        for r in table.read().select("doc_id", "n_tok", "source", "_lsn").collect()
    }


def _replicate(spark, src, dst, versions):
    """Apply each consecutive version-pair's feed to dst."""
    for i in range(len(versions) - 1):
        feed = src.changelog_between(versions[i], versions[i + 1])
        dst.merge(reduce_latest(feed), batch_id=i)


def test_changefeed_replicates_table(spark, tmp_path, changelog_df):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    lo, hi = changelog_df.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 3 + 1
    versions = [src.current_version()]
    for i in range(3):
        batch = changelog_df.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        src.merge(reduce_latest(batch), batch_id=i)
        versions.append(src.current_version())

    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=8
    )  # different bucket count: the feed is rows, not files
    _replicate(spark, src, dst, versions)
    assert _rows(dst) == _rows(src) and _rows(dst)

    # re-applying the last feed (fresh batch_id, so the ledger does not
    # swallow it) is a no-op: every row loses the lsn > _lsn merge guard
    feed = src.changelog_between(versions[-2], versions[-1])
    dst.merge(reduce_latest(feed), batch_id=99)
    assert _rows(dst) == _rows(src)


def test_changefeed_delete_carries_tombstone_lsn(spark, tmp_path, changelog_df):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    src.merge(reduce_latest(changelog_df), batch_id=0)
    v1 = src.current_version()
    doc = src.read().select("doc_id").orderBy("doc_id").first()[0]
    hi = changelog_df.agg(F.max("lsn")).first()[0]
    delete = spark.createDataFrame(
        [(doc, None, None, None, hi + 50, "D")],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string",
    )
    src.merge(reduce_latest(delete), batch_id=1)
    feed = src.changelog_between(v1).filter(F.col("doc_id") == doc).collect()
    assert len(feed) == 1
    assert feed[0]["op"] == "D" and feed[0]["lsn"] == hi + 50

    # compaction-only version transitions emit an EMPTY feed (rewritten
    # files cancel row-by-row on equal LSNs)
    v2 = src.current_version()
    res = src.compact_files(max_files_per_bucket=1)
    if res.applied:
        assert src.changelog_between(v2).count() == 0


def test_changefeed_vacuumed_delete_synthesizes_lsn(spark, tmp_path, changelog_df):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    src.merge(reduce_latest(changelog_df), batch_id=0)
    v1 = src.current_version()
    doc, old_lsn = (
        src.read().select("doc_id", "_lsn").orderBy("doc_id").first()
    )
    hi = changelog_df.agg(F.max("lsn")).first()[0]
    delete = spark.createDataFrame(
        [(doc, None, None, None, hi + 50, "D")],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string",
    )
    src.merge(reduce_latest(delete), batch_id=1)
    src.vacuum_tombstones(older_than_lsn=hi + 50)
    feed = src.changelog_between(v1).filter(F.col("doc_id") == doc).collect()
    assert len(feed) == 1
    assert feed[0]["op"] == "D"
    # synthetic lsn: beats the consumer's live row, never a later resurrect
    assert feed[0]["lsn"] == old_lsn + 1

    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    dst.merge(reduce_latest(changelog_df), batch_id=0)
    dst.merge(reduce_latest(src.changelog_between(v1)), batch_id=1)
    assert _rows(dst) == _rows(src)


def test_replication_pipeline_applies_dml_feeds(spark, tmp_path, changelog_df):
    """MergePipeline(inclusive_guard=True) is the replication consumer:
    a feed window carrying row-DML changes (content moved, LSN did not)
    must land; the strict default must not."""
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    src.merge(reduce_latest(changelog_df), batch_id=0)
    v1 = src.current_version()
    src.update_where("n_tok < 10", {"source": "redacted"})

    def replica(name, inclusive):
        pipe = MergePipeline(
            spark, str(tmp_path / name), key="doc_id", n_buckets=4,
            payload_schema=PAYLOAD_SCHEMA, inclusive_guard=inclusive,
        )
        pipe.apply(src.changelog_between(0, v1), batch_id=0)
        pipe.apply(src.changelog_between(v1), batch_id=1)
        return {
            (r.doc_id, r.source, r._lsn)
            for r in pipe.table.read().select("doc_id", "source", "_lsn").collect()
        }

    src_rows = {
        (r.doc_id, r.source, r._lsn)
        for r in src.read().select("doc_id", "source", "_lsn").collect()
    }
    assert replica("dst_incl", True) == src_rows
    assert replica("dst_strict", False) != src_rows


def test_subscribe_cursor_loop(spark, tmp_path, changelog_df):
    """subscribe() (round 6): the cursor-style consumer loop — bootstrap
    streams the full state, each poll returns exactly the delta since the
    stored cursor (row-level DML included), an unadvanced cursor returns
    an empty frame, and a foreign/ahead cursor raises."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=8
    )
    lo, hi = changelog_df.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    src.merge(reduce_latest(changelog_df.filter(F.col("lsn") <= mid)), batch_id=0)

    # bootstrap: cursor None -> full current state as inserts
    feed, cur = src.subscribe()
    dst.merge(reduce_latest(feed), batch_id=0, inclusive_guard=True)
    assert _rows(dst) == _rows(src)
    assert cur == src.current_version()

    # quiet poll: nothing new, schema intact, cursor unmoved
    empty, cur2 = src.subscribe(cur)
    assert cur2 == cur and empty.count() == 0
    assert set(empty.columns) >= {"doc_id", "op", "lsn"}

    # advance the source: a merge AND row-level DML at unmoved LSNs
    src.merge(reduce_latest(changelog_df.filter(F.col("lsn") > mid)), batch_id=1)
    victim = src.read().orderBy("doc_id").first().doc_id
    src.update_where(f"doc_id = '{victim}'", {"source": "redacted"})
    feed, cur3 = src.subscribe(cur)
    assert cur3 > cur
    dst.merge(reduce_latest(feed), batch_id=1, inclusive_guard=True)
    assert _rows(dst) == _rows(src)
    assert {
        r.source for r in dst.read().filter(F.col("doc_id") == victim).collect()
    } == {"redacted"}

    # a cursor from the future (wrong table / rolled-back clone) raises
    with pytest.raises(ValueError, match="ahead"):
        src.subscribe(cur3 + 10)
