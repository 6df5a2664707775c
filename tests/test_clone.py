"""SnapshotTable.clone: a consistent snapshot exported as an independent
table — hardlinked data, collapsed history, carried ledger."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import PAYLOAD_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable


def _rows(t):
    return {
        (r.doc_id, r.n_tok, r.source, r._lsn)
        for r in t.read().select("doc_id", "n_tok", "source", "_lsn").collect()
    }


def _build(spark, tmp_path, changelog_pdf, n=2):
    t = SnapshotTable.create(
        spark, str(tmp_path / "src"), PAYLOAD_SCHEMA, n_buckets=4
    )
    step = len(changelog_pdf) // n + 1
    for i in range(n):
        t.merge(
            reduce_latest(
                spark_changelog_from_pandas(
                    spark, changelog_pdf.iloc[i * step : (i + 1) * step]
                )
            ),
            batch_id=i,
        )
    return t


def test_clone_equals_source_and_passes_fsck(spark, tmp_path, changelog_pdf):
    src = _build(spark, tmp_path, changelog_pdf)
    dst = src.clone(str(tmp_path / "dst"))
    assert _rows(dst) == _rows(src)
    out = dst.verify(deep=True)
    assert out["ok"], out["errors"]


def test_clone_is_independent_both_ways(spark, tmp_path, changelog_pdf):
    src = _build(spark, tmp_path, changelog_pdf)
    before = _rows(src)
    dst = src.clone(str(tmp_path / "dst"))
    # mutate the clone: source untouched (hard links share inodes, but
    # every rewrite lands in NEW files)
    dst.delete_where("n_tok >= 0")
    assert _rows(dst) == set() and _rows(src) == before
    # expire/vacuum the source: the clone still reads (its links keep the
    # inodes alive even after the source unlinks them)
    src.update_where("n_tok < 5", {"source": "x"})
    src.expire_snapshots(keep_last=1)
    src.vacuum_tombstones(older_than_lsn=10**9)
    src.expire_snapshots(keep_last=1)
    dst2 = SnapshotTable(spark, str(tmp_path / "dst"))
    assert dst2.read(include_tombstones=True).count() > 0


def test_clone_carries_ledger_for_replay(spark, tmp_path, changelog_pdf):
    src = _build(spark, tmp_path, changelog_pdf)
    dst = src.clone(str(tmp_path / "dst"))
    replay = reduce_latest(
        spark_changelog_from_pandas(spark, changelog_pdf.iloc[:100])
    )
    res = dst.merge(replay, batch_id=0)  # epoch 0 already in the ledger
    assert res.applied is False


def test_clone_time_travel_and_refusals(spark, tmp_path, changelog_pdf):
    src = _build(spark, tmp_path, changelog_pdf)
    v1 = src.current_version() - 1  # after the first merge
    old = src.clone(str(tmp_path / "old"), version=v1)
    assert _rows(old) == {
        (r.doc_id, r.n_tok, r.source, r._lsn)
        for r in src.read(version=v1)
        .select("doc_id", "n_tok", "source", "_lsn")
        .collect()
    }
    with pytest.raises(ValueError, match="already holds a table"):
        src.clone(str(tmp_path / "old"))
