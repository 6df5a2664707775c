"""SnapshotTable.verify (fsck): every manifest/disk/footer invariant a
reader relies on is checked; corruptions are REPORTED (never mutated),
and a healthy table — including after DML, compaction and vacuum — comes
back clean, deep scan included."""

from __future__ import annotations

import json
import os
import shutil

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import PAYLOAD_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable


def _build(spark, tmp_path, changelog_pdf):
    t = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), PAYLOAD_SCHEMA, n_buckets=4
    )
    t.merge(reduce_latest(spark_changelog_from_pandas(spark, changelog_pdf)), batch_id=0)
    return t


def test_fsck_clean_table_passes_deep(spark, tmp_path, changelog_pdf):
    t = _build(spark, tmp_path, changelog_pdf)
    t.update_where("n_tok < 5", {"source": "x"})
    t.delete_where("n_tok >= 95")
    t.compact_files(max_files_per_bucket=1)
    out = t.verify(deep=True)
    assert out["ok"], out["errors"]
    assert out["files_checked"] == len(t.manifest()["files"])
    assert out["rows_scanned"] == sum(f["rows"] for f in t.manifest()["files"])


def test_fsck_detects_missing_and_truncated_files(spark, tmp_path, changelog_pdf):
    t = _build(spark, tmp_path, changelog_pdf)
    files = t.manifest()["files"]
    victim = os.path.join(t.root, files[0]["path"])
    os.remove(victim)
    out = t.verify()
    assert not out["ok"]
    assert any("missing data file" in e for e in out["errors"])


def test_fsck_detects_row_count_drift(spark, tmp_path, changelog_pdf):
    t = _build(spark, tmp_path, changelog_pdf)
    # corrupt the manifest's recorded row count for one file
    m_path = os.path.join(t.root, "meta", f"v{t.current_version():08d}.json")
    m = json.load(open(m_path))
    m["files"][0]["rows"] += 7
    json.dump(m, open(m_path, "w"))
    out = SnapshotTable(spark, t.root).verify()
    assert not out["ok"]
    assert any("row-count drift" in e for e in out["errors"])


def test_fsck_detects_misbucketed_rows_deep(spark, tmp_path, changelog_pdf):
    t = _build(spark, tmp_path, changelog_pdf)
    # move a data file into the WRONG bucket dir and patch the manifest
    # path (shallow checks pass; only the deep scan can catch it)
    m_path = os.path.join(t.root, "meta", f"v{t.current_version():08d}.json")
    m = json.load(open(m_path))
    entry = m["files"][0]
    src = os.path.join(t.root, entry["path"])
    wrong_bucket = (entry["bucket"] + 1) % 4
    dst_rel = entry["path"].replace(
        f"_bucket={entry['bucket']}", f"_bucket={wrong_bucket}"
    )
    dst = os.path.join(t.root, dst_rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.move(src, dst)
    entry["path"] = dst_rel
    entry["bucket"] = wrong_bucket
    json.dump(m, open(m_path, "w"))
    t2 = SnapshotTable(spark, t.root)
    assert t2.verify()["ok"]  # shallow cannot see it
    deep = t2.verify(deep=True)
    assert not deep["ok"]
    assert any("misbucketed" in e for e in deep["errors"])


def test_fsck_detects_ledger_inconsistency(spark, tmp_path, changelog_pdf):
    t = _build(spark, tmp_path, changelog_pdf)
    m_path = os.path.join(t.root, "meta", f"v{t.current_version():08d}.json")
    m = json.load(open(m_path))
    m["ledger_evicted_below"] = 5  # ledger still holds id 0
    json.dump(m, open(m_path, "w"))
    out = SnapshotTable(spark, t.root).verify()
    assert not out["ok"]
    assert any("eviction watermark" in e for e in out["errors"])
