"""Zip-of-XML source: golden-output parse tests (mirroring the reference's
ejp_zip_test.py / ejp_person_xml_test.py style), quarantine branch, and
end-to-end into the CDC merge pipeline."""

from __future__ import annotations

import io
import json
import os
import time
import zipfile

import pytest

from data_hub_ejp_xml_pipeline_spark.functions.json_clean import remove_empty_keys
from data_hub_ejp_xml_pipeline_spark.sources.xml_zip import (
    entities_to_changelog,
    parse_zip_bytes,
    quarantine,
    read_zip_entities,
)

PERSONS_XML = b"""<persons>
  <person>
    <person-id>p1</person-id>
    <first-nm>Ada</first-nm><last-nm>Lovelace &amp; Co</last-nm>
    <email>ada@example.org</email>
    <active-ind>1</active-ind>
    <profile-modify-date>2020-01-02 03:04:05</profile-modify-date>
    <person-tags><tag>editor</tag><tag>reviewer</tag></person-tags>
    <addresses><address><country>UK</country><city>London</city></address></addresses>
  </person>
  <person>
    <first-nm>NoId</first-nm><last-nm>Person</last-nm>
    <active-ind>0</active-ind>
  </person>
</persons>"""

MANUSCRIPT_XML = b"""<xml>
  <manuscript>
    <manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>
    <country>UK</country>
    <modify-date>2020-02-02 00:00:00</modify-date>
    <history>
      <stage><stage-nm>Submission</stage-nm><start-date>2020-01-01 00:00:00</start-date></stage>
      <stage><stage-nm>Review</stage-nm><start-date>2020-01-05 00:00:00</start-date></stage>
    </history>
    <keywords><keyword>spark</keyword></keywords>
  </manuscript>
</xml>"""

GO_XML = b"""<go>
  <create-date>2020-03-03 00:00:00</create-date>
  <files><file-nm>people.xml</file-nm><file-nm>ms.xml</file-nm><file-nm>skipme.xml</file-nm></files>
</go>"""


def make_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_parse_zip_golden():
    z = make_zip(
        {
            "go.xml": GO_XML,
            "people.xml": PERSONS_XML,
            "ms.xml": MANUSCRIPT_XML,
            "skipme.xml": b"<persons/>",
            "not-listed.xml": b"<persons/>",  # not in manifest → ignored
        }
    )
    rows = list(parse_zip_bytes(z, "batch.zip", exclusion_pattern=r"skip.*"))
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["entity_type"], []).append(r)

    persons = by_type["person"]
    assert persons[0]["doc_id"] == "p1"
    p0 = json.loads(persons[0]["payload"])
    assert p0["last_name"] == "Lovelace & Co"  # entity decoded
    assert p0["is_active"] is True
    assert p0["tags"] == ["editor", "reviewer"]
    assert persons[0]["modified_timestamp"] == "2020-01-02 03:04:05"
    # synthetic id + create-date fallback for the id-less person
    assert persons[1]["doc_id"] == "generated-batch.zip/people.xml-1"
    assert persons[1]["modified_timestamp"] == "2020-03-03 00:00:00"
    p1 = json.loads(persons[1]["payload"])
    assert p1["is_active"] is False  # False survives null-stripping
    assert "email" not in p1  # '' stripped
    assert "addresses" not in p1  # [] stripped

    ms = by_type["manuscript"][0]
    assert ms["doc_id"] == "12345"  # regex-extracted eLife number
    ver = by_type["manuscript_version"][0]
    assert ver["doc_id"] == "12345/2020-01-01 00:00:00"
    vp = json.loads(ver["payload"])
    assert [s["stage_name"] for s in vp["stages"]] == ["Submission", "Review"]

    # exclusion + manifest filtering: skipme and not-listed produce nothing
    assert not any(r["xml_file"] in ("skipme.xml", "not-listed.xml") for r in rows)


def test_parse_zip_quarantine_paths():
    z = make_zip({"go.xml": GO_XML, "people.xml": b"<persons><broken", "ms.xml": b"<weird/>"})
    rows = list(parse_zip_bytes(z, "bad.zip"))
    errors = [r for r in rows if r["entity_type"] == "error"]
    assert len(errors) == 2
    kinds = {e["xml_file"]: e["error"] for e in errors}
    assert "xml parse" in kinds["people.xml"]
    assert "unknown root tag" in kinds["ms.xml"]
    # bad zip bytes entirely
    assert "bad zip" in next(iter(parse_zip_bytes(b"nope", "x.zip")))["error"]


def test_manuscript_id_fallbacks():
    no_number = MANUSCRIPT_XML.replace(
        b"<manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>", b""
    )
    z = make_zip({"fallback-stem.xml": no_number})
    rows = [r for r in parse_zip_bytes(z, "z.zip") if r["entity_type"] == "manuscript"]
    assert rows[0]["doc_id"] == "fallback-stem"


def test_remove_empty_keys_semantics():
    # exact reference semantics (transform_json.py:1-15): falsy non-bools
    # incl. 0 are dropped; bools kept; list ELEMENTS are never dropped;
    # containers that only empty out during recursion are kept.
    src = {"a": None, "b": "", "c": [], "d": {}, "e": False, "f": 0, "g": [None, "", "x"]}
    assert remove_empty_keys(src) == {"e": False, "g": [None, "", "x"]}
    assert remove_empty_keys({"a": {"b": None}, "k": 1}) == {"a": {}, "k": 1}


def test_spark_end_to_end_zip_to_table(spark, tmp_path):
    """binaryFile → mapInPandas parse → changelog → reduce+merge → final
    state; replayed (re-listed) zips regenerate identical LSNs/doc_ids."""
    d = tmp_path / "zips"
    d.mkdir()
    now = time.time() - 100
    for i in range(3):
        z = make_zip({"go.xml": GO_XML, "people.xml": PERSONS_XML, "ms.xml": MANUSCRIPT_XML})
        p = d / f"batch-{i}.zip"
        p.write_bytes(z)
        os.utime(p, (now + i, now + i))

    entities = read_zip_entities(spark, str(d))
    assert quarantine(entities).count() == 0
    changelog = entities_to_changelog(entities)
    rows = changelog.collect()
    assert len(rows) == 3 * 4  # 2 persons + manuscript + version per zip

    # deterministic on replay
    again = entities_to_changelog(read_zip_entities(spark, str(d))).collect()
    assert sorted(r.lsn for r in rows) == sorted(r.lsn for r in again)
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}

    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("modified_timestamp", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), payload, n_buckets=4)
    table.merge(reduce_latest(changelog), batch_id=0)
    final = table.read()
    # synthetic person ids are file-scoped (one per zip, as in the
    # reference) → 3 generated + p1 + manuscript + version = 6
    assert final.count() == 6
    lineage = table.lineage()
    assert {r["source_file"].split("/")[0] for r in lineage} == {
        "batch-0.zip", "batch-1.zip", "batch-2.zip"
    }


def test_streaming_zip_source(spark, tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    p = d / "batch-0.zip"
    p.write_bytes(make_zip({"go.xml": GO_XML, "people.xml": PERSONS_XML}))

    entities = read_zip_entities(spark, str(d), streaming=True)
    q = (
        entities.writeStream.format("memory")
        .queryName("zip_entities")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM zip_entities").collect()
    assert len(out) == 2
    assert {r.entity_type for r in out} == {"person"}
