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

# reference XML vocabulary throughout (ejp_person_xml.py / ejp_manuscript_xml.py)
PERSONS_XML = b"""<persons>
  <person>
    <person-id>p1</person-id>
    <first-name>Ada</first-name><last-name>Lovelace &amp; Co</last-name>
    <email>ada@example.org</email>
    <profile-modify-date>2020-01-02 03:04:05</profile-modify-date>
    <person-tags><person-tag>editor</person-tag><person-tag>reviewer</person-tag></person-tags>
    <addresses><address active_ind="1"><country>UK</country><city>London</city></address></addresses>
  </person>
  <person>
    <first-name>NoId</first-name><last-name>Person</last-name>
    <status>Inactive</status>
  </person>
</persons>"""

MANUSCRIPT_XML = b"""<xml>
  <people>
    <person><person-id>a1</person-id><first-name>Alan</first-name>
      <last-name>Turing</last-name>
      <roles><role><role-type>Author</role-type></role></roles>
    </person>
  </people>
  <manuscript>
    <country>UK</country>
    <production-data><production-data-doi>10.7554/eLife.12345</production-data-doi></production-data>
    <version>
      <manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>
      <manuscript-type>Research Article</manuscript-type>
      <title>Spark &amp; Scale</title>
      <history>
        <stage><stage-name>Submission</stage-name><start-date>2020-01-01 00:00:00</start-date></stage>
        <stage><stage-name>Review</stage-name><start-date>2020-01-05 00:00:00</start-date></stage>
      </history>
      <authors><author><author-person-id>a1</author-person-id>
        <author-seq>1</author-seq><is-corr>true</is-corr></author></authors>
      <keywords><keywords><word>spark</word></keywords></keywords>
    </version>
  </manuscript>
</xml>"""

# reference go.xml format: create_date ATTRIBUTE + file_nm elements
# (ejp_zip.py:31-38)
GO_XML = (
    b'<go create_date="2020-03-03 00:00:00">'
    b"<file_nm>people.xml</file_nm><file_nm>ms.xml</file_nm>"
    b"<file_nm>skipme.xml</file_nm></go>"
)


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

    persons = by_type["person_v2"]
    assert persons[0]["doc_id"] == "p1"
    p0 = json.loads(persons[0]["payload"])
    assert p0["last_name"] == "Lovelace & Co"  # entity decoded
    assert p0["person_tags"] == ["editor", "reviewer"]
    assert p0["addresses"][0]["is_enabled"] is True
    # node_index 0 is falsy → stripped, exactly as the reference's
    # remove_key_with_null_value does before the BigQuery write (etl.py:47)
    assert p0["provenance"] == {"source_filename": "batch.zip/people.xml"}
    # naive wall time → US/Eastern (EST, UTC-5) → ISO Z
    assert persons[0]["modified_timestamp"] == "2020-01-02T08:04:05Z"
    # synthetic id + manifest create_date fallback for the id-less person
    assert persons[1]["doc_id"] == "generated-batch.zip/people.xml-1"
    assert persons[1]["modified_timestamp"] == "2020-03-03T05:00:00Z"
    p1 = json.loads(persons[1]["payload"])
    assert p1["status"] == "Inactive"
    assert "email" not in p1  # missing child (None) stripped
    assert "addresses" not in p1  # [] stripped

    # manuscript-side person entity (people/person)
    a1 = json.loads(by_type["person"][0]["payload"])
    assert by_type["person"][0]["doc_id"] == "a1"
    assert a1["roles"] == [{"role_name": "Author"}]

    ms = by_type["manuscript"][0]
    assert ms["doc_id"] == "12345"  # regex-extracted eLife number
    mp = json.loads(ms["payload"])
    assert mp["doi"] == "10.7554/eLife.12345"
    assert mp["long_manuscript_identifier"] == "05-02-2020-RA-eLife-12345"
    ver = by_type["manuscript_version"][0]
    assert ver["doc_id"] == "12345/2020-01-01T05:00:00Z"
    vp = json.loads(ver["payload"])
    assert [s["stage_name"] for s in vp["stages"]] == ["Submission", "Review"]
    assert vp["authors"] == [
        {"person_id": "a1", "sequence": 1, "is_corresponding_author": True}
    ]
    assert vp["keywords"] == [{"keyword": "spark"}]
    assert vp["manuscript_title"] == "Spark & Scale"
    assert vp["overall_stage"] == "Full Submission"

    # exclusion + manifest filtering: skipme and not-listed produce nothing
    assert not any(r["xml_file"] in ("skipme.xml", "not-listed.xml") for r in rows)


def test_parse_zip_quarantine_paths():
    go = (
        b'<go create_date="2020-03-03 00:00:00">'
        b"<file_nm>people.xml</file_nm><file_nm>ms.xml</file_nm>"
        b"<file_nm>hard.xml</file_nm></go>"
    )
    z = make_zip({
        "go.xml": go,
        "people.xml": b"<persons><broken",  # truncated → RECOVERED (S7)
        "ms.xml": b"<weird/>",
        "hard.xml": b"<a>\n<<<%%% not xml\n</a>",  # unrecoverable
    })
    rows = list(parse_zip_bytes(z, "bad.zip"))
    errors = [r for r in rows if r["entity_type"] == "error"]
    kinds = {e["xml_file"]: e["error"] for e in errors}
    # truncated people.xml was salvaged (no person children → no rows, no error)
    assert "people.xml" not in kinds
    assert "unknown root tag" in kinds["ms.xml"]
    # hard failure carries the offending line (xml.py:8-22 parity)
    assert "line=[" in kinds["hard.xml"] and "not xml" in kinds["hard.xml"]
    # bad zip bytes entirely
    assert "bad zip" in next(iter(parse_zip_bytes(b"nope", "x.zip")))["error"]


def test_truncated_document_yields_entities_not_quarantine():
    """S7: a recoverably-broken document (truncated mid-element) is
    salvaged into entities — the reference gets this from lxml
    recover=True (ejp_zip.py:41-45)."""
    truncated = (
        b'<persons><person><person-id>p9</person-id>'
        b"<first-name>Cut"  # document truncated mid-stream
    )
    go = b'<go create_date="2020-03-03 00:00:00"><file_nm>p.xml</file_nm></go>'
    rows = list(parse_zip_bytes(make_zip({"go.xml": go, "p.xml": truncated}), "t.zip"))
    assert [r["entity_type"] for r in rows] == ["person_v2"]
    assert rows[0]["doc_id"] == "p9"
    assert json.loads(rows[0]["payload"])["first_name"] == "Cut"


def test_manuscript_id_fallbacks():
    no_number = MANUSCRIPT_XML.replace(
        b"<manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>", b""
    )
    z = make_zip({"fallback-stem.xml": no_number})
    # no go.xml → the Spark layer's file-mtime fallback supplies the
    # document timestamp (parse_zip_bytes default_modified_iso)
    rows = [
        r
        for r in parse_zip_bytes(
            z, "z.zip", default_modified_iso="2020-03-03T05:00:00Z"
        )
        if r["entity_type"] == "manuscript"
    ]
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
    # 2 person_v2 + 1 person + manuscript + version per zip
    assert len(rows) == 3 * 5

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
    # reference) → 3 generated person_v2 + person_v2:p1 + person:a1 +
    # manuscript + version = 7
    assert final.count() == 7
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
    assert {r.entity_type for r in out} == {"person_v2"}


def test_transform_failure_is_all_or_nothing():
    """A document whose LATER entity fails to transform must contribute NO
    partial entities — one quarantine row only (the reference's
    ParseDocumentError wraps the whole document, ejp_xml.py:24-42)."""
    broken_version = b"""<xml>
      <people><person><person-id>a1</person-id>
        <first-name>Alan</first-name></person></people>
      <manuscript><version>
        <manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>
        <manuscript-type>Research Article</manuscript-type>
        <history><stage><stage-name>S</stage-name>
          <start-date></start-date></stage></history>
      </version></manuscript></xml>"""
    go = b'<go create_date="2020-03-03 00:00:00"><file_nm>m.xml</file_nm></go>'
    rows = list(parse_zip_bytes(make_zip({"go.xml": go, "m.xml": broken_version}), "z.zip"))
    assert [r["entity_type"] for r in rows] == ["error"]
    assert "transform:" in rows[0]["error"]


def test_bad_manifest_create_date_quarantined_not_fatal():
    """A parseable go.xml whose create_date fails date parsing must not
    fail the whole batch: quarantine one manifest-level row, keep loading
    members with the default timestamp (ADVICE r2)."""
    go = b'<go create_date="not a date"><file_nm>people.xml</file_nm></go>'
    rows = list(
        parse_zip_bytes(
            make_zip({"go.xml": go, "people.xml": PERSONS_XML}),
            "b.zip",
            default_modified_iso="2021-01-01T00:00:00Z",
        )
    )
    errs = [r for r in rows if r["entity_type"] == "error"]
    assert len(errs) == 1
    assert "create_date" in errs[0]["error"]
    persons = [r for r in rows if r["entity_type"] == "person_v2"]
    assert len(persons) == 2  # members still parsed
    # the id-less person's manifest-date fallback degrades to the default
    assert persons[1]["modified_timestamp"] == "2021-01-01T00:00:00Z"
