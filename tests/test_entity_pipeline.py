"""Per-entity fan-out: one zip-of-XML stream → four entity tables, the
engine equivalent of the reference's four BigQuery loads."""

from __future__ import annotations

import io
import os
import time
import zipfile

from data_hub_ejp_xml_pipeline_spark.config import ENTITY_TYPES, PipelineConfig
from data_hub_ejp_xml_pipeline_spark.plans.entity_pipeline import EntityPipeline
from data_hub_ejp_xml_pipeline_spark.sources.xml_zip import (
    entities_to_changelog,
    read_zip_entities,
)

XML_PERSONS = b"""<persons>
  <person><person-id>p1</person-id><first-name>Ada</first-name>
    <profile-modify-date>2020-01-02 03:04:05</profile-modify-date></person>
</persons>"""

XML_MANUSCRIPT = b"""<xml>
  <people><person><person-id>a1</person-id><first-name>Alan</first-name></person></people>
  <manuscript>
    <country>UK</country>
    <version>
      <manuscript-number>05-02-2020-RA-eLife-12345</manuscript-number>
      <manuscript-type>Research Article</manuscript-type>
      <history><stage><stage-name>Submission</stage-name>
        <start-date>2020-01-01 00:00:00</start-date></stage></history>
    </version>
  </manuscript>
</xml>"""

GO = (
    b'<go create_date="2020-03-03 00:00:00">'
    b"<file_nm>p.xml</file_nm><file_nm>m.xml</file_nm></go>"
)


def _zip() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("go.xml", GO)
        zf.writestr("p.xml", XML_PERSONS)
        zf.writestr("m.xml", XML_MANUSCRIPT)
    return buf.getvalue()


def test_entity_fanout_end_to_end(spark, tmp_path):
    zips = tmp_path / "zips"
    zips.mkdir()
    f = zips / "b0.zip"
    f.write_bytes(_zip())
    now = time.time() - 50
    os.utime(f, (now, now))

    cfg = PipelineConfig.from_dict(
        {
            "zipPath": str(zips),
            "warehouseRoot": str(tmp_path / "wh-{ENV}"),
            "dataPipelineId": "ejp-xml-{ENV}",
        },
        deployment_env="test",
    )
    assert cfg.warehouse_root.endswith("wh-test")
    pipe = EntityPipeline(spark, cfg, n_buckets=2)

    stream = entities_to_changelog(read_zip_entities(spark, str(zips), streaming=True))
    q = pipe.attach(stream, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination()

    assert {r.doc_id for r in pipe.read("person_v2").collect()} == {"person_v2:p1"}
    assert {r.doc_id for r in pipe.read("person").collect()} == {"person:a1"}
    assert {r.doc_id for r in pipe.read("manuscript").collect()} == {"manuscript:12345"}
    versions = pipe.read("manuscript_version").collect()
    assert len(versions) == 1
    assert versions[0].doc_id.startswith("manuscript_version:12345/")
    assert '"country": "UK"' in pipe.read("manuscript").first().payload

    # replayed stream (new checkpoint, same files) converges: every table's
    # ledger no-ops or the LSN guard absorbs — state unchanged
    before = {e: pipe.read(e).count() for e in ENTITY_TYPES}
    q2 = pipe.attach(
        entities_to_changelog(read_zip_entities(spark, str(zips), streaming=True)),
        str(tmp_path / "ckpt2"),
        available_now=True,
    )
    q2.awaitTermination()
    assert {e: pipe.read(e).count() for e in ENTITY_TYPES} == before


def test_entity_tables_keep_declared_schema(spark, tmp_path):
    """Lineage columns must not leak into the written entity tables — the
    first merge is NOT a surprise schema-evolution commit."""
    import os
    import time

    zips = tmp_path / "zips"
    zips.mkdir()
    f = zips / "b0.zip"
    f.write_bytes(_zip())
    os.utime(f, (time.time() - 50, time.time() - 50))
    cfg = PipelineConfig.from_dict(
        {"zipPath": str(zips), "warehouseRoot": str(tmp_path / "wh")}, "x"
    )
    pipe = EntityPipeline(spark, cfg, n_buckets=2)
    changelog = entities_to_changelog(read_zip_entities(spark, str(zips)))
    pipe.apply(changelog, batch_id=0)
    t = pipe.tables["person_v2"]
    assert "+evolve" not in t.manifest()["operation"]
    assert [x.name for x in t.schema().fields] == [
        "doc_id", "payload", "modified_timestamp", "_lsn", "_deleted"
    ]
    # lineage was still recorded from the raw slice
    assert t.lineage()


def test_partial_epoch_converges_on_retry(spark, tmp_path):
    """A crash BETWEEN table commits leaves a partial epoch; retrying the
    same batch_id no-ops the committed tables (their ledgers) and applies
    only the missing ones — the epoch converges without cross-table
    coordination."""
    import os
    import time

    import pytest

    zips = tmp_path / "zips"
    zips.mkdir()
    f = zips / "b0.zip"
    f.write_bytes(_zip())
    os.utime(f, (time.time() - 50, time.time() - 50))
    cfg = PipelineConfig.from_dict(
        {"zipPath": str(zips), "warehouseRoot": str(tmp_path / "wh")}, "x"
    )
    pipe = EntityPipeline(spark, cfg, n_buckets=2)
    changelog = entities_to_changelog(read_zip_entities(spark, str(zips)))

    # crash injection: manuscript_version's merge dies AFTER the others
    victim = pipe.tables["manuscript_version"]
    original_merge = victim.merge

    def exploding_merge(*args, **kwargs):
        raise RuntimeError("simulated crash between table commits")

    victim.merge = exploding_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.apply(changelog, batch_id=0)
    victim.merge = original_merge

    # partial epoch: earlier tables committed, victim did not
    assert pipe.read("person_v2").count() == 1
    assert pipe.read("manuscript_version").count() == 0

    # retry the SAME epoch: committed tables no-op via their ledgers
    pipe.apply(changelog, batch_id=0)
    assert pipe.read("manuscript_version").count() == 1
    assert pipe.read("person_v2").count() == 1
    # ledgers: exactly one entry per table for batch 0
    for e in ENTITY_TYPES:
        assert "0" in pipe.tables[e].ledger()
