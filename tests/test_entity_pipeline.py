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


XML_PERSONS_V2_DRIFT = b"""<persons>
  <person><person-id>p1</person-id><first-name>Ada</first-name>
    <email>ada@example.org</email>
    <profile-modify-date>2020-01-05 03:04:05</profile-modify-date>
    <addresses><address active_ind="1"><country>UK</country>
      <city>London</city></address></addresses>
    <person-tags><person-tag>editor</person-tag></person-tags></person>
</persons>"""

GO_P_ONLY = b'<go create_date="2020-03-04 00:00:00"><file_nm>p.xml</file_nm></go>'


def test_typed_entity_tables_evolve_and_query_nested(spark, tmp_path):
    """payload_mode='typed': parsed dicts land as TYPED nested columns
    (not JSON blobs); a later batch introducing new fields (addresses,
    email) evolves the table additively and nested projections
    (stages[0].stage_name) read back as real columns — the reference's
    create_or_extend_table_schema behavior end-to-end
    (bq_data_service.py:142-231)."""
    import io
    import zipfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def write_zip(dirpath, name, members, age):
        dirpath.mkdir(exist_ok=True)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for n, data in members.items():
                zf.writestr(n, data)
        f = dirpath / name
        f.write_bytes(buf.getvalue())
        t = time.time() - age
        os.utime(f, (t, t))
        return f

    zips1 = tmp_path / "zips1"
    write_zip(zips1, "b0.zip", {"go.xml": GO, "p.xml": XML_PERSONS, "m.xml": XML_MANUSCRIPT}, 100)
    zips2 = tmp_path / "zips2"
    write_zip(zips2, "b1.zip", {"go.xml": GO_P_ONLY, "p.xml": XML_PERSONS_V2_DRIFT}, 50)

    cfg = PipelineConfig.from_dict(
        {"zipPath": str(zips1), "warehouseRoot": str(tmp_path / "wh")}, "x"
    )
    pipe = EntityPipeline(spark, cfg, n_buckets=2, payload_mode="typed")

    pipe.apply(entities_to_changelog(read_zip_entities(spark, str(zips1))), batch_id=0)
    pv2 = pipe.tables["person_v2"]
    cols_after_b0 = [f.name for f in pv2.schema().fields]
    assert "first_name" in cols_after_b0  # typed column, not a JSON blob
    assert "payload" not in cols_after_b0
    assert "addresses" not in cols_after_b0  # nothing had one yet

    # typed nested projection on manuscript_version: a REAL column
    mv = pipe.read("manuscript_version")
    stage_field = next(f for f in mv.schema.fields if f.name == "stages")
    assert isinstance(stage_field.dataType, T.ArrayType)
    assert isinstance(stage_field.dataType.elementType, T.StructType)
    row = mv.select(F.col("stages")[0]["stage_name"].alias("s")).first()
    assert row.s == "Submission"
    assert pipe.read("manuscript").first().country == "UK"

    # batch 2 introduces addresses (array<struct>) + email → additive evolve
    pipe.apply(entities_to_changelog(read_zip_entities(spark, str(zips2))), batch_id=1)
    cols_after_b1 = [f.name for f in pv2.schema().fields]
    assert cols_after_b1[: len(cols_after_b0)] == cols_after_b0  # add-only
    assert "addresses" in cols_after_b1 and "email" in cols_after_b1
    p1 = pipe.read("person_v2").filter(F.col("doc_id") == "person_v2:p1")
    got = p1.select(
        "email",
        F.col("addresses")[0]["city"].alias("city"),
        F.col("addresses")[0]["is_enabled"].alias("en"),
        "person_tags",
    ).first()
    assert got.email == "ada@example.org"
    assert got.city == "London"
    assert got.en is True
    assert list(got.person_tags) == ["editor"]
    # LWW kept the newer batch's row
    assert p1.select("modified_timestamp").first()[0] == "2020-01-05T08:04:05Z"
