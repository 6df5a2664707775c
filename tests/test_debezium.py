"""Debezium envelope decoding: op mapping, before/after selection, LSN
fallback, quarantine branch, streaming end-to-end into the snapshot table."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.sources import debezium as dbz

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.StringType()),
    ]
)


def _env(op, before=None, after=None, lsn=None, ts_ms=None):
    return json.dumps(
        {"before": before, "after": after, "op": op,
         "ts_ms": ts_ms, "source": {"lsn": lsn, "table": "docs"}}
    )


def test_decode_envelopes(spark):
    rows = [
        (_env("c", after={"doc_id": "a", "v": "a1"}, lsn=1),),
        (_env("r", after={"doc_id": "b", "v": "b1"}, lsn=2),),   # snapshot read → I
        (_env("u", after={"doc_id": "a", "v": "a2"}, lsn=3),),
        (_env("d", before={"doc_id": "b", "v": "b1"}, lsn=4),),  # delete payload = before
        (_env("u", after={"doc_id": "c", "v": "c1"}, ts_ms=99),),  # NO lsn → quarantined
        (_env("c", after={"doc_id": None, "v": "n"}, lsn=5),),     # null key → quarantined
        (_env("x", after={"doc_id": "z", "v": "z"}, lsn=9),),    # unknown op
        ("{not json",),
    ]
    df = spark.createDataFrame(rows, "value string")
    decoded = dbz.decode_envelopes(df, PAYLOAD)
    clean = {(r.lsn, r.op, r.doc_id, r.v) for r in dbz.changelog(decoded).collect()}
    assert clean == {
        (1, "I", "a", "a1"),
        (2, "I", "b", "b1"),
        (3, "U", "a", "a2"),
        (4, "D", "b", "b1"),
    }
    bad = {r._error for r in dbz.quarantine(decoded).collect()}
    assert any("unknown op" in e for e in bad)
    assert any("null key" in e for e in bad)
    # ts_ms and source.lsn are different ordering domains — never coalesced
    assert any("missing ordering value (lsn)" in e for e in bad)
    assert len(bad) == 4  # + the unparseable envelope


def test_decode_envelopes_ts_ms_domain(spark):
    """A connector without WAL positions orders by ts_ms — explicitly."""
    rows = [
        (_env("c", after={"doc_id": "a", "v": "a1"}, ts_ms=100),),
        (_env("u", after={"doc_id": "a", "v": "a2"}, ts_ms=200),),
        (_env("u", after={"doc_id": "b", "v": "b1"}, lsn=7),),  # no ts_ms → quarantined
    ]
    df = spark.createDataFrame(rows, "value string")
    decoded = dbz.decode_envelopes(df, PAYLOAD, lsn_source="ts_ms")
    clean = {(r.lsn, r.doc_id, r.v) for r in dbz.changelog(decoded).collect()}
    assert clean == {(100, "a", "a1"), (200, "a", "a2")}
    assert dbz.quarantine(decoded).count() == 1


def test_debezium_stream_to_snapshot_table(spark, tmp_path):
    """WAL-tail shape end-to-end: JSONL envelopes → decode → reduce →
    MERGE, exactly-once; final state honors the delete."""
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    src = tmp_path / "wal"
    src.mkdir()
    (src / "seg1.jsonl").write_text(
        "\n".join(
            [
                _env("c", after={"doc_id": "a", "v": "a1"}, lsn=1),
                _env("c", after={"doc_id": "b", "v": "b1"}, lsn=2),
                _env("u", after={"doc_id": "a", "v": "a2"}, lsn=3),
                _env("d", before={"doc_id": "b", "v": "b1"}, lsn=4),
            ]
        )
    )
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), PAYLOAD, n_buckets=2)
    stream = spark.readStream.schema("value string").text(str(src)).withColumnRenamed("value", "value")
    decoded = dbz.changelog(dbz.decode_envelopes(stream, PAYLOAD))

    def epoch(df, bid):
        table.merge(reduce_latest(df), batch_id=bid)

    q = (
        decoded.writeStream.foreachBatch(epoch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.doc_id: r for r in table.read().collect()}
    assert set(rows) == {"a"}
    assert rows["a"].v == "a2" and rows["a"]._lsn == 3


def test_drift_detection_and_schema_evolution(spark, tmp_path):
    """Upstream DDL loop: a column appears on the wire mid-stream →
    drift_columns flags it, evolve_payload_schema types it off a bounded
    sample, the re-decode carries it, and the table merge's
    create-or-evolve adds it (old rows read NULL)."""
    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    epoch1 = spark.createDataFrame(
        [
            (_env("c", after={"doc_id": "a", "v": "a1"}, lsn=1),),
            (_env("c", after={"doc_id": "b", "v": "b1"}, lsn=2),),
        ],
        "value string",
    )
    epoch2 = spark.createDataFrame(
        [
            (_env("u", after={"doc_id": "a", "v": "a2", "score": 7}, lsn=3),),
            (_env("c", after={"doc_id": "c", "v": "c1", "score": 9}, lsn=4),),
            (_env("d", before={"doc_id": "b", "v": "b1", "score": 1}, lsn=5),),
        ],
        "value string",
    )
    # epoch 1: no drift — the SAME schema object comes back
    assert dbz.drift_columns(epoch1, PAYLOAD).count() == 0
    assert dbz.evolve_payload_schema(spark, epoch1, PAYLOAD) is PAYLOAD

    drift = {r.column: r.n_envelopes for r in dbz.drift_columns(epoch2, PAYLOAD).collect()}
    assert drift == {"score": 3}
    evolved = dbz.evolve_payload_schema(spark, epoch2, PAYLOAD)
    assert [f.name for f in evolved.fields] == ["doc_id", "v", "score"]
    assert isinstance(evolved["score"].dataType, T.LongType)  # JSON int → long
    # known columns keep their declared types even though inference saw them
    assert isinstance(evolved["v"].dataType, T.StringType)

    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), PAYLOAD, n_buckets=2)
    table.merge(reduce_latest(dbz.changelog(dbz.decode_envelopes(epoch1, PAYLOAD))), batch_id=0)
    table.merge(reduce_latest(dbz.changelog(dbz.decode_envelopes(epoch2, evolved))), batch_id=1)
    got = {(r.doc_id, r.v, r.score) for r in table.read().select("doc_id", "v", "score").collect()}
    assert got == {("a", "a2", 7), ("c", "c1", 9)}


def test_drift_quarantine_unaffected(spark):
    """Unparseable envelopes must not break the drift scan (their key
    arrays coalesce to empty)."""
    df = spark.createDataFrame(
        [("{not json",), (_env("c", after={"doc_id": "a", "v": "x"}, lsn=1),)],
        "value string",
    )
    assert dbz.drift_columns(df, PAYLOAD).count() == 0


def test_drift_case_variant_column_detected_and_evolved_consistently(spark):
    """Detection and evolution must agree on case-variant names (the
    engine's name matching is case-insensitive everywhere): a wire column
    differing only in case from a declared one is NOT drift; a genuinely
    new mixed-case column is detected AND evolved (wire case preserved)."""
    df = spark.createDataFrame(
        [
            (_env("u", after={"doc_id": "a", "V": "x", "NewCol": 1}, lsn=1),),
            (_env("u", after={"doc_id": "b", "v": "y", "NewCol": 2}, lsn=2),),
        ],
        "value string",
    )
    drift = {r.column for r in dbz.drift_columns(df, PAYLOAD).collect()}
    assert drift == {"NewCol"}  # "V" is just a case variant of declared "v"
    evolved = dbz.evolve_payload_schema(spark, df, PAYLOAD)
    assert [f.name for f in evolved.fields] == ["doc_id", "v", "NewCol"]
