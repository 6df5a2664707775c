"""Iceberg adapter: SQL generation pinned offline; execution gated on the
runtime (absent in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table import iceberg_adapter as ia


def test_create_table_sql_appends_lsn_and_buckets():
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    sql = ia.create_table_sql("cat.db.docs", schema, key="doc_id", n_buckets=64)
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(64, doc_id))" in sql
    assert "_lsn bigint" in sql and "_deleted boolean" in sql
    assert sql.index("doc_id string") < sql.index("_lsn bigint")


def test_merge_sql_matches_snapshot_table_contract():
    sql = ia.merge_sql(
        "cat.db.docs", ["doc_id", "payload", "source"], key="doc_id"
    )
    # LSN-guarded upsert with TOMBSTONE deletes (same semantics as the
    # local table: a physical DELETE would let a later out-of-order older
    # update resurrect the key via the unguardable NOT MATCHED branch)
    assert "ON t.doc_id = s.doc_id" in sql
    assert "THEN DELETE" not in sql
    assert "WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE SET" in sql
    assert "t.payload = s.payload" in sql and "t._lsn = s.lsn" in sql
    assert "t._deleted = (s.op = 'D')" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "(doc_id, payload, source, _lsn, _deleted)" in sql
    assert "(s.doc_id, s.payload, s.source, s.lsn, (s.op = 'D'))" in sql
    # the key is never in the UPDATE SET list
    assert "t.doc_id = s.doc_id," not in sql.split("UPDATE SET")[1]


def test_vacuum_sql():
    sql = ia.vacuum_sql("cat.db.docs", 12345)
    assert sql == "DELETE FROM cat.db.docs WHERE _deleted AND _lsn <= 12345"


def test_runtime_gate(spark):
    assert ia.is_available(spark) is False  # no Iceberg jar in this container
    with pytest.raises(RuntimeError, match="SnapshotTable"):
        ia.IcebergSnapshotTable(spark, "cat.db.docs")


def test_add_columns_sql():
    fields = [
        T.StructField("new_col", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
    assert ia.add_columns_sql("cat.db.docs", fields) == (
        "ALTER TABLE cat.db.docs ADD COLUMNS (new_col string, n bigint)"
    )


def test_read_rejects_version_and_snapshot_id_together():
    """read() translates small sequential versions to Iceberg snapshot ids
    (random longs) via the snapshots metadata table; passing both handles
    at once is ambiguous and refused before touching the catalog."""
    t = object.__new__(ia.IcebergSnapshotTable)  # skip the runtime gate
    with pytest.raises(ValueError, match="not both"):
        t.read(version=1, snapshot_id=123)


def test_widen_column_sql_golden():
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table.iceberg_adapter import widen_column_sql

    sql = widen_column_sql("cat.db.docs", T.StructField("n_val", T.LongType()))
    assert sql == "ALTER TABLE cat.db.docs ALTER COLUMN n_val TYPE bigint"
    sql = widen_column_sql("cat.db.docs", T.StructField("score", T.DoubleType()))
    assert sql == "ALTER TABLE cat.db.docs ALTER COLUMN score TYPE double"
