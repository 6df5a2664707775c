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


# ---------------------------------------------------------------- goldens
# BYTE-EXACT statements for every operation the adapter can run on a
# cluster. Without an Iceberg runtime in this container, these strings ARE
# the deploy contract — an accidental edit to any generator must fail here,
# not in a MERGE against a production catalog.


def test_create_table_sql_byte_exact():
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    assert ia.create_table_sql("cat.db.seq", schema, key="doc_id", n_buckets=32) == (
        "CREATE TABLE IF NOT EXISTS cat.db.seq ("
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_lsn bigint, _deleted boolean) USING iceberg "
        "PARTITIONED BY (bucket(32, doc_id))"
    )


def test_merge_sql_byte_exact():
    assert ia.merge_sql("cat.db.seq", ["doc_id", "tokens", "n_tok"], key="doc_id") == (
        "MERGE INTO cat.db.seq t USING updates s ON t.doc_id = s.doc_id "
        "WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE SET "
        "t.tokens = s.tokens, t.n_tok = s.n_tok, "
        "t._lsn = s.lsn, t._deleted = (s.op = 'D') "
        "WHEN NOT MATCHED THEN INSERT (doc_id, tokens, n_tok, _lsn, _deleted) "
        "VALUES (s.doc_id, s.tokens, s.n_tok, s.lsn, (s.op = 'D'))"
    )


def test_evolution_sql_byte_exact_add_and_widen():
    """The per-batch evolution PLAN: adds first, then one widening ALTER
    per lossless chain step — including the key (Iceberg's bucket
    transform hashes int as long per spec Appendix B, so key widening is
    bucket-stable there, unlike the local table's pinned key)."""
    existing = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("score", T.FloatType()),
            T.StructField("source", T.StringType()),
        ]
    )
    incoming = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),      # key widens (spec-safe)
            T.StructField("n_tok", T.LongType()),       # widen
            T.StructField("score", T.DoubleType()),     # widen
            T.StructField("source", T.IntegerType()),   # cross-type: existing wins, no DDL
            T.StructField("lang", T.StringType()),      # add
            T.StructField("quality", T.DoubleType()),   # add
        ]
    )
    assert ia.evolution_sql("cat.db.seq", existing, incoming) == [
        "ALTER TABLE cat.db.seq ADD COLUMNS (lang string, quality double)",
        "ALTER TABLE cat.db.seq ALTER COLUMN doc_id TYPE bigint",
        "ALTER TABLE cat.db.seq ALTER COLUMN n_tok TYPE bigint",
        "ALTER TABLE cat.db.seq ALTER COLUMN score TYPE double",
    ]


def test_evolution_sql_noop_cases():
    same = T.StructType([T.StructField("doc_id", T.StringType())])
    assert ia.evolution_sql("cat.db.seq", same, same) == []
    # narrowing emits NOTHING (existing wins; data side casts)
    wide = T.StructType([T.StructField("n", T.LongType())])
    narrow = T.StructType([T.StructField("n", T.IntegerType())])
    assert ia.evolution_sql("cat.db.seq", wide, narrow) == []
    # case-insensitive name match, like the local merge
    upper = T.StructType([T.StructField("N_TOK", T.IntegerType())])
    lower = T.StructType([T.StructField("n_tok", T.LongType())])
    assert ia.evolution_sql("cat.db.seq", upper, lower) == [
        "ALTER TABLE cat.db.seq ALTER COLUMN N_TOK TYPE bigint"
    ]


def test_dml_sql_golden():
    from data_hub_ejp_xml_pipeline_spark.table import iceberg_adapter as ia

    assert ia.delete_where_sql("cat.db.t", "v >= 10") == (
        "UPDATE cat.db.t SET _deleted = true "
        "WHERE (v >= 10) AND NOT coalesce(_deleted, false)"
    )
    assert ia.delete_where_sql("cat.db.t", "v >= 10", hard=True) == (
        "DELETE FROM cat.db.t WHERE (v >= 10) AND NOT coalesce(_deleted, false)"
    )
    assert ia.update_where_sql(
        "cat.db.t", "g = 'odd'", {"g": "'renamed'", "v": "v + length(g)"}
    ) == (
        "UPDATE cat.db.t SET g = 'renamed', v = v + length(g) "
        "WHERE (g = 'odd') AND NOT coalesce(_deleted, false)"
    )
