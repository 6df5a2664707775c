"""Canonical schemas for the CDC engine.

``CHANGELOG_SCHEMA`` mirrors the reference's stream of full-row-image
upserts (S3 objects sorted by LastModified, reference
``utils/dags/airflow_s3_util_extension.py:101-138``; entity emission with
``modified_timestamp`` at ``ejp_manuscript_xml.py:472-546``), collapsed to
the north-rule shape: monotonic ``lsn`` + op + tokenized payload.

``TARGET_SCHEMA`` is exactly BASELINE.json's input_hint:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``;
the engine appends ``_lsn`` (last applied LSN per key — the merge guard,
analog of the reference watermark in ``etl_state.py:26-76``).
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"

CHANGELOG_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("source_file", T.StringType(), True),
    T.StructField("offset", T.LongType(), True),
    T.StructField("event_ts", T.TimestampType(), True),
]
CHANGELOG_SCHEMA = T.StructType(CHANGELOG_FIELDS)

TARGET_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("_lsn", T.LongType(), False),
]
TARGET_SCHEMA = T.StructType(TARGET_FIELDS)

# columns of the final user-facing state (TARGET minus engine-internal)
FINAL_STATE_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]
