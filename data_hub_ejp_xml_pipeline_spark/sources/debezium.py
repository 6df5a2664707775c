"""Debezium-style CDC envelope → engine changelog.

The north rule's input is a binlog/WAL tail; the de-facto wire format for
that is the Debezium envelope:

``{"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
   "ts_ms": 1700000000000, "source": {"lsn": 123, "table": "...",}}``

This source decodes a column (or stream) of such JSON envelopes into the
engine's changelog shape — ``lsn, op (I/U/D), doc_id, payload columns`` —
entirely with ``from_json`` + column expressions (JVM-side, streaming-
safe: the same plan runs under readStream from a Kafka/file source).

Op mapping: ``c``/``r`` (create / snapshot read) → I, ``u`` → U,
``d`` → D. LSN: ``source.lsn`` when the connector provides one, else
``ts_ms`` (millisecond ordering) — both monotone per key for a single
binlog. Delete envelopes carry the payload in ``before``; everything else
in ``after``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The Debezium envelope for a given row payload schema."""
    return T.StructType(
        [
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _map_op(op: Column) -> Column:
    expr = F.lit(None).cast("string")
    for src, dst in _OP_MAP.items():
        expr = F.when(op == src, F.lit(dst)).otherwise(expr)
    return expr


def decode_envelopes(
    df: DataFrame,
    payload_schema: T.StructType,
    key: str = "doc_id",
    json_col: str = "value",
    lsn_source: str = "lsn",
) -> DataFrame:
    """JSON envelope column → engine changelog rows.

    Output: ``lsn, op, <payload columns>`` with the key taken from
    ``after`` (or ``before`` for deletes). Unparseable envelopes, unknown
    ops, null keys and missing ordering values are dropped into a
    quarantine-able ``_error`` column rather than failing the stream —
    filter ``_error IS NULL`` for the clean changelog
    (``sources.xml_zip.quarantine`` pattern).

    ``lsn_source`` picks ONE ordering domain — ``'lsn'`` (``source.lsn``,
    the WAL position) or ``'ts_ms'``. They are deliberately NOT coalesced:
    a ts_ms value (≈1.7e12) mixed into a stream of small WAL positions
    would out-rank every real LSN and make the merge guard silently drop
    all later genuine updates for that key. An envelope missing its chosen
    ordering value is quarantined instead."""
    if lsn_source not in ("lsn", "ts_ms"):
        raise ValueError(f"lsn_source must be 'lsn' or 'ts_ms', got {lsn_source!r}")
    env = F.from_json(F.col(json_col).cast("string"), envelope_schema(payload_schema))
    parsed = df.select(env.alias("e"), F.col(json_col).cast("string").alias("_raw"))
    op = _map_op(F.col("e.op"))
    row = F.when(F.col("e.op") == "d", F.col("e.before")).otherwise(F.col("e.after"))
    lsn = (
        F.col("e.source.lsn") if lsn_source == "lsn" else F.col("e.ts_ms")
    ).cast("long")
    error = (
        F.when(F.col("e").isNull(), F.lit("unparseable envelope"))
        .when(op.isNull(), F.concat(F.lit("unknown op: "), F.coalesce(F.col("e.op"), F.lit("<null>"))))
        .when(row.isNull(), F.lit("missing payload (before/after)"))
        .when(row.getField(key).isNull(), F.lit(f"null key ({key})"))
        .when(lsn.isNull(), F.lit(f"missing ordering value ({lsn_source})"))
    )
    out_payload = [row.getField(f.name).alias(f.name) for f in payload_schema.fields]
    return parsed.select(
        lsn.alias("lsn"),
        op.alias("op"),
        *out_payload,
        error.alias("_error"),
        F.col("_raw"),
    )


def changelog(decoded: DataFrame) -> DataFrame:
    """The clean changelog branch (drops quarantine columns)."""
    return decoded.filter(F.col("_error").isNull()).drop("_error", "_raw")


def quarantine(decoded: DataFrame) -> DataFrame:
    """The dead-letter branch: raw envelope + reason."""
    return decoded.filter(F.col("_error").isNotNull()).select("_raw", "_error")
