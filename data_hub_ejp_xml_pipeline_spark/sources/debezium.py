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


def _payload_keys(json_col: str, side: str):
    """Top-level keys of the envelope's ``after``/``before`` object —
    JVM-side (``get_json_object`` + ``json_object_keys``), no Python."""
    obj = F.get_json_object(F.col(json_col).cast("string"), f"$.{side}")
    return F.coalesce(F.json_object_keys(obj), F.array())


def _unknown_keys(json_col: str, side: str, payload_schema: T.StructType):
    """Wire keys (original case preserved) whose CASE-INSENSITIVE name the
    declared schema does not know — the same name matching every other
    engine surface uses, so detection and evolution can never disagree on
    a case-variant column."""
    known_lower = F.array(
        *[F.lit(f.name.lower()) for f in payload_schema.fields]
    )
    keys = _payload_keys(json_col, side)
    return F.filter(
        keys, lambda k: ~F.array_contains(known_lower, F.lower(k))
    )


def drift_columns(
    df: DataFrame, payload_schema: T.StructType, json_col: str = "value"
) -> DataFrame:
    """Schema-drift detector: payload keys arriving on the wire that the
    declared ``payload_schema`` does not know (an upstream DDL added a
    column — ``from_json`` would silently DROP its values). Returns
    ``(column, n_envelopes)`` aggregated over both envelope sides, all
    JVM expressions; empty means no drift. Run it per epoch (or on the
    quarantine branch) and feed :func:`evolve_payload_schema`."""
    unknown = F.array_union(
        _unknown_keys(json_col, "after", payload_schema),
        _unknown_keys(json_col, "before", payload_schema),
    )
    return (
        df.select(F.explode(unknown).alias("column"))
        .groupBy("column")
        .agg(F.count("*").alias("n_envelopes"))
    )


def evolve_payload_schema(
    spark,
    df: DataFrame,
    payload_schema: T.StructType,
    json_col: str = "value",
    sample_limit: int = 1000,
) -> T.StructType:
    """Grow ``payload_schema`` with the drifted TOP-LEVEL columns found in
    ``df``'s envelopes, typed by Spark's own JSON inference over a BOUNDED
    sample of drifted envelopes only (the scan that finds them is
    distributed; at most ``sample_limit`` strings reach the driver).
    Known columns keep their existing types verbatim — wire-side type
    changes never mutate the table schema from here (widening stays the
    table's own merge-time decision). Returns the input schema object
    unchanged when nothing drifted, so callers can cheaply test
    ``evolved is schema``. Nested additions inside known struct columns
    are out of scope (quarantine surfaces them).

    The decode→apply loop for upstream DDL: detect via
    :func:`drift_columns`, evolve, re-decode the epoch with the evolved
    schema, and let the table merge's create-or-evolve add the column —
    old rows read as NULL (``table/schema_evolution.py``)."""
    drifted = F.array_union(
        _unknown_keys(json_col, "after", payload_schema),
        _unknown_keys(json_col, "before", payload_schema),
    )
    sample = (
        df.filter(F.size(drifted) > 0)
        .select(F.col(json_col).cast("string").alias("v"))
        .limit(sample_limit)
        .collect()
    )
    strings = [r["v"] for r in sample if r["v"] is not None]
    if not strings:
        return payload_schema
    inferred = spark.read.json(
        spark.sparkContext.parallelize(strings, 1)
    ).schema
    existing = {f.name.lower() for f in payload_schema.fields}
    new_fields: dict[str, T.StructField] = {}
    for side in ("after", "before"):
        side_type = next(
            (f.dataType for f in inferred.fields if f.name == side), None
        )
        if not isinstance(side_type, T.StructType):
            continue
        for f in side_type.fields:
            if f.name.lower() in existing or f.name.lower() in new_fields:
                continue
            new_fields[f.name.lower()] = T.StructField(f.name, f.dataType, True)
    if not new_fields:
        return payload_schema
    return T.StructType(list(payload_schema.fields) + list(new_fields.values()))


def route_envelopes(
    df: DataFrame,
    schemas: dict[str, T.StructType],
    json_col: str = "value",
) -> dict[str, DataFrame]:
    """Split ONE mixed envelope stream by ``source.table`` — the
    one-connector-many-tables shape every WAL tail has. Returns
    ``{table: envelope_df}`` for the declared tables plus an
    ``"_unrouted"`` branch (NULL or undeclared table names) so nothing is
    silently dropped. Pure column filters over one scan: under
    ``foreachBatch`` the batch should be persisted by the caller so the
    N branch filters share one materialization (plans/multi_table.py
    does)."""
    tbl = F.get_json_object(F.col(json_col).cast("string"), "$.source.table")
    out = {
        t: df.filter(tbl == F.lit(t)) for t in schemas
    }
    out["_unrouted"] = df.filter(
        tbl.isNull() | ~tbl.isin(*schemas.keys())
    )
    return out


def changelog(decoded: DataFrame) -> DataFrame:
    """The clean changelog branch (drops quarantine columns)."""
    return decoded.filter(F.col("_error").isNull()).drop("_error", "_raw")


def quarantine(decoded: DataFrame) -> DataFrame:
    """The dead-letter branch: raw envelope + reason."""
    return decoded.filter(F.col("_error").isNotNull()).select("_raw", "_error")
