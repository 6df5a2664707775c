"""Add-only recursive schema merge (SURVEY.md §7 M5).

Reproduces the semantics of the reference's ``get_new_merged_schema``
(``ejp_xml_pipeline/data_store/bq_data_service.py:142-188``, pinned by
``tests/unit_test/data_store/test_bq_data_service.py:76-134``):

* **add-only** — fields present in the incoming schema but not the
  existing one are appended (as nullable);
* **existing-wins** — on a name collision the existing field definition
  (type, casing) is kept; incoming data is cast to it;
* **safe widening** (beyond the reference, per the Iceberg evolution
  rules the north rule mandates) — when the incoming scalar type is a
  LOSSLESS widening of the existing one (byte→short→int→long,
  float→double) the merged column WIDENS instead of narrowing the
  incoming data: a cast down would overflow under ANSI. Old parquet
  files stay valid — Spark 4's parquet readers promote int32→int64 /
  float→double at read time (verified by tests), so widening is a
  metadata-only change, exactly as in Iceberg;
* **recursive** — struct fields merge field-by-field, nested arbitrarily,
  INCLUDING structs inside arrays (the reference's RECORD fields merge
  regardless of REPEATED mode);
* **case-insensitive** name matching (reference lowercases names at
  ``bq_data_service.py:147-153``).

``conform_to_schema`` is the data-side counterpart: it reshapes a
DataFrame onto a merged schema FIELD BY NAME. A plain ``cast`` cannot do
this for structs — Spark rejects casts that add fields and maps
equal-count casts positionally (silently crossing differently-named
fields) — so struct conformance is rebuilt with ``F.struct`` and array
elements via ``F.transform``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_schemas(existing: T.StructType, incoming: T.StructType) -> T.StructType:
    """Existing-wins, add-only, recursive, case-insensitive merge."""
    by_lower = {f.name.lower(): f for f in existing.fields}
    out: list[T.StructField] = []
    for f in existing.fields:
        inc = _find(incoming, f.name)
        merged_type = (
            _merge_types(f.dataType, inc.dataType) if inc is not None else f.dataType
        )
        out.append(T.StructField(f.name, merged_type, f.nullable, f.metadata))
    for f in incoming.fields:
        if f.name.lower() not in by_lower:
            out.append(T.StructField(f.name, f.dataType, True, f.metadata))
    return T.StructType(out)


# lossless scalar widening lattices (the Iceberg-permitted type changes
# that parquet readers can promote at scan time)
_WIDENING_CHAINS: list[tuple[T.DataType, ...]] = [
    (T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()),
    (T.FloatType(), T.DoubleType()),
]


def _widened(existing: T.DataType, incoming: T.DataType) -> T.DataType | None:
    """The wider of two scalars when both sit on one widening chain and
    the incoming one is strictly wider; None otherwise."""
    for chain in _WIDENING_CHAINS:
        if existing in chain and incoming in chain:
            wide = chain[max(chain.index(existing), chain.index(incoming))]
            return wide if wide != existing else None
    return None


def _merge_types(existing: T.DataType, incoming: T.DataType) -> T.DataType:
    """Existing-wins type merge that recurses through structs AND array
    element structs (new nested fields must not be silently dropped just
    because they sit inside array<struct>), widening scalars when the
    incoming type is strictly wider on a lossless chain."""
    if isinstance(existing, T.StructType) and isinstance(incoming, T.StructType):
        return merge_schemas(existing, incoming)
    if isinstance(existing, T.ArrayType) and isinstance(incoming, T.ArrayType):
        return T.ArrayType(
            _merge_types(existing.elementType, incoming.elementType),
            existing.containsNull,
        )
    wide = _widened(existing, incoming)
    if wide is not None:
        return wide
    return existing  # scalar or shape mismatch: existing wins wholesale


def _find(schema: T.StructType, name: str) -> T.StructField | None:
    low = name.lower()
    for f in schema.fields:
        if f.name.lower() == low:
            return f
    return None


def conform_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns → null, extra columns
    dropped (callers merge schemas first if they must be kept), conflicting
    types conformed to the existing definition (existing-wins), structs
    matched FIELD BY NAME at every nesting level."""
    cols = []
    df_fields = {f.name.lower(): f for f in df.schema.fields}
    for f in target.fields:
        src = df_fields.get(f.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(
                _conform_expr(F.col(src.name), src.dataType, f.dataType).alias(f.name)
            )
    return df.select(*cols)


def _conform_expr(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if src == dst:
        return col
    if isinstance(dst, T.StructType):
        if not isinstance(src, T.StructType):
            return F.lit(None).cast(dst)
        src_map = {f.name.lower(): f for f in src.fields}
        fields = []
        for f in dst.fields:
            sf = src_map.get(f.name.lower())
            if sf is None:
                fields.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                fields.append(
                    _conform_expr(
                        col.getField(sf.name), sf.dataType, f.dataType
                    ).alias(f.name)
                )
        # a NULL input struct must stay NULL, not become a struct of nulls
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.struct(*fields)
        )
    if isinstance(dst, T.ArrayType):
        if not isinstance(src, T.ArrayType):
            return F.lit(None).cast(dst)
        if src.elementType == dst.elementType:
            return col
        return F.transform(
            col, lambda x: _conform_expr(x, src.elementType, dst.elementType)
        )
    return col.cast(dst)
