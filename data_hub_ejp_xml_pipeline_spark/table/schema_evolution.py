"""Add-only recursive schema merge (SURVEY.md §7 M5).

Reproduces the semantics of the reference's ``get_new_merged_schema``
(``ejp_xml_pipeline/data_store/bq_data_service.py:142-188``, pinned by
``tests/unit_test/data_store/test_bq_data_service.py:76-134``):

* **add-only** — fields present in the incoming schema but not the
  existing one are appended (as nullable);
* **existing-wins** — on a name collision the existing field definition
  (type, casing) is kept; incoming data is cast to it;
* **recursive** — struct fields merge field-by-field, nested arbitrarily;
* **case-insensitive** name matching (reference lowercases names at
  ``bq_data_service.py:147-153``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_schemas(existing: T.StructType, incoming: T.StructType) -> T.StructType:
    """Existing-wins, add-only, recursive, case-insensitive merge."""
    by_lower = {f.name.lower(): f for f in existing.fields}
    out: list[T.StructField] = []
    for f in existing.fields:
        inc = _find(incoming, f.name)
        if (
            inc is not None
            and isinstance(f.dataType, T.StructType)
            and isinstance(inc.dataType, T.StructType)
        ):
            out.append(
                T.StructField(f.name, merge_schemas(f.dataType, inc.dataType), f.nullable, f.metadata)
            )
        else:
            out.append(f)
    for f in incoming.fields:
        if f.name.lower() not in by_lower:
            out.append(T.StructField(f.name, f.dataType, True, f.metadata))
    return T.StructType(out)


def _find(schema: T.StructType, name: str) -> T.StructField | None:
    low = name.lower()
    for f in schema.fields:
        if f.name.lower() == low:
            return f
    return None


def conform_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns → null, extra columns
    dropped (callers merge schemas first if they must be kept), conflicting
    types cast to the existing definition (existing-wins)."""
    cols = []
    df_fields = {f.name.lower(): f for f in df.schema.fields}
    for f in target.fields:
        src = df_fields.get(f.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            col = F.col(src.name)
            if src.dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
    return df.select(*cols)
