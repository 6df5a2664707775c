"""As-of join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to every left row the latest right row
with the same key and ``right.ts <= left.ts`` (inclusive). Implemented as
a composition of built-in operators (preferred over applyInPandas
merge_asof): tag both sides, union, and carry the last right value forward
with ``last(..., ignorenulls=True)`` over a per-key time-ordered window.

One shuffle on the key (same as any equi-join), no per-group pandas, no
range-explosion — the composition is the 100 TB shape. Within equal
timestamps the right side sorts first, so equality matches (standard
ASOF semantics, mirroring DuckDB's ``ASOF JOIN`` used as the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns + the latest ``value_cols`` from
    ``right`` as of each left row's timestamp (null when none precedes)."""
    lcols = left.columns
    # carry ONE struct of all value cols, not per-column last(ignorenulls):
    # the struct itself is non-null for every right row, so a matched right
    # row whose value column is genuinely NULL yields NULL (DuckDB ASOF
    # semantics) instead of leaking the previous row's value forward.
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key).alias(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    ).select(*lcols, "_ts", "_side", "_r")

    u = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        *lcols,
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_r_asof"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_r_asof").getField(c).alias(c + "_asof") for c in value_cols],
    )
