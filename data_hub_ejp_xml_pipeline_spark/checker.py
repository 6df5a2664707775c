"""Local oracle checker mimicking the driver: run each registered Spark
query and its DuckDB oracle on the same sf dir, compare row count +
order-insensitive values (columns sorted by name, rows sorted by all
columns, values canonicalized)."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return tuple(_canon_value(x) for x in v)
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, fn, sql: str, sf_dir: str
) -> dict[str, Any]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.sql(sql).df()
    out: dict[str, Any] = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "columns_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
    }
    if out["rows_match"] and out["columns_match"]:
        s = canonical_rows(spark_pdf)
        o = canonical_rows(oracle_pdf)
        out["values_match"] = s == o
        if not out["values_match"]:
            diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
            out["first_diffs"] = diffs
    else:
        out["values_match"] = False
        out["spark_cols"] = sorted(spark_pdf.columns)
        out["oracle_cols"] = sorted(oracle_pdf.columns)
    return out
