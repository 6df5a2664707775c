"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-key last-writer-wins / max-LSN
reduction — the engine's core CDC operator) on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` expose the full registry in
``data_hub_ejp_xml_pipeline_spark.queries`` — one entry per operator family
from SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal metadata).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_hub_ejp_xml_pipeline_spark.queries import (  # noqa: E402
    get_oracle_sql,
    get_queries,
    q_lww_latest_event,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_lww_latest_event(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column names)."""
    return get_oracle_sql()
