"""Every registered query matches its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import os

import pytest

from data_hub_ejp_xml_pipeline_spark.checker import compare_query, duckdb_connection
from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = QUERIES[name]
    if sql is None:
        pytest.skip(f"{name}: genuinely non-SQL (driver runs rows-only check)")
    r = compare_query(spark, con, fn, sql, SF_DIR)
    assert r["rows_match"], f"{name}: rows {r['spark_rows']} != {r['oracle_rows']}"
    assert r["columns_match"], f"{name}: cols {r.get('spark_cols')} vs {r.get('oracle_cols')}"
    assert r["values_match"], f"{name}: value mismatch, first diffs: {r.get('first_diffs')}"


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
