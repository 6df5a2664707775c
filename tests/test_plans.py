"""Physical-plan quality gates: these pin the properties that matter at
100 TB — filter pushdown to the parquet scan, column pruning, broadcast of
small dims, two-phase (partial+final) aggregation for the LWW reduce, and
no driver-side collects in query plans."""

from __future__ import annotations

import re

from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name][0](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "tpch_q1")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1), plan[:800]
    rs = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    assert rs is not None
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    # projection pruned: only the 6 referenced columns reach the scan
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_quantity", "l_extendedprice", "l_discount"} <= cols


def test_small_dims_are_broadcast(spark):
    plan = _plan(spark, "broadcast_dim_join")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:800]
    assert "SortMergeJoin" not in plan


def test_lww_reduce_is_two_phase(spark):
    """Partial + final aggregation: replays/hot keys collapse map-side
    before the shuffle — the skew story for the default reduce."""
    plan = _plan(spark, "lww_latest_event")
    n_aggs = plan.count("SortAggregate") + plan.count("HashAggregate")
    assert n_aggs >= 2, plan[:800]


def test_lww_scan_prunes_columns(spark):
    plan = _plan(spark, "lww_latest_event")
    rs = re.search(r"ReadSchema: struct<([^\n]*)", plan)
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert "props" not in cols and "ts" not in cols, cols


def test_anti_join_uses_join_not_collect(spark):
    plan = _plan(spark, "anti_join_unseen")
    assert "LeftAnti" in plan or "left_anti" in plan.lower(), plan[:800]
