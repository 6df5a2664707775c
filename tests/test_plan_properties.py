"""Physical-plan pins: the properties PLANS.md documents as load-bearing
must hold in the optimized plan, not just in prose — a regression here is
a scale regression even when sf0.001 latency looks fine."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

    return QUERIES


def test_ann_brute_force_prefilters_before_exchange(spark, queries):
    """The map-side pandas top-k must sit BELOW the window's exchange —
    without it every scored candidate of a query funnels through one
    reducer."""
    import re

    plan = _plan(queries["ann_brute_force"][0](spark, SF))
    # formatted plans print the tree top-down, so "below" means a SMALLER
    # operator id: the prefilter must have a lower id than the window
    map_id = int(re.search(r"\((\d+)\) MapInPandas", plan).group(1))
    win_id = int(re.search(r"\((\d+)\) Window\b", plan).group(1))
    assert map_id < win_id, f"MapInPandas ({map_id}) must execute below Window ({win_id})"


def test_incremental_dedup_broadcasts_batch_bands(spark, queries):
    """The corpus-band join must be a broadcast hash join (batch side
    built) — a shuffled corpus would move the whole state table per
    epoch."""
    plan = _plan(queries["dedup_incremental_minhash"][0](spark, SF))
    assert "BroadcastHashJoin" in plan
    # and the corpus re-shingle is candidate-bounded via a semi join
    assert "LeftSemi" in plan


def test_lww_reduce_is_partial_aggregated(spark, queries):
    """max_by must plan as a two-phase aggregate (partial before the
    exchange) — that is what defuses hot keys at the map side."""
    plan = _plan(queries["lww_latest_event"][0](spark, SF))
    assert "partial_max_by" in plan


def test_top_orders_avoids_global_sort(spark, queries):
    plan = _plan(queries["top_orders_by_revenue"][0](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_tpch_q1_pushes_filter_to_scan(spark, queries):
    plan = _plan(queries["tpch_q1"][0](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters: [" in plan
    assert "partial_" in plan  # partial aggregation before the exchange


def test_partial_reduce_shares_one_exchange(spark):
    """reduce_latest_partial's boundary-segment window and BOTH max_by
    aggregate phases must share a single Exchange hashpartitioning(key) —
    a second shuffle would double the partial-update reduce's cost vs the
    plain LWW reduce it replaces."""
    import re

    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.operators.partial import (
        reduce_latest_partial,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    chg = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("a"),
        F.col("props").alias("b"),
    )
    plan = _plan(reduce_latest_partial(chg, cols=["a", "b"]))
    # formatted mode separates node names from arguments: count Exchange
    # NODES, then pin the one exchange to the key
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert re.search(r"Arguments: hashpartitioning\(doc_id", plan)
    assert "partial_max_by" in plan  # map-side combine still applies
    assert "Window" in plan


def test_token_dedup_probe_broadcasts_batch_fingerprints(spark, tmp_path):
    """TokenDedupState's corpus probe must be a broadcast hash join with
    the BATCH side built — shuffling the corpus fingerprint table would
    move the whole state per epoch (O(corpus) instead of O(batch))."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "tokplan"), n_buckets=4)
    e1 = spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>")
    s.apply(e1, batch_id=0)
    # build (don't execute) epoch 2's flag plan: corpus side now non-empty
    e2 = spark.createDataFrame([("b", [1, 2])], "doc_id string, tokens array<int>")
    fps = e2.select(s.fingerprint("tokens").alias("fp"), "doc_id")
    from pyspark.sql import functions as F

    corpus = s.fingerprints.read()
    probe = F.broadcast(fps).alias("n").join(
        corpus.alias("c"),
        (F.col("n.fp") == F.col("c.fp")) & (F.col("n.doc_id") != F.col("c.doc_id")),
    )
    plan = _plan(probe)
    assert "BroadcastHashJoin" in plan
    # the corpus scan must not sit under an Exchange hashpartitioning
    assert "Exchange hashpartitioning" not in plan


def test_chunk_sliding_is_map_only(spark, queries):
    """chunk_documents claims a map-only pass (row-local sequence
    explode): the optimized plan must contain NO Exchange at all."""
    plan = _plan(queries["chunk_documents"][0](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the explode itself


def test_token_vocab_partial_agg_and_takeordered(spark, queries):
    """token_vocab: the count must partial-aggregate before its single
    exchange, and the top-k must plan as TakeOrderedAndProject (heaps),
    never a global Sort of the whole vocabulary."""
    plan = _plan(queries["token_vocab"][0](spark, SF))
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count(") Exchange") == 1, plan  # numbered node, not the tree echo
