"""Fused profile mode: the concurrent stats/lineage job must be
observationally identical to the synchronous pre-pass — same final state,
same lineage sidecar, same commit metadata — across multi-batch apply,
empty batches, and schema evolution (SnapshotTable.merge profile_mode)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.oracle import (
    assert_final_state_equal,
    expected_final_state_pandas,
)
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

PAYLOAD_SCHEMA = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])


def _apply_batches(spark, root, changelog_pdf, profile_mode, n_batches=3):
    pipe = MergePipeline(
        spark, root, n_buckets=8, files_per_bucket=2, profile_mode=profile_mode
    )
    n = len(changelog_pdf)
    step = n // n_batches + 1
    for i in range(n_batches):
        batch = spark_changelog_from_pandas(
            spark, changelog_pdf.iloc[i * step : (i + 1) * step]
        )
        res = pipe.apply(batch, batch_id=i)
        assert res.applied
    return pipe


def test_fused_matches_pre_end_to_end(spark, tmp_path, changelog_pdf):
    """Same changelog through both modes → identical final state, identical
    per-file lineage, identical per-commit n_events."""
    pre = _apply_batches(spark, str(tmp_path / "pre"), changelog_pdf, "pre")
    fus = _apply_batches(spark, str(tmp_path / "fused"), changelog_pdf, "fused")

    cols = ["doc_id", "tokens", "n_tok", "source", "_lsn"]
    a = fus.final_state().select(cols).toPandas()
    e = pre.final_state().select(cols).toPandas()
    assert_final_state_equal(a, e)
    assert_final_state_equal(a, expected_final_state_pandas(changelog_pdf))

    def lineage_key(t):
        return sorted(
            (r["source_file"], r["offset_min"], r["offset_max"], r["n_events"])
            for r in t.table.lineage()
        )

    assert lineage_key(fus) == lineage_key(pre)
    # commit metadata parity: same operation and event counts per version
    for v in range(1, pre.table.current_version() + 1):
        mp, mf = pre.table.manifest(v), fus.table.manifest(v)
        assert mp["operation"] == mf["operation"]


def test_fused_empty_batch_is_a_no_op(spark, tmp_path, changelog_pdf):
    """An empty batch in fused (touch-all) mode must NOT rewrite the table
    or advance the version — the isEmpty guard stands in for the pre-pass
    count."""
    pipe = _apply_batches(spark, str(tmp_path / "t"), changelog_pdf, "fused", 2)
    v_before = pipe.table.current_version()
    empty = spark_changelog_from_pandas(spark, changelog_pdf.iloc[0:0])
    res = pipe.apply(empty, batch_id=99)
    assert not res.applied and res.n_events == 0
    assert pipe.table.current_version() == v_before


def test_fused_schema_evolution_and_exactly_once(spark, tmp_path, changelog_pdf):
    """Evolution batch (new payload column) + replayed batch id under fused
    mode behave exactly as in pre mode."""
    root = str(tmp_path / "t")
    pipe = _apply_batches(spark, root, changelog_pdf, "fused", 2)

    evolved = (
        spark_changelog_from_pandas(spark, changelog_pdf.iloc[:500])
        .withColumn("quality", F.length("doc_id").cast("double"))
    )
    table = SnapshotTable(spark, root)
    res = table.merge(
        reduce_latest(evolved), batch_id=2, stats_df=evolved, profile_mode="fused"
    )
    assert res.applied
    assert "+evolve" in table.manifest()["operation"]
    assert "quality" in table.read().columns

    # replay of an applied epoch: metadata no-op before any job runs
    replay = table.merge(
        reduce_latest(evolved), batch_id=2, stats_df=evolved, profile_mode="fused"
    )
    assert not replay.applied


def test_fused_profile_failure_leaves_no_visible_snapshot(spark, tmp_path):
    """If the concurrent profile job fails, the commit must abort before
    the manifest write — no new version, orphan files only."""
    root = str(tmp_path / "t")
    table = SnapshotTable.create(spark, root, PAYLOAD_SCHEMA, n_buckets=4)
    good = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b"],
                "tokens": [[1, 2], [3]],
                "n_tok": [2, 1],
                "source": ["s", "s"],
                "op": ["U", "U"],
                "lsn": [1, 2],
            }
        )
    )
    # stats_df whose evaluation raises AFTER the isEmpty probe passes: an
    # ANSI divide-by-zero only on the second row, which the limit-1 probe
    # never evaluates but the full profile aggregation must
    bad_stats = good.withColumn(
        "offset",
        (F.lit(1) / F.when(F.col("lsn") == 2, F.lit(0)).otherwise(F.lit(1))).cast("long"),
    ).withColumn("source_file", F.lit("f"))
    import pytest

    with pytest.raises(Exception):
        table.merge(good, batch_id=0, stats_df=bad_stats, profile_mode="fused")
    assert table.current_version() == 0
