"""Round-6 operational completeness: sidecar-state maintenance and the
pipeline-wide fsck.

1. ``MaintenancePolicy(states=[...])`` compacts files and expires
   snapshots on every table a sidecar state owns (they are ledgered
   SnapshotTables that otherwise grow forever); semantics are untouched.
2. ``MergePipeline.verify(deep=True)`` checks the cross-state invariants
   no per-table fsck can see — IVM totals vs a base recompute, SCD2 open
   versions vs base live rows, index postings vs base pairs — and a
   deliberately diverged sidecar is CAUGHT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
from data_hub_ejp_xml_pipeline_spark.plans.maintenance import MaintenancePolicy
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import (
    PAYLOAD_SCHEMA,
    MergePipeline,
)
from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import (
    SecondaryIndexState,
)


def _build(spark, tmp_path):
    root = str(tmp_path)
    scd2 = Scd2State(spark, root + "/scd2", payload_schema=PAYLOAD_SCHEMA,
                     n_buckets=2)
    ivm = IncrementalAggState(spark, root + "/ivm", group_col="source",
                              value_col="n_tok")
    idx = SecondaryIndexState(spark, root + "/idx", index_col="source",
                              n_buckets=2)
    pipe = MergePipeline(spark, root + "/tbl", n_buckets=2,
                         scd2_state=scd2, ivm_state=ivm, index_state=idx)
    return scd2, ivm, idx, pipe


def _apply_epochs(spark, pipe, changelog_pdf, n=3, policy=None):
    step = len(changelog_pdf) // n + 1
    outs = []
    for i in range(n):
        batch = spark_changelog_from_pandas(
            spark, changelog_pdf.iloc[i * step : (i + 1) * step]
        )
        pipe.apply(batch, batch_id=i)
        if policy is not None:
            outs.append(policy.run())
    return outs


def test_policy_maintains_sidecar_tables(spark, tmp_path, changelog_pdf):
    scd2, ivm, idx, pipe = _build(spark, tmp_path)
    policy = MaintenancePolicy(
        pipe.table, keep_snapshots=1,
        states=(scd2, ivm, idx),
    )
    passes = _apply_epochs(spark, pipe, changelog_pdf, policy=policy)
    # every sidecar table shows up in the pass report and had snapshots
    # expired at some point (3 epochs, keep 1)
    names = set(passes[-1]["states"])
    assert names == {"scd2_history", "ivm_totals", "index_postings"}
    for name in names:
        assert any(p["states"][name]["expired_manifests"] > 0 for p in passes), name
    # retention honored: each sidecar table keeps exactly 1 manifest-window
    for t in (scd2.history, ivm.totals, idx.postings):
        assert t.current_version() >= 1
    # and semantics are untouched — deep verify cross-checks them all
    chk = pipe.verify(deep=True)
    assert chk["ok"], chk
    assert chk["consistency"] == {
        "ivm_mismatches": 0, "scd2_mismatches": 0, "index_mismatches": 0
    }


def test_deep_verify_catches_diverged_sidecar(spark, tmp_path, changelog_pdf):
    scd2, ivm, idx, pipe = _build(spark, tmp_path)
    _apply_epochs(spark, pipe, changelog_pdf)
    assert pipe.verify(deep=True)["ok"]
    # silently corrupt the IVM totals (the bug class the inclusive-guard
    # fix closed was exactly a maintained view drifting from the base)
    poisoned = ivm.totals.read().withColumn(
        "total", F.col("total") + F.lit(1.0)
    )
    ivm.totals.replace(poisoned)
    chk = pipe.verify(deep=True)
    assert not chk["ok"]
    assert chk["consistency"]["ivm_mismatches"] > 0
    assert chk["consistency"]["scd2_mismatches"] == 0
    assert chk["consistency"]["index_mismatches"] == 0


def test_shallow_verify_covers_every_state_table(spark, tmp_path, changelog_pdf):
    scd2, ivm, idx, pipe = _build(spark, tmp_path)
    _apply_epochs(spark, pipe, changelog_pdf, n=2)
    chk = pipe.verify()
    assert chk["ok"]
    assert set(chk["states"]) == {"scd2_history", "ivm_totals", "index_postings"}
    assert "consistency" not in chk  # cross-checks are deep-only (scans)
