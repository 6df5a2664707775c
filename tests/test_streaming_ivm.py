"""Streaming wiring for incremental view maintenance: MergePipeline
(ivm_state=) under ChangelogTailer with a mid-stream kill + checkpoint
restart. The replayed epoch's IVM replace must no-op on its ledger while
the merge applies (or vice versa), converging the totals to both a
crash-free run's AND a full GROUP BY recompute over the final base."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer

N_FILES = 6


@pytest.fixture()
def changelog_dir(tmp_path, changelog_pdf):
    from data_hub_ejp_xml_pipeline_spark.generator import write_changelog_files

    d = str(tmp_path / "changelog")
    write_changelog_files(changelog_pdf, d, N_FILES)
    return d


def _totals(ivm):
    return {r[0]: (r[1], r[2]) for r in ivm.read_totals().collect()}


def _recompute(pipe):
    return {
        r[0]: (r[1], r[2])
        for r in pipe.final_state()
        .groupBy("source")
        .agg(F.count("*").alias("cnt"), F.sum("n_tok").cast("double").alias("total"))
        .collect()
    }


def test_streaming_ivm_crash_restart_converges(spark, tmp_path, changelog_dir):
    def build(root: str, **tailer_kw):
        ivm = IncrementalAggState(
            spark, root + "/ivm", group_col="source", value_col="n_tok"
        )
        pipe = MergePipeline(spark, root + "/tbl", n_buckets=4, ivm_state=ivm)
        return ivm, pipe, ChangelogTailer(spark, pipeline=pipe, **tailer_kw)

    # crash-free reference run
    ref_ivm, ref_pipe, ref_tailer = build(str(tmp_path / "ref"))
    ref_tailer.run_to_completion(
        changelog_dir, str(tmp_path / "ckpt_ref"), max_files_per_trigger=1
    )
    assert _totals(ref_ivm) == _recompute(ref_pipe)

    # crashing run: kill after 2 epochs, restart from the SAME checkpoint
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ckpt_crash")
    _, _, crashing = build(crash_root, fail_after_batches=2)
    q = crashing.start(changelog_dir, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    ivm2, pipe2, resumed = build(crash_root)  # reopen the SAME durable state
    resumed.run_to_completion(changelog_dir, ckpt, max_files_per_trigger=1)

    assert _totals(ivm2) == _totals(ref_ivm) == _recompute(pipe2)
    assert _totals(ivm2), "workload must produce non-empty totals"
