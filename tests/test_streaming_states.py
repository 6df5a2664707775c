"""Streaming wiring for the round-5 sidecar states: drive MergePipeline
with SCD2 history + secondary index + DLQ attached simultaneously under
ChangelogTailer with a mid-stream kill and checkpoint restart; every
durable artifact must converge to the crash-free run's. The per-module
tests pin each state's semantics; this pins the combined foreachBatch
wiring and the cross-state crash window (some states' epoch commits land
before the base merge's — replay must no-op exactly the committed ones)."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer

N_FILES = 6


@pytest.fixture()
def dirty_changelog_dir(tmp_path):
    from data_hub_ejp_xml_pipeline_spark.generator import write_changelog_files
    from tests.test_dlq import _dirty_pdf

    d = str(tmp_path / "changelog")
    write_changelog_files(_dirty_pdf(n_events=2_500, seed=41), d, N_FILES)
    return d


def _freeze(row):
    return tuple(tuple(v) if isinstance(v, list) else v for v in row)


def _history_rows(scd2):
    return {_freeze(r) for r in scd2.read_history().collect()}


def _index_rows(idx):
    return {tuple(r) for r in idx.postings.read().drop("_deleted").collect()}


def _dlq_rows(dlq):
    return {
        (r.reject_reason, r.epoch, r.lsn, r.doc_id, r.op)
        for r in dlq.read().collect()
    }


def _final_rows(pipe):
    return {_freeze(r) for r in pipe.final_state().collect()}


def test_streaming_all_states_crash_restart_converges(
    spark, tmp_path, dirty_changelog_dir
):
    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
    from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import (
        SecondaryIndexState,
    )
    from data_hub_ejp_xml_pipeline_spark.schemas import CHANGELOG_SCHEMA, TARGET_SCHEMA
    from pyspark.sql import types as T

    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])

    def build(root: str, **tailer_kw):
        scd2 = Scd2State(spark, root + "/scd2", payload_schema=payload,
                         n_buckets=4)
        idx = SecondaryIndexState(spark, root + "/idx", index_col="source",
                                  n_buckets=4)
        dlq = DlqState(spark, root + "/dlq", payload_schema=CHANGELOG_SCHEMA,
                       n_buckets=4)
        pipe = MergePipeline(spark, root + "/tbl", n_buckets=4,
                             scd2_state=scd2, index_state=idx, dlq_state=dlq)
        return (scd2, idx, dlq, pipe), ChangelogTailer(spark, pipeline=pipe,
                                                       **tailer_kw)

    # crash-free reference run
    (scd2_r, idx_r, dlq_r, pipe_r), ref_tailer = build(str(tmp_path / "ref"))
    ref_tailer.run_to_completion(dirty_changelog_dir, str(tmp_path / "ck_ref"),
                                 max_files_per_trigger=1)

    # crashing run: kill after 2 epochs, restart from the SAME checkpoint
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ck_crash")
    _, crashing = build(crash_root, fail_after_batches=2)
    q = crashing.start(dirty_changelog_dir, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    (scd2_c, idx_c, dlq_c, pipe_c), resumed = build(crash_root)
    resumed.run_to_completion(dirty_changelog_dir, ckpt,
                              max_files_per_trigger=1)

    assert _final_rows(pipe_c) == _final_rows(pipe_r)
    assert _history_rows(scd2_c) == _history_rows(scd2_r)
    assert _index_rows(idx_c) == _index_rows(idx_r)
    assert _dlq_rows(dlq_c) == _dlq_rows(dlq_r)
    # the workload must actually exercise every artifact
    assert _dlq_rows(dlq_r), "dirty changelog must produce rejects"
    assert scd2_r.read_history().filter("NOT is_current").count() > 0, \
        "multi-epoch updates must close history versions"
    assert idx_r.postings.read().filter("tombstone").count() > 0, \
        "value churn must produce index tombstones"
