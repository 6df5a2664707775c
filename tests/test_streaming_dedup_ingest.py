"""Streaming wiring for the ingest-state modules: drive TokenDedupState
(through MorPipeline) and IvfIndexState (as a duck-typed pipeline) under
ChangelogTailer with a mid-stream kill and checkpoint restart, and assert
the durable state — fingerprints, flags, inverted lists, base table —
converges to a crash-free run's. The partition-invariance property pins
the SEMANTICS; this pins the foreachBatch wiring (VERDICT r4 #6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer

N_FILES = 6


@pytest.fixture()
def changelog_dir(tmp_path, changelog_pdf):
    from data_hub_ejp_xml_pipeline_spark.generator import write_changelog_files

    d = str(tmp_path / "changelog")
    write_changelog_files(changelog_pdf, d, N_FILES)
    return d


def _fp_rows(state):
    return {(r.doc_id, r.fp, r._lsn) for r in state.fingerprints.read().collect()}


def _flag_rows(state):
    return {
        (r.new_doc, r.matched_doc, r.fp, r.matched_in, r.epoch)
        for r in state.flags.read().collect()
    }


def test_streaming_token_dedup_crash_restart_converges(
    spark, tmp_path, changelog_dir
):
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState
    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    def build(root: str, **tailer_kw):
        # prefix_k=1: the generator draws tokens from a 50k vocab, so only
        # a single-token prefix yields birthday collisions at test scale —
        # the point here is flag traffic through the stream, not recall
        state = TokenDedupState(spark, root + "/ds", prefix_k=1, n_buckets=4)
        pipe = MorPipeline(spark, root + "/mor", n_buckets=4, k_compact=3,
                           dedup_state=state)
        return state, ChangelogTailer(spark, pipeline=pipe, **tailer_kw)

    # crash-free reference run
    ref_root = str(tmp_path / "ref")
    ref_state, ref_tailer = build(ref_root)
    ref_tailer.run_to_completion(changelog_dir, str(tmp_path / "ckpt_ref"),
                                 max_files_per_trigger=1)

    # crashing run: kill after 2 epochs, restart from the SAME checkpoint
    # (Spark re-delivers the failed epoch with the same id + files)
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ckpt_crash")
    _, crashing = build(crash_root, fail_after_batches=2)
    q = crashing.start(changelog_dir, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    state2, resumed = build(crash_root)  # reopen the SAME durable state
    resumed.run_to_completion(changelog_dir, ckpt, max_files_per_trigger=1)

    assert _fp_rows(state2) == _fp_rows(ref_state)
    assert _flag_rows(state2) == _flag_rows(ref_state)
    assert _flag_rows(state2), "workload must actually produce dup flags"


class _IvfIngest:
    """Duck-typed tailer pipeline: deterministic per-event embeddings →
    IvfIndexState epoch appends (train frozen on the first epoch)."""

    def __init__(self, spark, root: str):
        from data_hub_ejp_xml_pipeline_spark.plans.ann_index import IvfIndexState

        self.state = IvfIndexState(spark, root, n_centroids=4, n_buckets=4)

    def _vecs(self, batch_df):
        return batch_df.select(
            F.concat_ws("-", "doc_id", F.col("lsn").cast("string")).alias("vec_id"),
            F.array(
                (F.pmod(F.xxhash64("doc_id"), F.lit(97)) / 97.0).cast("float"),
                (F.pmod(F.xxhash64("lsn"), F.lit(89)) / 89.0).cast("float"),
            ).alias("embedding"),
        )

    def apply(self, batch_df, batch_id: int):
        vecs = self._vecs(batch_df)
        if not self.state.trained:
            self.state.train(vecs)  # idempotent freeze — replay cannot move
        return self.state.apply(vecs, batch_id=batch_id)


def test_streaming_ivf_index_crash_restart_converges(spark, tmp_path, changelog_dir):
    def run(root: str, ckpt: str, crash: bool):
        pipe = _IvfIngest(spark, root)
        if crash:
            t = ChangelogTailer(spark, pipeline=pipe, fail_after_batches=2,
                                metrics_path=root + "/metrics.jsonl")
            q = t.start(changelog_dir, ckpt, max_files_per_trigger=1)
            with pytest.raises(Exception):
                q.awaitTermination()
            pipe = _IvfIngest(spark, root)  # reopen durable state
        ChangelogTailer(spark, pipeline=pipe,
                        metrics_path=root + "/metrics.jsonl").run_to_completion(
            changelog_dir, ckpt, max_files_per_trigger=1)
        return pipe.state

    ref = run(str(tmp_path / "ivf_ref"), str(tmp_path / "ck_ref"), crash=False)
    got = run(str(tmp_path / "ivf_crash"), str(tmp_path / "ck_crash"), crash=True)

    def rows(state):
        return {(r.cid, r.vec_id) for r in state.lists.read().collect()}

    def cents(state):
        return {(r.cid, tuple(round(x, 9) for x in r.centroid))
                for r in state.centroids.read().collect()}

    assert cents(got) == cents(ref)
    assert rows(got) == rows(ref)
    assert len(rows(got)) > 0
    # and the served path works off the streamed state
    q = spark.createDataFrame([("q", [0.5, 0.5])], "query_id string, qe array<double>")
    assert got.query(q, k=3).count() == 3
