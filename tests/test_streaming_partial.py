"""Streaming wiring for partial updates: MergePipeline(placeholder_cols=)
under ChangelogTailer with a mid-stream kill + checkpoint restart must
converge to the crash-free run AND to a sequential per-key fold — the
fill-from-table path reads the pre-epoch snapshot, so a replayed epoch
must resolve placeholders identically to the first attempt (the table's
ledger no-ops the merge; the resolution feeding it is what this pins)."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.operators.partial import UNAVAILABLE
from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer

N_FILES = 6


@pytest.fixture()
def partial_changelog(tmp_path):
    """Generator changelog with lsn-deterministic placeholder injection on
    `source` (lsn-keyed so replayed duplicate events stay byte-identical
    to their originals — two same-LSN rows must never differ)."""
    from data_hub_ejp_xml_pipeline_spark.generator import (
        generate_changelog_pandas,
        write_changelog_files,
    )

    # shuffle_window=1 keeps per-key LSN order across files — the module's
    # delivery contract (a WAL tail is ordered); replayed exact duplicates
    # stay in (they land in the LAST file, stressing the stale-epoch path)
    pdf = generate_changelog_pandas(n_events=2_500, seed=23, shuffle_window=1)
    mask = (pdf["op"] == "U") & (pdf["lsn"] % 3 == 0)
    pdf.loc[mask, "source"] = UNAVAILABLE
    d = str(tmp_path / "changelog")
    write_changelog_files(pdf, d, N_FILES)
    return d, pdf


def _fold_source(pdf):
    """{doc_id: source} after a sequential per-key fold in lsn order
    (duplicated replay events are identical, so re-application is a
    no-op by construction)."""
    state: dict[str, str | None] = {}
    for r in pdf.sort_values("lsn").itertuples(index=False):
        if r.op == "D":
            state.pop(r.doc_id, None)
        elif r.op == "I":
            state[r.doc_id] = r.source
        else:
            if r.doc_id not in state:
                state[r.doc_id] = None
            if r.source != UNAVAILABLE:
                state[r.doc_id] = r.source
    return state


def _build(spark, root, **tailer_kw):
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA

    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])
    pipe = MergePipeline(
        spark, root, n_buckets=4, payload_schema=payload,
        placeholder_cols=["source"],
    )
    return pipe, ChangelogTailer(spark, pipeline=pipe, **tailer_kw)


def _sources(pipe):
    return {
        r["doc_id"]: r["source"]
        for r in pipe.final_state().select("doc_id", "source").collect()
    }


def test_streaming_partial_crash_restart_converges(
    spark, tmp_path, partial_changelog
):
    changelog_dir, pdf = partial_changelog

    pipe_ref, ref = _build(spark, str(tmp_path / "ref"))
    ref.run_to_completion(changelog_dir, str(tmp_path / "ck_ref"),
                          max_files_per_trigger=1)
    want = _fold_source(pdf)
    got_ref = _sources(pipe_ref)
    assert got_ref == want
    # the workload must actually exercise both fill paths: no sentinel may
    # survive, and some key must have resolved to a real value from an
    # earlier event despite its LAST event being a placeholder
    assert UNAVAILABLE not in set(got_ref.values())
    last_u = (
        pdf[pdf["op"] != "D"].sort_values("lsn").groupby("doc_id").last()
    )
    resolved_keys = [
        k for k, r in last_u.iterrows()
        if r["source"] == UNAVAILABLE and got_ref.get(k) is not None
    ]
    assert resolved_keys, "workload never exercised cross-event resolution"

    # crash after 2 epochs, restart from the same checkpoint
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ck_crash")
    _, crashing = _build(spark, crash_root, fail_after_batches=2)
    q = crashing.start(changelog_dir, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    pipe_c, resumed = _build(spark, crash_root)
    resumed.run_to_completion(changelog_dir, ckpt, max_files_per_trigger=1)
    assert _sources(pipe_c) == want
