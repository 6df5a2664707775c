"""Dedup-on-ingest: persisted band state, exactly-once flags, crash
convergence, and the EntityPipeline hookup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import DedupIngestState

BASE = "the quick brown fox jumps over the lazy dog by the river bank"
OTHER = "completely different text about cooking pasta at home this evening ok"
THIRD = "yet another unrelated sentence mentioning satellites orbiting saturn forever"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_two_epochs_flag_via_persisted_state(spark, tmp_path):
    """Epoch 2's near-dups against epoch 1 are found through the PERSISTED
    band state — including after reopening the state from disk (a fresh
    process), which a function-level corpus recompute could not do."""
    root = str(tmp_path / "state")
    s1 = DedupIngestState(spark, root, n_buckets=4)
    f1 = s1.apply(_docs(spark, [("a", BASE), ("b", OTHER)]), batch_id=0)
    assert f1.count() == 0  # nothing similar within epoch 1

    # fresh open — only the durable tables carry the corpus forward
    s2 = DedupIngestState(spark, root, n_buckets=4)
    f2 = s2.apply(
        _docs(spark, [("c", BASE), ("d", THIRD), ("e", BASE)]), batch_id=1
    ).collect()
    got = {(r.new_doc, r.matched_doc): (r.matched_in, r.jaccard, r.epoch) for r in f2}
    assert got[("c", "a")] == ("corpus", 1.0, 1)  # via persisted epoch-1 state
    assert got[("e", "a")] == ("corpus", 1.0, 1)
    assert got[("e", "c")] == ("batch", 1.0, 1)   # earlier doc of same epoch
    assert not any(n == "d" for (n, _) in got)

    # the flags TABLE holds exactly what apply returned, tagged by epoch
    durable = {(r.new_doc, r.matched_doc, r.epoch) for r in s2.all_flags().collect()}
    assert durable == {("c", "a", 1), ("e", "a", 1), ("e", "c", 1)}
    assert {r.doc_id for r in s2.flagged_doc_ids().collect()} == {"c", "e"}


def test_replayed_epoch_is_noop_and_deterministic(spark, tmp_path):
    root = str(tmp_path / "replay")
    s = DedupIngestState(spark, root, n_buckets=4)
    s.apply(_docs(spark, [("a", BASE)]), batch_id=0)
    first = sorted(map(tuple, s.apply(
        _docs(spark, [("b", BASE)]), batch_id=1).collect()))
    n_bands = s.bands.read().count()
    n_flags = s.flags.read().count()

    replay = sorted(map(tuple, s.apply(
        _docs(spark, [("b", BASE)]), batch_id=1).collect()))
    assert replay == first                      # same flags recomputed
    assert s.bands.read().count() == n_bands    # no duplicate state rows
    assert s.flags.read().count() == n_flags    # no duplicate emission


def test_crash_between_state_append_and_flag_emit_converges(spark, tmp_path):
    """Crash window: bands appended, flags append never ran. The replay
    must (a) not re-append bands, (b) compute flags against the PRE-epoch
    corpus (else the batch would 'corpus'-match its own bands), and
    (c) emit exactly the flags a crash-free run would have."""
    root = str(tmp_path / "crash")
    clean_root = str(tmp_path / "clean")
    e1 = [("a", BASE), ("b", OTHER)]
    e2 = [("c", BASE), ("e", BASE)]

    clean = DedupIngestState(spark, clean_root, n_buckets=4)
    clean.apply(_docs(spark, e1), batch_id=0)
    clean.apply(_docs(spark, e2), batch_id=1)
    expected = sorted(map(tuple, clean.all_flags().collect()))

    s = DedupIngestState(spark, root, n_buckets=4)
    s.apply(_docs(spark, e1), batch_id=0)
    # crash: band append succeeds, flag append raises
    real_append = s.flags.append
    s.flags.append = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError, match="crash"):
        s.apply(_docs(spark, e2), batch_id=1)
    assert "1" in s.bands.ledger()      # the crash window is real
    assert "1" not in s.flags.ledger()
    s.flags.append = real_append

    s2 = DedupIngestState(spark, root, n_buckets=4)  # restart
    s2.apply(_docs(spark, e2), batch_id=1)
    assert sorted(map(tuple, s2.all_flags().collect())) == expected
    assert s2.bands.read().count() == clean.bands.read().count()


def test_docs_provider_mode_keeps_text_stored_once(spark, tmp_path):
    """With docs_provider= the state keeps NO docs table; the verify
    re-shingles matched docs from the caller's corpus table."""
    corpus = _docs(spark, [("a", BASE), ("b", OTHER)])
    s = DedupIngestState(
        spark, str(tmp_path / "prov"), n_buckets=4, docs_provider=lambda: corpus
    )
    assert s.docs is None
    s.apply(corpus, batch_id=0)
    flags = s.apply(_docs(spark, [("c", BASE)]), batch_id=1).collect()
    assert {(r.new_doc, r.matched_doc) for r in flags} == {("c", "a")}


def test_entity_pipeline_dedup_on_ingest(spark, tmp_path):
    """The EntityPipeline hookup: two streamed epochs, epoch 2's payload
    near-dup of an epoch-1 doc is flagged via the persisted state; deleted
    docs never enter the corpus."""
    from data_hub_ejp_xml_pipeline_spark.config import PipelineConfig
    from data_hub_ejp_xml_pipeline_spark.plans.entity_pipeline import EntityPipeline

    cfg = PipelineConfig.from_dict(
        {"zipPath": str(tmp_path / "zips"),
         "warehouseRoot": str(tmp_path / "wh")},
        deployment_env="test",
    )
    state = DedupIngestState(spark, str(tmp_path / "dstate"), n_buckets=4)
    pipe = EntityPipeline(spark, cfg, n_buckets=4, dedup_state=state)

    payload = '{"name": "' + BASE + '"}'
    rows1 = [
        (1, "U", "p1", payload, "2024-01-01T00:00:00Z", "person", "f1.zip", 0),
        (2, "U", "p2", '{"name": "' + OTHER + '"}', "2024-01-01T00:00:00Z",
         "person", "f1.zip", 1),
        (3, "D", "p3", payload, "2024-01-01T00:00:00Z", "person", "f1.zip", 2),
    ]
    rows2 = [
        (4, "U", "m1", payload, "2024-01-02T00:00:00Z", "manuscript", "f2.zip", 0),
    ]
    schema = ("lsn long, op string, doc_id string, payload string, "
              "modified_timestamp string, source string, source_file string, "
              "offset long")
    pipe.apply(spark.createDataFrame(rows1, schema), batch_id=0)
    pipe.apply(spark.createDataFrame(rows2, schema), batch_id=1)

    flags = {(r.new_doc, r.matched_doc, r.epoch)
             for r in state.all_flags().collect()}
    assert flags == {("m1", "p1", 1)}  # cross-epoch near-dup, p3 (deleted) absent
    corpus_ids = {r.doc_id for r in state.docs.read().collect()}
    assert "p3" not in corpus_ids

    with pytest.raises(ValueError, match="batch_id"):
        pipe.apply(spark.createDataFrame(rows2, schema))
