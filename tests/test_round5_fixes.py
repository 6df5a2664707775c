"""Round-5 hardening pins: atomic compaction replay safety, injective
token fingerprints, O(1) replay version lookup (survives snapshot
expiry), provider-drift detection, auto probe-broadcast, ANN index
serve-path schema, and syntactic validity of every Iceberg SQL statement
the adapter can emit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------- replace()
def test_replace_is_one_atomic_ledgered_commit(spark, tmp_path):
    """replace() = truncate+append fused: one version hop, only the new
    files referenced, and a replayed batch_id no-ops the WHOLE rewrite
    (the old truncate-then-append sequence re-applied the truncate while
    the append no-opped — silently emptying the table)."""
    from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField("doc_id", T.StringType()),
                      T.StructField("v", T.IntegerType())]),
        n_buckets=2,
    )
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, v int"),
             batch_id=0)
    v_before = t.current_version()
    res = t.replace(
        spark.createDataFrame([("a", 9)], "doc_id string, v int"), batch_id=7
    )
    assert res.applied and t.current_version() == v_before + 1
    assert [(r.doc_id, r.v) for r in t.read().collect()] == [("a", 9)]
    # replay: the rewrite no-ops as a unit — data survives untouched
    res2 = t.replace(
        spark.createDataFrame([("z", 0)], "doc_id string, v int"), batch_id=7
    )
    assert not res2.applied
    assert [(r.doc_id, r.v) for r in t.read().collect()] == [("a", 9)]


def test_compact_latest_replay_never_empties_state(spark, tmp_path):
    """The ADVICE crash scenario: compact once, then replay the SAME
    maintenance batch_id (as a crash-recovery driver would). The state
    must stay intact — the pre-fix truncate-first sequence emptied it."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "tok"), n_buckets=2)
    s.apply(spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>"),
            batch_id=0)
    s.apply(spark.createDataFrame([("a", [1, 3])], "doc_id string, tokens array<int>"),
            batch_id=1)
    s.compact_latest(batch_id=100)
    rows = {(r.doc_id, r.fp) for r in s.fingerprints.read().collect()}
    assert len(rows) == 1  # compacted to the latest fingerprint of doc a
    s.compact_latest(batch_id=100)  # replay of the maintenance epoch
    assert {(r.doc_id, r.fp) for r in s.fingerprints.read().collect()} == rows
    # and the compacted state still attracts flags
    flags = s.apply(
        spark.createDataFrame([("b", [1, 3])], "doc_id string, tokens array<int>"),
        batch_id=2,
    )
    assert {(r.new_doc, r.matched_doc) for r in flags.collect()} == {("b", "a")}


# --------------------------------------------------- injective fingerprints
def test_token_fingerprint_is_injective(spark, tmp_path):
    """["a,b"] vs ["a","b"] and [x] vs [x,null] must fingerprint apart —
    the old comma-join folded both pairs together (ADVICE)."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "inj"), n_buckets=2)
    df = spark.createDataFrame(
        [(["a,b"],), (["a", "b"],), (["x"],), (["x", None],)],
        "tokens array<string>",
    )
    fps = [r.f for r in df.select(s.fingerprint("tokens").alias("f")).collect()]
    assert len(set(fps)) == 4


# ------------------------------------------- O(1) replay + expiry survival
def test_version_before_is_o1_from_ledger_pre_versions(spark, tmp_path):
    """The manifest records each ledgered epoch's pre-commit version, so
    replay needs ONE manifest read — not a walk over the version chain
    (which breaks after expire_snapshots removes old manifests)."""
    from data_hub_ejp_xml_pipeline_spark.plans import dedup_ingest
    from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

    t = SnapshotTable.create(
        spark, str(tmp_path / "pv"),
        T.StructType([T.StructField("doc_id", T.StringType())]), n_buckets=2,
    )
    for b in range(3):
        t.append(spark.createDataFrame([(f"d{b}",)], "doc_id string"), batch_id=b)
    calls = []
    orig = SnapshotTable.manifest

    def counting(self, version=None):
        calls.append(version)
        return orig(self, version)

    SnapshotTable.manifest = counting
    try:
        assert dedup_ingest._version_before(t, 1) == 1  # applied at v2
    finally:
        SnapshotTable.manifest = orig
    assert len(calls) == 1, f"expected one manifest read, saw {calls}"


def test_token_dedup_replay_survives_snapshot_expiry(spark, tmp_path):
    """Replay of an old epoch after expire(keep_last=1) has reclaimed its
    pre-epoch manifests: the durable flags are returned (the epoch is
    provably applied) instead of a FileNotFoundError mid-walk (ADVICE)."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "exp"), n_buckets=2)
    e1 = spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>")
    e2 = spark.createDataFrame([("b", [1, 2])], "doc_id string, tokens array<int>")
    s.apply(e1, batch_id=0)
    orig = {(r.new_doc, r.matched_doc) for r in s.apply(e2, batch_id=1).collect()}
    assert orig == {("b", "a")}
    s.expire(keep_last=1)
    replay = {(r.new_doc, r.matched_doc) for r in s.apply(e2, batch_id=1).collect()}
    assert replay == orig
    assert s.fingerprints.read().count() == 2  # no state growth


def test_minhash_state_replay_survives_snapshot_expiry(spark, tmp_path):
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import DedupIngestState

    s = DedupIngestState(spark, str(tmp_path / "mh"), threshold=0.5,
                         n_hashes=6, band_size=2, k=2, n_buckets=2)
    text = "the quick brown fox jumps over the lazy dog again and again"
    e1 = spark.createDataFrame([("a", text)], "doc_id string, text string")
    e2 = spark.createDataFrame([("b", text)], "doc_id string, text string")
    s.apply(e1, batch_id=0)
    orig = {(r.new_doc, r.matched_doc) for r in s.apply(e2, batch_id=1).collect()}
    assert orig == {("b", "a")}
    s.expire(keep_last=1)
    replay = {(r.new_doc, r.matched_doc) for r in s.apply(e2, batch_id=1).collect()}
    assert replay == orig


# ------------------------------------------------- provider drift detection
def test_docs_provider_drift_detection(spark, tmp_path):
    """Provider mode stores md5(text) at append time; a replayed epoch
    compares the provider's CURRENT hashes against them — drifted text is
    surfaced (count + ids), unchanged text reports zero."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import DedupIngestState

    corpus = {"a": "the quick brown fox jumps over the lazy dog today"}

    def provider():
        return spark.createDataFrame(list(corpus.items()),
                                     "doc_id string, text string")

    s = DedupIngestState(spark, str(tmp_path / "drift"), threshold=0.5,
                         n_hashes=6, band_size=2, k=2, n_buckets=2,
                         docs_provider=provider)
    e1 = provider()
    s.apply(e1, batch_id=0)
    assert s.last_replay_drift_count == 0

    # replay with UNCHANGED provider text: zero drift
    s.apply(e1, batch_id=0)
    assert s.last_replay_drift_count == 0

    # mutate the provider's text, replay again: drift surfaced, not fatal
    corpus["a"] = "completely different text now"
    s.apply(e1, batch_id=0)
    assert s.last_replay_drift_count == 1
    assert [r.doc_id for r in s.last_replay_drift.collect()] == ["a"]


# ------------------------------------------------------ auto probe broadcast
def test_probe_broadcast_auto_flips_on_batch_size(spark, tmp_path):
    """probe_broadcast=None derives the join shape per epoch from the
    batch's fingerprint count vs the documented key budget; an explicit
    bool is always honored."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "auto"), n_buckets=2)
    assert s.probe_broadcast is None  # auto is the default
    s.apply(spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>"),
            batch_id=0)
    corpus = s.fingerprints.read()
    fps = (
        spark.createDataFrame([("b", [1])], "doc_id string, tokens array<int>")
        .select(s.fingerprint("tokens").alias("fp"), "doc_id")
    )

    def analyzed(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    # under the budget → broadcast hint present; over it → absent
    assert "broadcast" in analyzed(s._candidate_flags(fps, corpus, True)).lower()
    assert "broadcast" not in analyzed(s._candidate_flags(fps, corpus, False)).lower()

    # the auto decision flips at the class budget
    s.probe_broadcast_max_keys = 0
    flags = s.apply(
        spark.createDataFrame([("b", [1])], "doc_id string, tokens array<int>"),
        batch_id=1,
    )
    assert {(r.new_doc, r.matched_doc) for r in flags.collect()} == {("b", "a")}


def test_token_dedup_probe_plan_has_no_corpus_exchange(spark, tmp_path):
    """VERDICT pin: the dedup probe's PHYSICAL plan must broadcast the
    batch side and never put an Exchange on the corpus scan — a future
    edit reintroducing a corpus shuffle fails here, not at 100 TB."""
    import io
    from contextlib import redirect_stdout

    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    s = TokenDedupState(spark, str(tmp_path / "noex"), n_buckets=2)
    s.apply(spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>"),
            batch_id=0)
    fps = (
        spark.createDataFrame([("b", [1])], "doc_id string, tokens array<int>")
        .select(s.fingerprint("tokens").alias("fp"), "doc_id")
        .filter(F.col("fp").isNotNull())
    )
    plan_df = s._candidate_flags(fps, s.fingerprints.read(), True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------- ANN index serve
def test_ann_index_untrained_query_raises(spark, tmp_path):
    from data_hub_ejp_xml_pipeline_spark.plans.ann_index import IvfIndexState

    idx = IvfIndexState(spark, str(tmp_path / "ivf0"), n_centroids=2, n_buckets=2)
    q = spark.createDataFrame([(1, [1.0, 0.0])], "query_id long, qe array<double>")
    with pytest.raises(RuntimeError, match="train"):
        idx.query(q)


def test_ann_index_empty_query_schema_matches_nonempty(spark, tmp_path):
    """The empty-probe short-circuit must return the SAME schema as the
    served path (neighbor_id string, query_id in the caller's type) so
    unions across the two branches never mismatch (ADVICE)."""
    from data_hub_ejp_xml_pipeline_spark.plans.ann_index import IvfIndexState

    idx = IvfIndexState(spark, str(tmp_path / "ivf1"), n_centroids=2, n_buckets=2)
    corpus = spark.createDataFrame(
        [(str(i), [float(i % 2), float((i + 1) % 2)]) for i in range(8)],
        "vec_id string, embedding array<float>",
    )
    idx.train(corpus)
    idx.apply(corpus, batch_id=0)
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, qe array<double>"
    )
    served = idx.query(queries, k=2)
    empty = idx.query(queries.limit(0), k=2)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in served.schema.fields
    ]
    assert served.unionByName(empty).count() == served.count()


# ------------------------------------------------------------ MOR guard pin
def test_mor_apply_requires_batch_id(spark, tmp_path, changelog_df):
    """batch_id=None must be refused before any state mutation — a
    replayed id-less epoch would double-append fingerprints (ADVICE)."""
    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    pipe = MorPipeline(spark, str(tmp_path / "mor"), n_buckets=2)
    with pytest.raises(ValueError, match="batch_id"):
        pipe.apply(changelog_df.limit(10), batch_id=None)


# ------------------------------------------------- Iceberg SQL is parseable
def test_every_iceberg_statement_parses(spark):
    """Round-trip every statement the adapter can emit through Spark's
    SQL parser — golden strings pin bytes, the parser pins GRAMMAR (a
    pinned typo would otherwise live forever). Covers create (incl. the
    tombstone columns), merge, evolution add+widen, and vacuum."""
    from data_hub_ejp_xml_pipeline_spark.table import iceberg_adapter as ia

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    wider = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.LongType()),          # int → bigint widen
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),          # added column
        T.StructField("score", T.DoubleType()),         # added column
    ])
    stmts = [
        ia.create_table_sql("cat.db.seq", schema, key="doc_id", n_buckets=32),
        ia.merge_sql("cat.db.seq", ["doc_id", "tokens", "n_tok", "source"]),
        *ia.evolution_sql("cat.db.seq", schema, wider),
        ia.vacuum_sql("cat.db.seq", 123456789),
        ia.delete_where_sql("cat.db.seq", "n_tok >= 100"),
        ia.delete_where_sql("cat.db.seq", "n_tok >= 100", hard=True),
        ia.update_where_sql("cat.db.seq", "source = 'bad'",
                            {"source": "concat(source, '-fixed')"}),
    ]
    assert len(stmts) >= 5  # create, merge, add, widen, vacuum
    parser = spark._jsparkSession.sessionState().sqlParser()
    for sql in stmts:
        parser.parsePlan(sql)  # raises ParseException on bad grammar
