"""SCD Type-2 history state: open/close/delete/reopen semantics,
exactly-once replay, stale-guard parity with the base merge, as-of
reads, and state identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, val string"
    )


@pytest.fixture()
def pipe(spark, tmp_path):
    scd2 = Scd2State(spark, str(tmp_path / "scd2"), payload_schema=PAYLOAD,
                     key="doc_id", n_buckets=2)
    p = MergePipeline(
        spark, str(tmp_path / "tbl"), key="doc_id", n_buckets=2,
        payload_schema=PAYLOAD, scd2_state=scd2,
    )
    return p, scd2


def _hist(scd2):
    rows = scd2.read_history().collect()
    return sorted(
        (r.doc_id, r.valid_from_lsn, r.valid_to_lsn, r.is_current, r.val)
        for r in rows
    )


def test_open_close_delete_reopen(spark, pipe):
    p, scd2 = pipe
    p.apply(_batch(spark, [(1, "U", "k1", "a"), (2, "U", "k2", "x")]), batch_id=0)
    p.apply(_batch(spark, [(10, "U", "k1", "b"), (11, "D", "k2", None)]), batch_id=1)
    p.apply(_batch(spark, [(20, "U", "k2", "y")]), batch_id=2)
    assert _hist(scd2) == [
        ("k1", 1, 10, False, "a"),
        ("k1", 10, None, True, "b"),
        ("k2", 2, 11, False, "x"),   # closed by the delete, no open row
        ("k2", 20, None, True, "y"),  # reborn after the delete
    ]
    # current view equals the base table's live rows
    cur = {(r.doc_id, r.val) for r in scd2.read_current().collect()}
    base = {(r.doc_id, r.val) for r in p.final_state().collect()}
    assert cur == base == {("k1", "b"), ("k2", "y")}


def test_as_of_reads(spark, pipe):
    p, scd2 = pipe
    p.apply(_batch(spark, [(1, "U", "k1", "a"), (2, "U", "k2", "x")]), batch_id=0)
    p.apply(_batch(spark, [(10, "U", "k1", "b"), (11, "D", "k2", None)]), batch_id=1)
    at5 = {(r.doc_id, r.val) for r in scd2.read_as_of(5).collect()}
    assert at5 == {("k1", "a"), ("k2", "x")}
    at10 = {(r.doc_id, r.val) for r in scd2.read_as_of(10).collect()}
    assert at10 == {("k1", "b"), ("k2", "x")}  # k2 not deleted until 11
    at11 = {(r.doc_id, r.val) for r in scd2.read_as_of(11).collect()}
    assert at11 == {("k1", "b")}  # valid_to is exclusive: the delete lands


def test_intra_epoch_reduce_one_version(spark, pipe):
    """Only the epoch's LWW winner versions; intermediates leave no row."""
    p, scd2 = pipe
    p.apply(
        _batch(spark, [(1, "U", "k1", "a"), (2, "U", "k1", "b"), (3, "U", "k1", "c")]),
        batch_id=0,
    )
    assert _hist(scd2) == [("k1", 3, None, True, "c")]


def test_replay_is_noop(spark, pipe):
    p, scd2 = pipe
    b0 = _batch(spark, [(1, "U", "k1", "a")])
    b1 = _batch(spark, [(10, "U", "k1", "b")])
    p.apply(b0, batch_id=0)
    p.apply(b1, batch_id=1)
    before = _hist(scd2)
    p.apply(b1, batch_id=1)  # replayed epoch: ledger no-ops on both tables
    p.apply(b0, batch_id=0)
    assert _hist(scd2) == before


def test_stale_winner_writes_no_history(spark, pipe):
    """A batch winner the base merge ignores (lsn <= stored) must not
    open, close, or resurrect anything — guard parity with the merge."""
    p, scd2 = pipe
    p.apply(_batch(spark, [(10, "U", "k1", "b")]), batch_id=0)
    p.apply(_batch(spark, [(5, "U", "k1", "stale")]), batch_id=1)
    assert _hist(scd2) == [("k1", 10, None, True, "b")]
    # stale update against a DELETED key: tombstone lsn still guards
    p.apply(_batch(spark, [(20, "D", "k1", None)]), batch_id=2)
    p.apply(_batch(spark, [(15, "U", "k1", "zombie")]), batch_id=3)
    assert _hist(scd2) == [("k1", 10, 20, False, "b")]


def test_delete_unseen_key_is_noop(spark, pipe):
    p, scd2 = pipe
    p.apply(_batch(spark, [(1, "D", "ghost", None)]), batch_id=0)
    assert _hist(scd2) == []


def test_requires_batch_id(spark, pipe):
    p, _ = pipe
    with pytest.raises(ValueError, match="batch_id"):
        p.apply(_batch(spark, [(1, "U", "k1", "a")]))


def test_state_identity_conflicting_schema_raises(spark, tmp_path):
    root = str(tmp_path / "scd2")
    Scd2State(spark, root, payload_schema=PAYLOAD, key="doc_id")
    other = T.StructType([T.StructField("doc_id", T.StringType()),
                          T.StructField("other", T.LongType())])
    with pytest.raises(ValueError, match="payload schema"):
        Scd2State(spark, root, payload_schema=other, key="doc_id")
    # reopen without arguments adopts the stored identity
    adopted = Scd2State(spark, root)
    assert adopted.payload_cols == ["val"]


def test_epoch_split_matches_one_shot_winners(spark, tmp_path, changelog_df):
    """Property vs an independent in-Spark derivation: history rows ==
    winner-per-(key, epoch) sequence with lead() intervals, on the
    generator changelog."""
    cl = changelog_df.select(
        "lsn", "op", "doc_id", F.col("source").alias("val")
    )
    scd2 = Scd2State(spark, str(tmp_path / "scd2"), payload_schema=PAYLOAD,
                     key="doc_id", n_buckets=4)
    p = MergePipeline(spark, str(tmp_path / "tbl"), key="doc_id", n_buckets=4,
                      payload_schema=PAYLOAD, scd2_state=scd2)
    lo, hi = cl.agg(F.min("lsn"), F.max("lsn")).first()
    step = max((hi - lo + 1) // 4 + 1, 1)
    for i in range(4):
        p.apply(cl.filter((F.col("lsn") >= lo + i * step)
                          & (F.col("lsn") < lo + (i + 1) * step)), batch_id=i)

    from pyspark.sql import Window as W

    epoch = F.floor((F.col("lsn") - F.lit(lo)) / F.lit(step))
    win = (
        cl.withColumn("_e", epoch)
        .withColumn("rn", F.row_number().over(
            W.partitionBy("doc_id", "_e").orderBy(F.col("lsn").desc())))
        .filter("rn = 1")
    )
    expected = (
        win.withColumn("next_lsn", F.lead("lsn").over(
            W.partitionBy("doc_id").orderBy("lsn")))
        .filter(F.col("op") != "D")
        .select("doc_id", F.col("lsn").alias("valid_from_lsn"),
                F.col("next_lsn").alias("valid_to_lsn"),
                F.col("next_lsn").isNull().alias("is_current"), "val")
    )
    got = scd2.read_history().select(
        "doc_id", "valid_from_lsn", "valid_to_lsn", "is_current", "val")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_as_of_read_prunes_history_files(spark, tmp_path):
    """After a cluster_by(valid_from_lsn) compaction, an as-of probe at an
    early LSN skips the files holding only later versions."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.generator import (
        generate_changelog_pandas,
        spark_changelog_from_pandas,
    )
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
    from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
    from pyspark.sql import types as T

    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])
    scd2 = Scd2State(spark, str(tmp_path / "h"), payload_schema=payload,
                     n_buckets=2)
    pipe = MergePipeline(spark, str(tmp_path / "t"), n_buckets=2,
                         scd2_state=scd2)
    pdf = generate_changelog_pandas(n_events=2_000, seed=43)
    df = spark_changelog_from_pandas(spark, pdf)
    lo, hi = int(pdf["lsn"].min()), int(pdf["lsn"].max())
    step = (hi - lo) // 4 + 1
    for i in range(4):
        pipe.apply(
            df.filter((F.col("lsn") >= lo + i * step)
                      & (F.col("lsn") < lo + (i + 1) * step)),
            batch_id=i,
        )
    probe = lo + step // 2
    want = {tuple(r) for r in scd2.read_as_of(probe)
            .select("doc_id", "valid_from_lsn").collect()}

    # fan out 4 files per bucket so the intra-bucket range split has
    # something to split (fpb=1 would leave one wide file per bucket)
    scd2.history.compact_files(max_files_per_bucket=4,
                               cluster_by="valid_from_lsn")
    m = scd2.history.manifest()
    entries = scd2.history._range_entries("valid_from_lsn", None, probe, m)
    assert 0 < len(entries) < len(m["files"]), (
        f"as-of must skip files: {len(entries)}/{len(m['files'])}"
    )
    got = {tuple(r) for r in scd2.read_as_of(probe)
           .select("doc_id", "valid_from_lsn").collect()}
    assert got == want
