"""Point-lookup serve path: ``SnapshotTable.lookup`` semantics equal
``read().filter(key IN ...)`` while the plan reads only bucket- and
range-pruned manifest entries; parquet bloom filters ride on the key
column of every written file (row-group skip inside surviving files).

Reference scope note: the reference pipeline has no point-lookup or table
format at all (it re-reads whole BigQuery tables); this is part of the
engine's 100 TB serve-path surface, same family as the bucket-pruned IVF
reads in plans/ann_index.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable
from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import _with_key_bloom

PAYLOAD_SCHEMA = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])


@pytest.fixture(scope="module")
def lookup_table(spark, tmp_path_factory, changelog_df):
    root = str(tmp_path_factory.mktemp("lookup") / "tbl")
    table = SnapshotTable.create(
        spark, root, PAYLOAD_SCHEMA, key="doc_id", n_buckets=8
    )
    lo, hi = changelog_df.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    table.merge(reduce_latest(changelog_df.filter(F.col("lsn") <= mid)), batch_id=0)
    table.merge(reduce_latest(changelog_df.filter(F.col("lsn") > mid)), batch_id=1)
    return table


def _some_keys(table, n=12):
    rows = (
        table.read()
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    return [r[0] for r in rows]


def test_lookup_matches_read_filter(spark, lookup_table):
    keys = _some_keys(lookup_table) + ["doc-absent-1", "doc-absent-2"]
    got = {
        tuple(r)
        for r in lookup_table.lookup(keys)
        .select("doc_id", "n_tok", "source", "_lsn")
        .collect()
    }
    want = {
        tuple(r)
        for r in lookup_table.read()
        .filter(F.col("doc_id").isin(keys))
        .select("doc_id", "n_tok", "source", "_lsn")
        .collect()
    }
    assert got == want and len(want) == 12


def test_lookup_prunes_buckets_and_ranges(spark, lookup_table):
    keys = _some_keys(lookup_table, n=3)
    m = lookup_table.manifest()
    entries = lookup_table._lookup_entries(keys, m)
    # independent bucket computation with the same recorded hash
    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id: string")
    fn = m.get("bucket_hash", "xxhash64")
    hashed = F.hash("doc_id") if fn == "murmur3" else F.xxhash64("doc_id")
    probed = {
        r[0]
        for r in kdf.select(
            F.pmod(hashed, F.lit(m["n_buckets"])).cast("int")
        ).collect()
    }
    assert {f["bucket"] for f in entries} <= probed
    assert 0 < len(entries) < len(m["files"])
    # every file a probed key actually lives in must survive the pruning
    # (completeness of the prune, not just soundness)
    got = {r[0] for r in lookup_table.lookup(keys).select("doc_id").collect()}
    assert got == set(keys)


def test_lookup_time_travel(spark, lookup_table, changelog_df):
    keys = _some_keys(lookup_table, n=5)
    v_now = lookup_table.current_version()
    old = lookup_table.lookup(keys, version=v_now)
    # a later merge moving these keys must not change the pinned-version view
    bump = (
        lookup_table.lookup(keys)
        .select(
            "doc_id",
            "tokens",
            (F.col("n_tok") + 1).alias("n_tok"),
            "source",
            (F.col("_lsn") + 10_000_000).alias("lsn"),
        )
        .withColumn("op", F.lit("U"))
    )
    lookup_table.merge(reduce_latest(bump), batch_id=2)
    pinned = {
        tuple(r)
        for r in lookup_table.lookup(keys, version=v_now)
        .select("doc_id", "n_tok")
        .collect()
    }
    assert pinned == {tuple(r) for r in old.select("doc_id", "n_tok").collect()}
    now = {
        tuple(r)
        for r in lookup_table.lookup(keys).select("doc_id", "n_tok").collect()
    }
    assert now == {(d, n + 1) for d, n in pinned}


def test_lookup_tombstones(spark, tmp_path, changelog_df):
    table = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), PAYLOAD_SCHEMA, key="doc_id", n_buckets=4
    )
    table.merge(reduce_latest(changelog_df), batch_id=0)
    key = table.read().select("doc_id").orderBy("doc_id").first()[0]
    delete = spark.createDataFrame(
        [(key, None, None, None, 99_000_000, "D")],
        "doc_id: string, tokens: array<int>, n_tok: int, source: string, "
        "lsn: long, op: string",
    )
    table.merge(reduce_latest(delete), batch_id=1)
    assert table.lookup([key]).count() == 0
    graves = table.lookup([key], include_tombstones=True)
    assert [r[0] for r in graves.select("_deleted").collect()] == [True]


def test_lookup_empty_and_cap(spark, lookup_table):
    empty = lookup_table.lookup([])
    assert empty.count() == 0
    assert empty.columns == lookup_table.read().columns
    with pytest.raises(ValueError, match="join the key set"):
        lookup_table.lookup(
            [f"k{i}" for i in range(SnapshotTable.LOOKUP_MAX_KEYS + 1)]
        )
    with pytest.raises(ValueError, match="must not contain None"):
        lookup_table.lookup(["doc-00000001", None])


def test_mor_lookup_matches_view(spark, tmp_path, changelog_df):
    """MOR point lookup == final_state().filter(isin) across keys living
    in the compacted base, the staged deltas, and both (delta must
    outrank base), plus a deleted and an absent key."""
    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    pipe = MorPipeline(
        spark, str(tmp_path / "mor"), n_buckets=4, k_compact=2
    )
    lo, hi = changelog_df.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // 3 + 1
    for i in range(3):  # 2 epochs compact into base, 1 stays staged
        batch = changelog_df.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    view = pipe.final_state()
    keys = [r[0] for r in view.select("doc_id").orderBy("doc_id").limit(15).collect()]
    deleted = (
        changelog_df.filter(F.col("op") == "D")
        .join(view, "doc_id", "left_anti")
        .select("doc_id")
        .first()
    )
    if deleted:
        keys.append(deleted[0])
    keys.append("doc-absent")
    got = {
        tuple(r)
        for r in pipe.lookup(keys).select("doc_id", "n_tok", "_lsn").collect()
    }
    want = {
        tuple(r)
        for r in view.filter(F.col("doc_id").isin(keys))
        .select("doc_id", "n_tok", "_lsn")
        .collect()
    }
    assert got == want and len(want) == 15


def test_key_bloom_filter_is_written(spark, tmp_path):
    df = spark.range(5000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.col("id").alias("v"),
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.mode("overwrite").parquet(plain)
    _with_key_bloom(df.write.mode("overwrite"), "doc_id", 5000).parquet(bloomed)

    def sz(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # same data, same layout — the only delta is the serialized bloom
    assert sz(bloomed) > sz(plain)
