"""Broadcast-merge vs sort-merge full-outer: identical final state."""

from __future__ import annotations

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.oracle import (
    assert_final_state_equal,
    expected_final_state_pandas,
)
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import PAYLOAD_SCHEMA
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable


def _apply_all(spark, tmp_path, changelog_pdf, name, broadcast_max):
    table = SnapshotTable.create(spark, str(tmp_path / name), PAYLOAD_SCHEMA, n_buckets=8)
    table.broadcast_merge_max_rows = broadcast_max
    n = len(changelog_pdf)
    edges = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        batch = spark_changelog_from_pandas(
            spark, changelog_pdf.iloc[edges[i] : edges[i + 1]]
        )
        table.merge(reduce_latest(batch), batch_id=i, stats_df=batch)
    return table


def _hash(table):
    return (
        table.read()
        .selectExpr("sum(pmod(xxhash64(doc_id, _lsn, n_tok, source), 1000000007)) h")
        .first()
        .h
    )


def test_broadcast_and_smj_merge_agree(spark, tmp_path, changelog_pdf):
    bcast = _apply_all(spark, tmp_path, changelog_pdf, "bcast", broadcast_max=10**9)
    smj = _apply_all(spark, tmp_path, changelog_pdf, "smj", broadcast_max=0)
    expected = expected_final_state_pandas(changelog_pdf)
    for table in (bcast, smj):
        actual = (
            table.read()
            .selectExpr("doc_id", "tokens", "n_tok", "source", "_lsn")
            .toPandas()
        )
        assert_final_state_equal(actual, expected)
    assert _hash(bcast) == _hash(smj)


def test_broadcast_plan_has_no_smj(spark, tmp_path, changelog_pdf):
    """The broadcast path must not shuffle-sort the target side."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import _merge_rows

    table = _apply_all(spark, tmp_path, changelog_pdf, "t", broadcast_max=10**9)
    target = table.read(include_tombstones=True).withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
    )
    batch = spark_changelog_from_pandas(spark, changelog_pdf.iloc[:500])
    src = reduce_latest(batch).select(
        "doc_id", "tokens", "n_tok", "source",
        F.col("lsn").alias("_lsn"), F.col("op").alias("_op"),
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("_bucket"),
    )
    payload = T.StructType([f for f in PAYLOAD_SCHEMA.fields])
    plan = (
        _merge_rows(target, src, "doc_id", payload, broadcast_batch=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan[:1200]
    assert plan.count("BroadcastHashJoin") >= 2  # left-outer + anti


def test_bucket_local_and_smj_merge_agree(spark, tmp_path, changelog_pdf):
    """The zero-target-shuffle kernel must produce byte-identical state."""
    def apply_all(name, strategy):
        table = SnapshotTable.create(
            spark, str(tmp_path / name), PAYLOAD_SCHEMA, n_buckets=8
        )
        table.merge_strategy = strategy
        n = len(changelog_pdf)
        edges = [0, n // 3, 2 * n // 3, n]
        for i in range(3):
            batch = spark_changelog_from_pandas(
                spark, changelog_pdf.iloc[edges[i] : edges[i + 1]]
            )
            table.merge(reduce_latest(batch), batch_id=i, stats_df=batch)
        return table

    bl = apply_all("bl", "bucket_local")
    smj = apply_all("smj2", "smj")
    expected = expected_final_state_pandas(changelog_pdf)
    for table in (bl, smj):
        actual = (
            table.read()
            .selectExpr("doc_id", "tokens", "n_tok", "source", "_lsn")
            .toPandas()
        )
        assert_final_state_equal(actual, expected)
    assert _hash(bl) == _hash(smj)
    # tombstones agree too (deletes must not resurrect under either path)
    tomb_bl = sorted(r.doc_id for r in bl.read(include_tombstones=True).filter("_deleted").collect())
    tomb_smj = sorted(r.doc_id for r in smj.read(include_tombstones=True).filter("_deleted").collect())
    assert tomb_bl == tomb_smj


def test_bucket_local_plan_never_scans_target_in_spark(spark, tmp_path, changelog_pdf):
    """The bucket_local merge's Spark plan contains NO parquet scan of the
    table and only the one batch-side exchange."""
    table = SnapshotTable.create(
        spark, str(tmp_path / "plan_bl"), PAYLOAD_SCHEMA, n_buckets=8
    )
    table.merge_strategy = "bucket_local"
    table.merge(
        reduce_latest(spark_changelog_from_pandas(spark, changelog_pdf.iloc[:1000])),
        batch_id=0,
    )
    src = reduce_latest(spark_changelog_from_pandas(spark, changelog_pdf.iloc[1000:1500]))
    from pyspark.sql import functions as F
    src_full = src.select(
        "doc_id", "tokens", "n_tok", "source",
        F.col("lsn").alias("_lsn"), F.col("op").alias("_op"),
        F.pmod(F.hash("doc_id"), F.lit(8)).cast("int").alias("_bucket"),
    )
    result = table._merge_rows_bucket_local(
        src_full, "doc_id", PAYLOAD_SCHEMA,
        table.manifest()["files"], 8,
    )
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan[:1500]
    assert "MapInPandas" in plan


def test_legacy_xxhash_table_still_merges(spark, tmp_path, changelog_pdf):
    """A table whose manifest predates the bucket_hash field (round-1
    format, xxhash64 buckets) must keep merging correctly — the hash
    function is part of the on-disk format and is read from the manifest."""
    import json
    import os

    table = SnapshotTable.create(
        spark, str(tmp_path / "legacy"), PAYLOAD_SCHEMA, n_buckets=8
    )
    v0 = os.path.join(table.root, "meta", "v00000000.json")
    with open(v0) as fh:
        m = json.load(fh)
    del m["bucket_hash"]  # simulate the old manifest format
    with open(v0, "w") as fh:
        json.dump(m, fh)

    n = len(changelog_pdf)
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        batch = spark_changelog_from_pandas(spark, changelog_pdf.iloc[lo:hi])
        table.merge(reduce_latest(batch), batch_id=i)
    assert table.manifest()["bucket_hash"] == "xxhash64"  # carried forward
    actual = (
        table.read().selectExpr("doc_id", "tokens", "n_tok", "source", "_lsn").toPandas()
    )
    assert_final_state_equal(actual, expected_final_state_pandas(changelog_pdf))
    # no duplicate keys (the failure mode of a silent hash change)
    assert table.read().count() == table.read().select("doc_id").distinct().count()


def test_bucket_local_preserves_lsns_above_2_53(spark, tmp_path):
    """The pandas kernel must not round-trip LSNs through float64: the
    engine's mtime-major LSNs (~7.5e18) exceed 2^53 and would be corrupted
    by up to the float ulp (~1024)."""
    from pyspark.sql import types as T

    payload = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("v", T.StringType())]
    )
    table = SnapshotTable.create(spark, str(tmp_path / "big"), payload, n_buckets=2)
    table.merge_strategy = "bucket_local"
    base = 7_500_000_000_000_000_001  # > 2^53, odd (not float-representable)
    b1 = spark.createDataFrame(
        [(base, "U", "k1", "old"), (base + 1, "U", "k2", "x")],
        "lsn long, op string, doc_id string, v string",
    )
    table.merge(b1, batch_id=0)
    # update k1 with lsn base+2; a float64 path could see base == base+2
    b2 = spark.createDataFrame(
        [(base + 2, "U", "k1", "new")], "lsn long, op string, doc_id string, v string"
    )
    table.merge(b2, batch_id=1)
    rows = {r.doc_id: r for r in table.read().collect()}
    assert rows["k1"].v == "new"
    assert rows["k1"]._lsn == base + 2  # exact, not rounded
    assert rows["k2"]._lsn == base + 1
    # and a REPLAY with the stored lsn must be a no-op, not a flip-flop
    table.merge(b2, batch_id=2)
    assert {r.doc_id: r._lsn for r in table.read().collect()} == {
        "k1": base + 2, "k2": base + 1
    }
