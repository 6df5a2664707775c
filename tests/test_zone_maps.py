"""Payload-column zone maps: per-file min/max recorded at commit time
(off the parquet footers the commit already reads) and used by
``read_range`` for file skipping — the Iceberg column-stats analog for
predicates the key-based pruning can't serve."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _changelog(spark, n=2_000, lsn0=1):
    # n_tok correlates with the key order, so a range-partitioned rewrite
    # produces TIGHT n_tok zones per file — the case zone maps exist for
    return spark.range(n).select(
        (F.col("id") + lsn0).alias("lsn"),
        F.lit("U").alias("op"),
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        F.col("id").cast("int").alias("n_tok"),
        F.concat(F.lit("src-"), (F.col("id") % 7).cast("string")).alias("source"),
    )


def _make_table(spark, root, n=2_000, files_per_bucket=4):
    t = SnapshotTable.create(
        spark, root, PAYLOAD, key="doc_id", n_buckets=4,
        files_per_bucket=files_per_bucket, stats_cols=["n_tok", "_lsn"],
    )
    t.merge(_changelog(spark, n), batch_id=0)
    return t


def test_read_range_equals_filtered_read(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    for lo, hi in [(100, 400), (None, 50), (1900, None), (None, None)]:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("n_tok") >= lo)
        if hi is not None:
            pred = pred & (F.col("n_tok") <= hi)
        want = {r[0] for r in t.read().filter(pred).select("doc_id").collect()}
        got = {
            r[0]
            for r in t.read_range("n_tok", lo, hi).select("doc_id").collect()
        }
        assert got == want and (lo, hi) == (None, None) or got == want


def test_zone_maps_skip_files_after_compaction(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    # epoch files span wide ranges; the range-partitioned rewrite
    # tightens the zones
    t.compact_files(max_files_per_bucket=1)
    # re-merge a small epoch to multiply files, then compact to tight zones
    t.merge(_changelog(spark, 500, lsn0=10_001), batch_id=1)
    t.compact_files()
    m = t.manifest()
    assert all("col_stats" in f and "n_tok" in f["col_stats"] for f in m["files"])
    entries = t._range_entries("n_tok", 0, 100, m)
    assert 0 < len(entries) < len(m["files"]), (
        f"zone maps must skip files: read {len(entries)}/{len(m['files'])}"
    )
    # and the pruned scan is still exactly the filtered read
    want = t.read().filter(F.col("n_tok") <= 100).count()
    assert t.read_range("n_tok", None, 100).count() == want


def test_lsn_zone_maps_prune_append_history(spark, tmp_path):
    """Append-only tables get per-epoch-tight ``_lsn`` zones for free —
    a time-range read skips entire old epochs."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=2,
        stats_cols=["_lsn"],
    )
    for e in range(4):
        batch = _changelog(spark, 300, lsn0=e * 1_000 + 1).withColumn(
            "doc_id", F.concat(F.col("doc_id"), F.lit(f"-e{e}"))
        )
        # append derives _lsn from the batch's "lsn" column
        t.append(batch.select("doc_id", "n_tok", "source", "lsn"), batch_id=e)
    m = t.manifest()
    entries = t._range_entries("_lsn", 3_001, None, m)
    assert 0 < len(entries) < len(m["files"])
    assert t.read_range("_lsn", 3_001, None).count() == 300


def test_tables_without_stats_cols_unpruned_but_correct(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=2
    )
    t.merge(_changelog(spark, 400), batch_id=0)
    m = t.manifest()
    assert m.get("stats_cols", []) == []
    assert all("col_stats" not in f for f in m["files"])
    # every file read (no stats), result still exact
    assert len(t._range_entries("n_tok", 0, 10, m)) == len(m["files"])
    assert t.read_range("n_tok", 0, 10).count() == 11


def test_read_range_respects_tombstones(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"), n=500)
    deletes = _changelog(spark, 100, lsn0=10_001).withColumn("op", F.lit("D"))
    t.merge(deletes, batch_id=1)
    assert t.read_range("n_tok", 0, 99).count() == 0
    assert t.read_range("n_tok", 0, 99, include_tombstones=True).count() == 100


def test_cluster_by_compaction_tightens_uncorrelated_zones(spark, tmp_path):
    """Data whose sort column does NOT correlate with the key produces
    useless zones under key-ordered rewrite; cluster_by fixes that, at
    the documented cost of looser key ranges."""
    from pyspark.sql import functions as F

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), PAYLOAD, key="doc_id", n_buckets=4,
        files_per_bucket=4, stats_cols=["n_tok"],
    )
    # n_tok deliberately DEcorrelated from doc_id order (hash-scrambled)
    n = 2_000
    batch = spark.range(n).select(
        (F.col("id") + 1).alias("lsn"),
        F.lit("U").alias("op"),
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(n)).cast("int").alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.merge(batch, batch_id=0)
    t.compact_files(max_files_per_bucket=1)  # key-ordered: zones loose
    m = t.manifest()
    pre_frac = len(t._range_entries("n_tok", 0, 100, m)) / len(m["files"])

    t.compact_files(cluster_by="n_tok")
    m2 = t.manifest()
    pruned = t._range_entries("n_tok", 0, 100, m2)
    post_frac = len(pruned) / len(m2["files"])
    # the clustered zones prune a strictly larger fraction of the files
    assert 0 < len(pruned) and post_frac < pre_frac
    # and tightly: a ~5% range reads at most ~1 file per bucket
    assert len(pruned) <= 4 + 1
    # content preserved, range read exact
    want = t.read().filter(F.col("n_tok").between(0, 100)).count()
    assert t.read_range("n_tok", 0, 100).count() == want > 0
    assert t.read().count() == n
    # point lookups still work through the loosened key ranges
    assert t.lookup(["doc-00000042"]).count() == 1
