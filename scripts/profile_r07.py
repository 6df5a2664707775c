#!/usr/bin/env python
"""Round-7 phase profiler: run one (or more) registry queries with the
bench's exact session/warmup, timing the engine's internal phases via
monkeypatched wrappers. Usage:

    python scripts/profile_r07.py cdc_scd2_history cdc_maintenance_loop ...

Prints per-query: total construction time (fixture pipeline), noop-sink
time (final frame execution), and a breakdown of driver-side actions
(collect/first/count/isEmpty/toPandas), parquet writes, batch profiles,
footer listing, manifest writes.
"""
from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

marks: dict[str, float] = defaultdict(float)
counts: dict[str, int] = defaultdict(int)


def timed(name, fn):
    def w(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            dt = time.time() - t0
            marks[name] += dt
            counts[name] += 1
    return w


def install():
    import pyspark.sql.classic.dataframe as cdf
    import pyspark.sql.readwriter as rw

    import data_hub_ejp_xml_pipeline_spark.table.snapshot_table as st

    st.SnapshotTable._batch_profile = timed(
        "batch_profile", st.SnapshotTable._batch_profile)
    st._list_bucket_files = timed("list_bucket_files", st._list_bucket_files)
    st.SnapshotTable._write_manifest = timed(
        "write_manifest", st.SnapshotTable._write_manifest)
    rw.DataFrameWriter.parquet = timed("writer.parquet", rw.DataFrameWriter.parquet)
    rw.DataFrameWriter.save = timed("writer.save", rw.DataFrameWriter.save)
    DF = cdf.DataFrame
    DF.collect = timed("df.collect", DF.collect)
    DF.count = timed("df.count", DF.count)
    DF.first = timed("df.first", DF.first)
    DF.isEmpty = timed("df.isEmpty", DF.isEmpty)


def main():
    names = sys.argv[1:] or ["cdc_engine_final_state"]
    from bench import _bench_tmpdir, _fresh_spark

    spark = _fresh_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # bench-equivalent warmup
    for t in ("events", "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    spark.range(1000).groupBy("id").count().count()
    import shutil

    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    wroot = os.path.join(_bench_tmpdir(), "warm-tbl-r07")
    shutil.rmtree(wroot, ignore_errors=True)
    wpipe = MergePipeline(spark, wroot + "/t", n_buckets=4)
    warm_batch = spark.range(0, 2000).select(
        F.col("id").alias("lsn"), F.lit("U").alias("op"),
        F.col("id").cast("string").alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"), F.lit(1).alias("n_tok"),
        F.lit("w").alias("source"),
    )
    wpipe.apply(warm_batch, batch_id=0)
    shutil.rmtree(wroot, ignore_errors=True)

    install()
    from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

    for name in names:
        fn, _ = QUERIES[name]
        marks.clear(); counts.clear()
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        # exclude the final noop from the phase marks: separate dict
        build_marks = dict(marks); build_counts = dict(counts)
        marks.clear(); counts.clear()
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.time() - t1
        print(f"\n=== {name}: total={t_build + t_noop:.3f}s "
              f"(build={t_build:.3f}s noop={t_noop:.3f}s)")
        for k in sorted(build_marks, key=build_marks.get, reverse=True):
            print(f"  build  {k:>20}: {build_marks[k]:7.3f}s x{build_counts[k]}")
    spark.stop()


if __name__ == "__main__":
    main()
