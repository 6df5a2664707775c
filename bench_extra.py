#!/usr/bin/env python
"""Round-7 auxiliary benchmark (bench.py is FROZEN for measurement; this
file exists for optimization evidence only — noop-sink per-query timing
for an arbitrary subset of the registry, same session, warmup and
methodology as bench.py's run_headline_queries).

Usage: python bench_extra.py [-n TRIALS] query [query ...]
Prints one JSON line: {"queries": {name: median_sec}, "trials": {...}}.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import SF_DIR, CPUS, _bench_tmpdir, _fresh_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--trials", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = _fresh_spark(CPUS)
    # bench.py-equivalent warmup
    for t in ("events", "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    spark.range(1000).groupBy("id").count().count()
    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    wroot = os.path.join(_bench_tmpdir(), "warm-tbl-extra")
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

    from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

    times, trials = {}, {}
    for name in args.names:
        fn, _ = QUERIES[name]
        ts = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        times[name] = round(statistics.median(ts), 3)
        trials[name] = ts
    spark.stop()
    print(json.dumps({"queries": times, "trials": trials}))


if __name__ == "__main__":
    main()
