#!/usr/bin/env python
"""Per-phase scaling profile of the apply epoch at local[8] vs local[32].

Breaks the per-epoch cost into (a) the grouping-sets profile job, (b) the
LWW reduce, (c) the full merge apply, plus the pure-CPU calibration, so the
8->32 efficiency loss can be attributed to a phase instead of guessed.
Interleaved rounds, best-of, tmpfs — same hygiene as bench.py.

Usage: python scripts/profile_scaling.py [n_events]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_tmpdir, _fresh_spark, ensure_changelog, cdc_apply  # noqa: E402

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000


def phase_times(threads: int, changelog_dir: str, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    s = _fresh_spark(threads)
    out: dict[str, float] = {}
    batch = s.read.parquet(changelog_dir).filter(F.col("lsn") <= N_EVENTS // 2)

    # warm: pay codegen/scan once
    batch.limit(1000).groupBy("doc_id").count().count()

    # (a) profile job exactly as _batch_profile runs it
    root = tempfile.mkdtemp(prefix=f"prof-{threads}-", dir=_bench_tmpdir())
    pipe = MergePipeline(s, root + "/tbl", n_buckets=n_buckets)
    tbl: SnapshotTable = pipe.table
    src = batch.withColumn("_bucket", tbl._bucket_expr("doc_id"))
    for name, fn in {
        "profile_job": lambda: tbl._batch_profile(src, "doc_id"),
        "reduce_noop": lambda: reduce_latest(batch)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "scan_count": lambda: batch.count(),
    }.items():
        best = 1e18
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)

    # (c) full apply epoch (reduce + merge write + commit), fresh table each
    best = 1e18
    for i in range(2):
        r2 = tempfile.mkdtemp(prefix=f"prof2-{threads}-", dir=_bench_tmpdir())
        p2 = MergePipeline(s, r2 + "/tbl", n_buckets=n_buckets)
        t0 = time.time()
        p2.apply(batch, batch_id=0)
        best = min(best, time.time() - t0)
        shutil.rmtree(r2, ignore_errors=True)
    out["apply_epoch"] = round(best, 3)

    # second epoch onto an existing table (the steady state: target nonempty)
    r3 = tempfile.mkdtemp(prefix=f"prof3-{threads}-", dir=_bench_tmpdir())
    p3 = MergePipeline(s, r3 + "/tbl", n_buckets=n_buckets)
    from pyspark.sql import functions as F2

    p3.apply(batch, batch_id=0)
    batch2 = s.read.parquet(changelog_dir).filter(F2.col("lsn") > N_EVENTS // 2)
    t0 = time.time()
    p3.apply(batch2, batch_id=1)
    out["apply_epoch2"] = round(time.time() - t0, 3)
    shutil.rmtree(r3, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    s.stop()
    return out


def main() -> None:
    gen = os.path.join(_bench_tmpdir(), f"changelog_{N_EVENTS}")
    s = _fresh_spark(32)
    ensure_changelog(s, gen, N_EVENTS)
    s.stop()

    results: dict[str, dict] = {}
    for rnd in range(2):
        for threads in (8, 32):
            for nb in (32, 128):
                k = f"t{threads}_b{nb}"
                r = phase_times(threads, gen, nb)
                if k in results:
                    results[k] = {
                        m: min(results[k][m], v) for m, v in r.items()
                    }
                else:
                    results[k] = r
                print(f"round {rnd} {k}: {r}", file=sys.stderr)

    ratios = {
        m: {
            f"b{nb}": round(
                results[f"t8_b{nb}"][m] / max(results[f"t32_b{nb}"][m], 1e-9), 2
            )
            for nb in (32, 128)
        }
        for m in results["t8_b32"]
    }
    print(json.dumps({"n_events": N_EVENTS, "times": results, "speedup_8_to_32": ratios}))


if __name__ == "__main__":
    main()
