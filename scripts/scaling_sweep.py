#!/usr/bin/env python
"""Epoch-size x bucket-count scaling sweep at one N->4N thread pair.

Hunts the raw >=0.8 efficiency crossing the north rule asks for (or pins
the ceiling argument if the crossing does not exist on this VM). The
measurement lesson from the r4->r5 A/B adjudication: this VM drifts up
to 2.8x BETWEEN minutes, so a ceiling measured in a different minute
than the apply is meaningless. Here every (round, thread-count) session
runs the shuffle-calibration kernel AND the apply back-to-back, so the
raw efficiency and the ceiling efficiency are computed from trials that
sampled the same contention windows.

Usage: python scripts/scaling_sweep.py [--lo 4] [--hi 16]
           [--events 8000000,16000000] [--buckets 16] [--rounds 3]
Prints one SWEEPRESULT JSON line per config and a final SWEEPSUMMARY.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _calibration_trial(spark, changelog_dir: str, out: str) -> float:
    """One timed run of the apply-shaped speed-of-light kernel: scan the
    changelog parquet, hash-shuffle on the key with a map-side-combining
    agg carrying the token payload, write parquet (bench.shuffle_calibration
    kernel, but a single trial inside the CALLER'S session so it shares
    the apply's VM window)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(changelog_dir)
    expr = [F.max("lsn").alias("lsn"), F.max_by("tokens", "lsn").alias("tokens")]
    df.limit(1000).groupBy("doc_id").agg(*expr).count()  # warm codegen
    t0 = time.time()
    df.groupBy("doc_id").agg(*expr).write.mode("overwrite").parquet(out)
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--events", default="8000000,16000000")
    ap.add_argument("--buckets", default="16")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    events_list = [int(x) for x in args.events.split(",")]
    buckets_list = [int(x) for x in args.buckets.split(",")]
    pair = (args.lo, args.hi)

    results = []
    calib_out = os.path.join(bench._bench_tmpdir(), "sweepcal-out")
    for n_events in events_list:
        s = bench._fresh_spark(8)
        changelog = bench.ensure_changelog(
            s, os.path.join(bench._bench_tmpdir(), f"sweep_{n_events}"), n_events
        )
        s.stop()
        for n_buckets in buckets_list:
            apply_t: dict[int, list[float]] = {k: [] for k in pair}
            calib_t: dict[int, list[float]] = {k: [] for k in pair}
            for rnd in range(args.rounds):
                for threads in pair:  # interleave inside each round
                    sp = bench._fresh_spark(threads)
                    calib_t[threads].append(
                        round(_calibration_trial(sp, changelog, calib_out), 3)
                    )
                    r = bench.cdc_apply(
                        sp, changelog, n_events, n_batches=2,
                        n_buckets=n_buckets, warmup=(rnd == 0),
                    )
                    sp.stop()
                    apply_t[threads].append(r["elapsed_sec"])
            best_a = {k: min(v) for k, v in apply_t.items()}
            best_c = {k: min(v) for k, v in calib_t.items()}
            ratio = pair[1] / pair[0]
            eff = round(best_a[pair[0]] / best_a[pair[1]] / ratio, 3)
            ceiling = round(best_c[pair[0]] / best_c[pair[1]] / ratio, 3)
            row = {
                "events": n_events,
                "n_buckets": n_buckets,
                "pair": f"{pair[0]}->{pair[1]}",
                "apply_trials_sec": apply_t,
                "calib_trials_sec": calib_t,
                "eps_hi": round(n_events / best_a[pair[1]], 1),
                "raw_eff": eff,
                "shuffle_ceiling_eff": ceiling,
                "apply_over_ceiling": round(eff / ceiling, 3) if ceiling else None,
            }
            results.append(row)
            print("SWEEPRESULT " + json.dumps(row), flush=True)
    shutil.rmtree(calib_out, ignore_errors=True)
    summary = {
        "pair": f"{pair[0]}->{pair[1]}",
        "best_raw_eff": max(r["raw_eff"] for r in results),
        "best_config": max(results, key=lambda r: r["raw_eff"]),
        "crossed_0_8": any(r["raw_eff"] >= 0.8 for r in results),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print("SWEEPSUMMARY " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
