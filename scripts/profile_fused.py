#!/usr/bin/env python
"""A/B the fused profile mode and files_per_bucket on the scaling workload.

Times two steady-state epochs (2M events each) per config at local[8] and
local[32], interleaved rounds, best-of — the same shape bench.py's scaling
section measures. Usage: python scripts/profile_fused.py [n_events]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_tmpdir, _fresh_spark, ensure_changelog  # noqa: E402

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

CONFIGS = {
    "pre_fpb1": dict(profile_mode="pre", files_per_bucket=1),
    "fused_fpb1": dict(profile_mode="fused", files_per_bucket=1),
    "fused_fpb4": dict(profile_mode="fused", files_per_bucket=4),
}


def run_epochs(threads: int, changelog_dir: str, cfg: dict) -> float:
    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    s = _fresh_spark(threads)
    changelog = s.read.parquet(changelog_dir)
    # warmup epoch on a fresh table (codegen + scan)
    w = tempfile.mkdtemp(prefix=f"fw-{threads}-", dir=_bench_tmpdir())
    MergePipeline(s, w + "/t", n_buckets=32, **cfg).apply(
        changelog.filter(F.col("lsn") <= N_EVENTS // 10), batch_id=0
    )
    shutil.rmtree(w, ignore_errors=True)

    root = tempfile.mkdtemp(prefix=f"ft-{threads}-", dir=_bench_tmpdir())
    pipe = MergePipeline(s, root + "/t", n_buckets=32, **cfg)
    step = N_EVENTS // 2 + 1
    t0 = time.time()
    for i in range(2):
        pipe.apply(
            changelog.filter(
                (F.col("lsn") > i * step) & (F.col("lsn") <= (i + 1) * step)
            ),
            batch_id=i,
        )
    elapsed = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    s.stop()
    return round(elapsed, 3)


def main() -> None:
    gen = os.path.join(_bench_tmpdir(), f"changelog_{N_EVENTS}")
    s = _fresh_spark(32)
    ensure_changelog(s, gen, N_EVENTS)
    s.stop()

    best: dict[str, float] = {}
    for rnd in range(2):
        for threads in (8, 32):
            for name, cfg in CONFIGS.items():
                k = f"t{threads}_{name}"
                e = run_epochs(threads, gen, cfg)
                best[k] = min(best.get(k, 1e18), e)
                print(f"round {rnd} {k}: {e}s", file=sys.stderr)

    out = {"n_events": N_EVENTS, "elapsed_best": best}
    out["throughput"] = {k: round(N_EVENTS / v, 0) for k, v in best.items()}
    out["efficiency_8_to_32"] = {
        name: round(best[f"t8_{name}"] / best[f"t32_{name}"] / 4.0, 3)
        for name in CONFIGS
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
