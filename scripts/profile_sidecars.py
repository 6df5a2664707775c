"""Measured per-epoch cost of the sidecar states attached to the COW
apply: plain vs +DLQ vs +index vs +SCD2 vs all three, interleaved
best-of-N on tmpfs (same protocol as the IVM trade in BENCH/BASELINE.md).

    python scripts/profile_sidecars.py [n_events] [n_epochs] [trials]

Prints one JSON line per configuration plus a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SCRATCH = (
    "/dev/shm/spark_graft_sidecars"
    if os.path.isdir("/dev/shm")
    else "/tmp/spark_graft_sidecars"
)


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.generator import generate_changelog_df
    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
    from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import (
        SecondaryIndexState,
    )
    from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
    from data_hub_ejp_xml_pipeline_spark.session import get_spark

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(
        app_name="profile-sidecars",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.local.dir": os.path.join(SCRATCH, "spark-local")},
    )
    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])

    changelog = generate_changelog_df(spark, N_EVENTS, seed=97).persist()
    changelog.count()
    lo, hi = changelog.agg(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo) // N_EPOCHS + 1
    epochs = []
    for i in range(N_EPOCHS):
        e = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        ).persist()
        e.count()
        epochs.append(e)

    def run(tag: str, trial: int, **states) -> float:
        root = os.path.join(SCRATCH, f"{tag}-{trial}")
        kwargs = {}
        if states.get("dlq"):
            kwargs["dlq_state"] = DlqState(
                spark, root + "/dlq", payload_schema=changelog.schema, n_buckets=16
            )
        if states.get("idx"):
            kwargs["index_state"] = SecondaryIndexState(
                spark, root + "/idx", index_col="source", n_buckets=16
            )
        if states.get("scd2"):
            kwargs["scd2_state"] = Scd2State(
                spark, root + "/scd2", payload_schema=payload, n_buckets=16
            )
        pipe = MergePipeline(spark, root + "/tbl", n_buckets=16, **kwargs)
        t0 = time.monotonic()
        for i, e in enumerate(epochs):
            pipe.apply(e, batch_id=i)
        sec = time.monotonic() - t0
        shutil.rmtree(root, ignore_errors=True)
        return sec

    configs = [
        ("plain", {}),
        ("dlq", {"dlq": True}),
        ("index", {"idx": True}),
        ("scd2", {"scd2": True}),
        ("all", {"dlq": True, "idx": True, "scd2": True}),
    ]
    results: dict[str, list[float]] = {tag: [] for tag, _ in configs}
    # interleaved so every config samples the same contention windows
    for t in range(TRIALS):
        for tag, states in configs:
            sec = run(tag, t, **states)
            results[tag].append(round(sec, 2))
            print(json.dumps({"config": tag, "trial": t, "sec": round(sec, 2)}),
                  flush=True)
    best = {tag: min(v) for tag, v in results.items()}
    summary = {
        "n_events": N_EVENTS,
        "n_epochs": N_EPOCHS,
        "cpus": CPUS,
        "trials": results,
        "best": best,
        "delta_per_epoch_vs_plain": {
            tag: round((best[tag] - best["plain"]) / N_EPOCHS, 2)
            for tag in best
            if tag != "plain"
        },
    }
    print(json.dumps(summary), flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
